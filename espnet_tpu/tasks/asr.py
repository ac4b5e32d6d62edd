"""ASR task.

Behavioral contract: espnet2/tasks/asr.py (ASRTask :218, build_model
:512) — token_list -> vocab; frontend/specaug/normalize/encoder/decoder
ClassChoices pairs; CommonPreprocessor for text tokenization.
Config keys mirror the reference YAML schema (Appendix B of SURVEY.md).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.data.preprocessor import CommonPreprocessor
from espnet_tpu.frontends.default import GlobalMVN
from espnet_tpu.models.asr import ASRModel
from espnet_tpu.tasks.abs_task import AbsTask


def read_token_list(token_list) -> list:
    if isinstance(token_list, (list, tuple)):
        return list(token_list)
    lines = Path(token_list).read_text(encoding="utf-8").splitlines()
    return [ln.rstrip("\n") for ln in lines if ln.strip()]


class ASRTask(AbsTask):
    name = "asr"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,
            "token_type": "char",
            "bpemodel": None,
            "non_linguistic_symbols": [],
            "cleaner": None,
            "frontend": "default",
            "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 80},
            "specaug": None,
            "specaug_conf": {},
            "normalize": "utterance_mvn",
            "normalize_conf": {},
            "stats_file": None,
            "encoder": "transformer",
            "encoder_conf": {},
            "decoder": "transformer",
            "decoder_conf": {},
            "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.0,
                           "interctc_weight": 0.0},
        }

    @classmethod
    def build_model(cls, cfg: Dict[str, Any],
                    stats_dir: Optional[str] = None) -> ASRModel:
        token_list = read_token_list(cfg["token_list"])
        vocab_size = len(token_list)
        normalize = cfg.get("normalize")
        stats = None
        if normalize == "global_mvn":
            stats_file = cfg.get("stats_file") or (
                cfg["normalize_conf"] or {}).get("stats_file")
            if stats_file:
                stats = GlobalMVN.from_file(stats_file)
            else:
                normalize = "utterance_mvn"  # graceful fallback
        specaug_conf = (dict(cfg["specaug_conf"] or {})
                        if cfg.get("specaug") == "specaug" else None)
        mc = dict(cfg.get("model_conf") or {})
        frontend_conf = (dict(cfg["frontend_conf"] or {})
                         if cfg.get("frontend", "default") != "none" else None)
        model_cls = ASRModel
        if cfg.get("model") == "maskctc":
            # espnet2/tasks/asr.py model_choices 'maskctc' entry
            from espnet_tpu.models.maskctc import MaskCTCModel
            model_cls = MaskCTCModel
        return model_cls(
            vocab_size=vocab_size,
            frontend=cfg.get("frontend", "default"),
            token_list=tuple(token_list),
            frontend_conf=frontend_conf,
            specaug_conf=specaug_conf,
            normalize=normalize,
            normalize_stats=stats,
            encoder=cfg.get("encoder", "transformer"),
            encoder_conf=dict(cfg.get("encoder_conf") or {}),
            preencoder=cfg.get("preencoder"),
            preencoder_conf=dict(cfg.get("preencoder_conf") or {}),
            postencoder=cfg.get("postencoder"),
            postencoder_conf=dict(cfg.get("postencoder_conf") or {}),
            decoder=cfg.get("decoder", "transformer"),
            decoder_conf=dict(cfg.get("decoder_conf") or {}),
            ctc_weight=mc.get("ctc_weight", 0.5),
            ctc_conf=dict(cfg.get("ctc_conf") or {}),
            interctc_weight=mc.get("interctc_weight", 0.0),
            lsm_weight=mc.get("lsm_weight", 0.0),
            length_normalized_loss=mc.get("length_normalized_loss", False),
        )

    @classmethod
    def build_preprocess_fn(cls, cfg: Dict[str, Any], train: bool):
        if cfg.get("token_list") is None:
            return None
        return CommonPreprocessor(
            train=train,
            token_type=cfg.get("token_type", "char"),
            token_list=read_token_list(cfg["token_list"]),
            bpemodel=cfg.get("bpemodel"),
            text_cleaner=cfg.get("cleaner"),
            non_linguistic_symbols=cfg.get("non_linguistic_symbols", ()),
        )

    @classmethod
    def example_batch(cls, cfg: Dict[str, Any]) -> Dict[str, np.ndarray]:
        if cfg.get("frontend", "default") != "none":
            speech = np.zeros((1, 2048), np.float32)
        else:
            n_mels = (cfg.get("frontend_conf") or {}).get("n_mels", 80)
            speech = np.zeros((1, 64, n_mels), np.float32)
        return {
            "speech": speech,
            "speech_lengths": np.asarray([speech.shape[1]], np.int32),
            "text": np.zeros((1, 8), np.int32),
            "text_lengths": np.asarray([8], np.int32),
        }
