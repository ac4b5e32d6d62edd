"""Transducer ASR task (espnet2/tasks/asr_transducer.py contract)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.data.preprocessor import CommonPreprocessor
from espnet_tpu.models.transducer import TransducerModel
from espnet_tpu.tasks.abs_task import AbsTask
from espnet_tpu.tasks.asr import read_token_list


class ASRTransducerTask(AbsTask):
    name = "asr_transducer"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,
            "token_type": "char",
            "bpemodel": None,
            "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 80},
            "specaug": None,
            "specaug_conf": {},
            "normalize": "utterance_mvn",
            "encoder": "conformer",
            "encoder_conf": {},
            "decoder": "rnn",
            "decoder_conf": {},
            "joint_conf": {},
            "model_conf": {"aux_ctc_weight": 0.0},
        }

    @classmethod
    def build_model(cls, cfg: Dict[str, Any],
                    stats_dir: Optional[str] = None) -> TransducerModel:
        token_list = read_token_list(cfg["token_list"])
        mc = dict(cfg.get("model_conf") or {})
        normalize = cfg.get("normalize")
        stats = None
        if normalize == "global_mvn":
            from espnet_tpu.frontends.default import GlobalMVN
            stats_file = cfg.get("stats_file") or (
                cfg.get("normalize_conf") or {}).get("stats_file")
            if stats_file:
                stats = GlobalMVN.from_file(stats_file)
            else:
                normalize = "utterance_mvn"  # graceful fallback
        return TransducerModel(
            vocab_size=len(token_list),
            token_list=tuple(token_list),
            frontend_conf=dict(cfg["frontend_conf"] or {})
            if cfg.get("frontend", "default") != "none" else None,
            specaug_conf=(dict(cfg["specaug_conf"] or {})
                          if cfg.get("specaug") == "specaug" else None),
            normalize=normalize,
            normalize_stats=stats,
            encoder=cfg.get("encoder", "conformer"),
            encoder_conf=dict(cfg.get("encoder_conf") or {}),
            decoder=cfg.get("decoder", "rnn"),
            decoder_conf=dict(cfg.get("decoder_conf") or {}),
            joint_conf=dict(cfg.get("joint_conf") or {}),
            aux_ctc_weight=mc.get("aux_ctc_weight", 0.0),
        )

    @classmethod
    def build_preprocess_fn(cls, cfg: Dict[str, Any], train: bool):
        if cfg.get("token_list") is None:
            return None
        return CommonPreprocessor(
            train=train, token_type=cfg.get("token_type", "char"),
            token_list=read_token_list(cfg["token_list"]),
            bpemodel=cfg.get("bpemodel"))

    @classmethod
    def example_batch(cls, cfg: Dict[str, Any]) -> Dict[str, np.ndarray]:
        return {
            "speech": np.zeros((1, 2048), np.float32),
            "speech_lengths": np.asarray([2048], np.int32),
            "text": np.ones((1, 6), np.int32),
            "text_lengths": np.asarray([6], np.int32),
        }
