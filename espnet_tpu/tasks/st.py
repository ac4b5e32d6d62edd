"""ST + MT tasks (espnet2/tasks/st.py, espnet2/tasks/mt.py contracts)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.data.preprocessor import CommonPreprocessor
from espnet_tpu.models.st import MTModel, STModel
from espnet_tpu.tasks.abs_task import AbsTask
from espnet_tpu.tasks.asr import read_token_list


class STTask(AbsTask):
    name = "st"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,          # target-language tokens
            "src_token_list": None,      # source transcript tokens
            "token_type": "char",
            "src_token_type": "char",
            "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 80},
            "specaug": None,
            "specaug_conf": {},
            "normalize": "utterance_mvn",
            "encoder": "conformer",
            "encoder_conf": {},
            "decoder": "transformer",
            "decoder_conf": {},
            "model_conf": {"asr_weight": 0.0, "lsm_weight": 0.1},
        }

    @classmethod
    def build_model(cls, cfg: Dict[str, Any],
                    stats_dir: Optional[str] = None) -> STModel:
        token_list = read_token_list(cfg["token_list"])
        src_tokens = (read_token_list(cfg["src_token_list"])
                      if cfg.get("src_token_list") else None)
        mc = dict(cfg.get("model_conf") or {})
        return STModel(
            vocab_size=len(token_list),
            token_list=tuple(token_list),
            src_vocab_size=len(src_tokens) if src_tokens else None,
            frontend_conf=dict(cfg["frontend_conf"] or {}),
            specaug_conf=(dict(cfg["specaug_conf"] or {})
                          if cfg.get("specaug") == "specaug" else None),
            normalize=cfg.get("normalize"),
            encoder=cfg.get("encoder", "conformer"),
            encoder_conf=dict(cfg.get("encoder_conf") or {}),
            decoder=cfg.get("decoder", "transformer"),
            decoder_conf=dict(cfg.get("decoder_conf") or {}),
            ctc_weight=0.0,
            lsm_weight=mc.get("lsm_weight", 0.1),
            asr_weight=mc.get("asr_weight", 0.0))

    @classmethod
    def build_preprocess_fn(cls, cfg: Dict[str, Any], train: bool):
        tgt = CommonPreprocessor(
            train=train, token_type=cfg.get("token_type", "char"),
            token_list=read_token_list(cfg["token_list"]),
            text_name="text")
        src = None
        if cfg.get("src_token_list"):
            src = CommonPreprocessor(
                train=train, token_type=cfg.get("src_token_type", "char"),
                token_list=read_token_list(cfg["src_token_list"]),
                text_name="src_text")

        def preprocess(uid, data):
            data = tgt(uid, data)
            if src is not None and "src_text" in data:
                data = src(uid, data)
            return data

        return preprocess

    @classmethod
    def example_batch(cls, cfg: Dict[str, Any]) -> Dict[str, np.ndarray]:
        b = {
            "speech": np.zeros((1, 2048), np.float32),
            "speech_lengths": np.asarray([2048], np.int32),
            "text": np.ones((1, 6), np.int32),
            "text_lengths": np.asarray([6], np.int32),
        }
        if cfg.get("src_token_list") and (cfg.get("model_conf") or {}).get(
                "asr_weight", 0) > 0:
            b["src_text"] = np.ones((1, 6), np.int32)
            b["src_text_lengths"] = np.asarray([6], np.int32)
        return b


class MTTask(AbsTask):
    name = "mt"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,
            "src_token_list": None,
            "token_type": "char",
            "src_token_type": "char",
            "encoder_conf": {},
            "decoder_conf": {},
            "model_conf": {"lsm_weight": 0.1},
        }

    @classmethod
    def build_model(cls, cfg: Dict[str, Any],
                    stats_dir: Optional[str] = None) -> MTModel:
        token_list = read_token_list(cfg["token_list"])
        # shared vocab when no separate source token list is given
        src_tokens = read_token_list(cfg.get("src_token_list")
                                     or cfg["token_list"])
        mc = dict(cfg.get("model_conf") or {})
        return MTModel(vocab_size=len(token_list),
                       token_list=tuple(token_list),
                       src_vocab_size=len(src_tokens),
                       encoder_conf=dict(cfg.get("encoder_conf") or {}),
                       decoder_conf=dict(cfg.get("decoder_conf") or {}),
                       lsm_weight=mc.get("lsm_weight", 0.1))

    @classmethod
    def build_preprocess_fn(cls, cfg, train: bool):
        tgt = CommonPreprocessor(
            train=train, token_type=cfg.get("token_type", "char"),
            token_list=read_token_list(cfg["token_list"]), text_name="text")
        src = CommonPreprocessor(
            train=train, token_type=cfg.get("src_token_type", "char"),
            token_list=read_token_list(cfg["src_token_list"]),
            text_name="src_text")

        def preprocess(uid, data):
            return src(uid, tgt(uid, data))

        return preprocess

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {
            "text": np.ones((1, 6), np.int32),
            "text_lengths": np.asarray([6], np.int32),
            "src_text": np.ones((1, 7), np.int32),
            "src_text_lengths": np.asarray([7], np.int32),
        }
