"""LM task (espnet2/tasks/lm.py contract: token_list -> vocab, lm type
choices transformer/seq_rnn, text-only data)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.data.preprocessor import CommonPreprocessor
from espnet_tpu.models.lm import LanguageModel
from espnet_tpu.tasks.abs_task import AbsTask
from espnet_tpu.tasks.asr import read_token_list


class LMTask(AbsTask):
    name = "lm"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,
            "token_type": "char",
            "bpemodel": None,
            "lm": "transformer",
            "lm_conf": {},
        }

    @classmethod
    def build_model(cls, cfg: Dict[str, Any],
                    stats_dir: Optional[str] = None) -> LanguageModel:
        token_list = read_token_list(cfg["token_list"])
        return LanguageModel(vocab_size=len(token_list),
                             lm_type=cfg.get("lm", "transformer"),
                             lm_conf=dict(cfg.get("lm_conf") or {}))

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
        return {"text": np.ones((1, 8), np.int32),
                "text_lengths": np.asarray([8], np.int32)}

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)
