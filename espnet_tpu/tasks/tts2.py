"""TTS2 task: discrete-unit TTS (espnet2/tasks/tts2.py contract).

Data: text (tokenized) + discrete_speech (unit ids, text_int loader) +
durations (text_int) — the same triple layout real tts2 recipes dump
after SSL k-means unit extraction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.data.preprocessor import CommonPreprocessor
from espnet_tpu.models.tts.tts2 import FastSpeech2Discrete
from espnet_tpu.tasks.abs_task import AbsTask
from espnet_tpu.tasks.asr import read_token_list


class TTS2Task(AbsTask):
    name = "tts2"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,
            "token_type": "char",
            "unit_vocab_size": 512,
            "tts": "fastspeech2_discrete",
            "tts_conf": {},
        }

    @classmethod
    def build_model(cls, cfg: Dict[str, Any],
                    stats_dir: Optional[str] = None):
        token_list = read_token_list(cfg["token_list"])
        return FastSpeech2Discrete(
            idim=len(token_list),
            odim=int(cfg.get("unit_vocab_size", 512)),
            **dict(cfg.get("tts_conf") or {}))

    @classmethod
    def build_preprocess_fn(cls, cfg: Dict[str, Any], train: bool):
        if cfg.get("token_list") is None:
            return None
        return CommonPreprocessor(
            train=train, token_type=cfg.get("token_type", "char"),
            token_list=read_token_list(cfg["token_list"]),
            bpemodel=cfg.get("bpemodel"),
            g2p_type=cfg.get("g2p"),
            text_cleaner=cfg.get("cleaner"))

    @classmethod
    def example_batch(cls, cfg: Dict[str, Any]) -> Dict[str, np.ndarray]:
        return {
            "text": np.ones((1, 6), np.int32),
            "text_lengths": np.asarray([6], np.int32),
            "discrete_speech": np.ones((1, 24), np.int32),
            "discrete_speech_lengths": np.asarray([24], np.int32),
            "durations": np.full((1, 6), 4, np.int32),
            "durations_lengths": np.asarray([6], np.int32),
        }
