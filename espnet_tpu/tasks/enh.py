"""Enhancement task (espnet2/tasks/enh.py contract)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.models.enh.model import EnhancementModel
from espnet_tpu.tasks.abs_task import AbsTask


class EnhancementTask(AbsTask):
    name = "enh"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "num_spk": 2,
            "encoder": "stft",
            "encoder_conf": {"n_fft": 512, "hop_length": 128},
            "separator": "rnn",
            "separator_conf": {},
            "loss_type": "si_snr",
            "use_preprocessor": False,
        }

    @classmethod
    def build_model(cls, cfg: Dict[str, Any],
                    stats_dir: Optional[str] = None) -> EnhancementModel:
        ec = dict(cfg.get("encoder_conf") or {})
        return EnhancementModel(
            num_spk=cfg.get("num_spk", 2),
            n_fft=ec.get("n_fft", 512),
            hop_length=ec.get("hop_length", 128),
            separator=cfg.get("separator", "rnn"),
            separator_conf=dict(cfg.get("separator_conf") or {}),
            loss_type=cfg.get("loss_type", "si_snr"))

    @classmethod
    def example_batch(cls, cfg: Dict[str, Any]) -> Dict[str, np.ndarray]:
        b = {
            "speech_mix": np.zeros((1, 2048), np.float32),
            "speech_mix_lengths": np.asarray([2048], np.int32),
            "speech_ref1": np.zeros((1, 2048), np.float32),
        }
        if cfg.get("num_spk", 2) >= 2:
            b["speech_ref2"] = np.zeros((1, 2048), np.float32)
        return b

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)
