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
            encoder=cfg.get("encoder", "stft"),
            n_fft=ec.get("n_fft", 512),
            hop_length=ec.get("hop_length", 128),
            # reference ConvEncoder spells it 'channel' (singular,
            # enh/encoder/conv_encoder.py); accept both (ADVICE r3)
            conv_channels=ec.get("channels", ec.get("channel", 256)),
            conv_kernel=ec.get("kernel_size", 32),
            conv_stride=ec.get("stride", 16),
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


class EnhS2TTask(AbsTask):
    """Joint enhancement + ASR (espnet2/tasks/enh_s2t.py): enh_conf +
    asr_conf compose one differentiable model; data = mixture speech +
    transcript (+ optional clean reference for the enh branch)."""

    name = "enh_s2t"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,
            "token_type": "char",
            "bpemodel": None,
            "non_linguistic_symbols": [],
            "cleaner": None,
            "enh_conf": {"num_spk": 1, "separator": "rnn"},
            "asr_conf": {},
            "enh_weight": 0.2,
        }

    @classmethod
    def build_model(cls, cfg):
        from espnet_tpu.models.enh_s2t import EnhS2TModel
        from espnet_tpu.tasks.asr import read_token_list
        token_list = read_token_list(cfg["token_list"])
        return EnhS2TModel(
            vocab_size=len(token_list), token_list=tuple(token_list),
            enh_conf=dict(cfg.get("enh_conf") or {}),
            asr_conf=dict(cfg.get("asr_conf") or {}),
            enh_weight=cfg.get("enh_weight", 0.2))

    @classmethod
    def build_preprocess_fn(cls, cfg, train):
        from espnet_tpu.tasks.asr import ASRTask
        return ASRTask.build_preprocess_fn(cfg, train)

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {
            "speech_mix": np.zeros((1, 2048), np.float32),
            "speech_mix_lengths": np.asarray([2048], np.int32),
            "text": np.zeros((1, 8), np.int32),
            "text_lengths": np.asarray([8], np.int32),
        }


class EnhTSETask(AbsTask):
    """Target-speaker extraction task (espnet2/tasks/enh_tse.py): data =
    mixture + enrollment audio + target reference."""

    name = "enh_tse"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "tse_conf": {},
            "use_preprocessor": False,
        }

    @classmethod
    def build_model(cls, cfg):
        from espnet_tpu.models.enh.tse import TSEModel
        return TSEModel(**dict(cfg.get("tse_conf") or {}))

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {
            "speech_mix": np.zeros((1, 2048), np.float32),
            "speech_mix_lengths": np.asarray([2048], np.int32),
            "enroll_ref1": np.zeros((1, 1024), np.float32),
            "speech_ref1": np.zeros((1, 2048), np.float32),
        }
