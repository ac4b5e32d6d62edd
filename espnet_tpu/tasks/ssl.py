"""SSL (HuBERT) + codec tasks (espnet2/tasks/{hubert,ssl,gan_codec}.py
contracts)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from espnet_tpu.models.codec import CodecModel
from espnet_tpu.models.ssl import HubertModel, Wav2Vec2Model
from espnet_tpu.tasks.abs_task import AbsTask


class HubertTask(AbsTask):
    """SSL pretraining task (espnet2/tasks/{hubert,ssl}.py): model =
    hubert (masked pseudo-label prediction over k-means ids) or
    wav2vec2 (contrastive over gumbel-quantized latents, no labels)."""

    name = "hubert"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "model": "hubert",            # hubert | wav2vec2
            "num_classes": 100,
            "frontend_conf": {"n_fft": 512, "hop_length": 320, "n_mels": 80},
            "encoder": "transformer",
            "encoder_conf": {},
            "model_conf": {"mask_prob": 0.08, "mask_length": 10,
                           "masked_weight": 1.0, "unmasked_weight": 0.0},
            "use_preprocessor": False,
        }

    @classmethod
    def build_model(cls, cfg, stats_dir=None):
        mc = dict(cfg.get("model_conf") or {})
        if cfg.get("model", "hubert") == "wav2vec2":
            # wav2vec2's conv extractor consumes raw waveform; the
            # frontend_conf holds its conv layer spec, not STFT params
            fc = dict(cfg.get("frontend_conf") or {})
            fc.pop("n_fft", None); fc.pop("hop_length", None)
            fc.pop("n_mels", None)
            mc.pop("masked_weight", None); mc.pop("unmasked_weight", None)
            return Wav2Vec2Model(
                frontend_conf=fc,
                encoder=cfg.get("encoder", "transformer"),
                encoder_conf=dict(cfg.get("encoder_conf") or {}),
                quantizer_conf=dict(cfg.get("quantizer_conf") or {}),
                **mc)
        return HubertModel(
            num_classes=cfg.get("num_classes", 100),
            frontend_conf=dict(cfg.get("frontend_conf") or {}),
            encoder=cfg.get("encoder", "transformer"),
            encoder_conf=dict(cfg.get("encoder_conf") or {}),
            **mc)

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        b = {"speech": np.zeros((1, 4096), np.float32),
             "speech_lengths": np.asarray([4096], np.int32)}
        if cfg.get("model", "hubert") != "wav2vec2":
            b["text"] = np.zeros((1, 16), np.int32)
            b["text_lengths"] = np.asarray([12], np.int32)
        return b

    @classmethod
    def model_rng_names(cls):
        return ("dropout", "mask")


class CodecTask(AbsTask):
    name = "gan_codec"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "fs": 16000,
            "codec_conf": {},
            "use_preprocessor": False,
        }

    @classmethod
    def build_model(cls, cfg, stats_dir=None) -> CodecModel:
        return CodecModel(fs=cfg.get("fs", 16000),
                          **dict(cfg.get("codec_conf") or {}))

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {"speech": np.zeros((1, 2048), np.float32),
                "speech_lengths": np.asarray([2048], np.int32)}

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)


class BeatsTask(AbsTask):
    """BEATs pre-training (espnet2/tasks/beats.py contract): audio-only
    batches; the acoustic tokenizer lives inside the model."""

    name = "beats"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "frontend_conf": {"n_fft": 512, "hop_length": 160,
                              "n_mels": 80},
            "patch_t": 4, "patch_f": 16,
            "encoder_conf": {},
            "codebook_size": 256,
            "mask_ratio": 0.5,
            "use_preprocessor": False,
        }

    @classmethod
    def build_model(cls, cfg, stats_dir=None):
        from espnet_tpu.models.beats import BeatsModel
        return BeatsModel(
            frontend_conf=dict(cfg.get("frontend_conf") or {}),
            patch_t=cfg.get("patch_t", 4), patch_f=cfg.get("patch_f", 16),
            encoder_conf=dict(cfg.get("encoder_conf") or {}),
            codebook_size=cfg.get("codebook_size", 256),
            mask_ratio=cfg.get("mask_ratio", 0.5))

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {"speech": np.zeros((1, 4096), np.float32),
                "speech_lengths": np.asarray([4096], np.int32)}

    @classmethod
    def model_rng_names(cls):
        return ("dropout", "mask")
