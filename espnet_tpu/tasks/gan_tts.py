"""GAN vocoder task: two-optimizer training through the full Trainer
(espnet2/tasks/gan_tts.py num_optimizers=2 + gan_trainer contract),
specialized to HiFiGAN-family mel->wav vocoder training.

Data: speech (wav). Random fixed-size segments are cropped per access
in the preprocess fn (the reference crops in the model/collate for
vocoder efficiency); mel targets are computed ON DEVICE inside the GAN
step (one fused program — host stays light on the 1-core machine).
Fixed segment size means every batch has the same shape, so the K-step
dispatch-amortized scan applies cleanly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.gan_vocoder import HiFiGANVocoderGAN
from espnet_tpu.tasks.abs_task import AbsGANTask


class GANVocoderTask(AbsGANTask):
    name = "gan_vocoder"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "fs": 22050, "n_fft": 1024, "hop_length": 256, "n_mels": 80,
            "generator": "hifigan",
            "generator_conf": {},
            "discriminator_conf": {},
            "segment_size": 8192,
            "batch_type": "unsorted",
            "use_preprocessor": True,
        }

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)

    @classmethod
    def build_model(cls, cfg, stats_dir=None) -> HiFiGANVocoderGAN:
        return HiFiGANVocoderGAN(
            fs=cfg["fs"], n_fft=cfg["n_fft"], hop_length=cfg["hop_length"],
            n_mels=cfg["n_mels"],
            generator=cfg.get("generator", "hifigan"),
            generator_conf=dict(cfg.get("generator_conf") or {}),
            discriminator_conf=dict(cfg.get("discriminator_conf") or {}))

    @classmethod
    def build_preprocess_fn(cls, cfg, train: bool):
        seg = int(cfg["segment_size"])
        crop_rng = np.random.RandomState(cfg.get("seed", 0) + (0 if train
                                                               else 1))

        def fn(uid, data):
            w = np.asarray(data["speech"], np.float32)
            if len(w) < seg:
                w = np.pad(w, (0, seg - len(w)))
            if train:
                s = crop_rng.randint(0, len(w) - seg + 1)
            else:
                s = (len(w) - seg) // 2  # deterministic valid crop
            return {"speech": w[s:s + seg]}

        return fn

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {"speech": np.zeros((1, int(cfg["segment_size"])),
                                   np.float32)}
