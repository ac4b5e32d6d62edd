"""UASR task: wav2vec-U style unsupervised ASR GAN training.

Behavioral contract: espnet2/tasks/uasr.py + espnet2/uasr/espnet_model.py
— a generator maps speech features to phone distributions, a CNN
discriminator tells generated phone sequences from REAL (unpaired) phone
text; two-optimizer alternation (the same gan_trainer contract as
GAN-TTS). Data: feats per utterance (npy scp, e.g. SSL features or
fbank) and an UNPAIRED phone-text corpus sampled independently.

TPU-first: G and D updates are two branches of one jitted step
(train/gan_trainer.py); batches are fixed-size crops so the whole run is
a single XLA program per branch.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.uasr import UASRModel
from espnet_tpu.tasks.abs_task import AbsGANTask

logger = logging.getLogger(__name__)


class UASRTask(AbsGANTask):
    name = "uasr"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,          # phone inventory
            "feat_dim": 80,
            "segment_frames": 128,       # feature crop per step
            "phone_frames": 64,          # real phone crop per step
            "generator_conf": {},
            "discriminator_conf": {},
            "model_conf": {"smoothness_weight": 0.5,
                           "entropy_weight": 0.0},
            "optim": "adam", "optim_conf": {"lr": 5e-5},
            "optim2": "adam", "optim2_conf": {"lr": 3e-4},
            "text_file": None,           # unpaired phone text
            "use_preprocessor": True,
            "batch_type": "unsorted",
        }

    @classmethod
    def build_model(cls, cfg) -> UASRModel:
        from espnet_tpu.tasks.asr import read_token_list
        phones = read_token_list(cfg["token_list"])
        mc = dict(cfg.get("model_conf") or {})
        return UASRModel(
            n_phones=len(phones),
            generator_conf=dict(cfg.get("generator_conf") or {}),
            discriminator_conf=dict(cfg.get("discriminator_conf") or {}),
            smoothness_weight=mc.get("smoothness_weight", 0.5),
            entropy_weight=mc.get("entropy_weight", 0.0))

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)

    @classmethod
    def build_preprocess_fn(cls, cfg, train: bool):
        """Per-access: crop feats to segment_frames and pair them with a
        crop of a RANDOM unpaired phone sentence (the wav2vec-U data
        contract — text and audio are never aligned)."""
        from espnet_tpu.tasks.asr import read_token_list
        from espnet_tpu.text.tokenizer import TokenIDConverter
        conv = TokenIDConverter(read_token_list(cfg["token_list"]))
        lines = Path(cfg["text_file"]).read_text(
            encoding="utf-8").splitlines()
        texts = [np.asarray(conv.tokens2ids(
            ln.split()[1:] if " " in ln else list(ln)), np.int32)
            for ln in lines if ln]
        Tf, Tp = cfg["segment_frames"], cfg["phone_frames"]
        rng = np.random.RandomState(cfg.get("seed", 0) + (0 if train
                                                          else 1))

        def crop(arr, n):
            if len(arr) < n:
                arr = np.concatenate(
                    [arr, np.zeros((n - len(arr),) + arr.shape[1:],
                                   arr.dtype)])
            s = rng.randint(0, len(arr) - n + 1) if train else 0
            return arr[s:s + n]

        def fn(uid, data):
            feats = crop(np.asarray(data["feats"], np.float32), Tf)
            ph = crop(texts[rng.randint(len(texts))] if train
                      else texts[hash(uid) % len(texts)], Tp)
            return {"feats": feats, "real_phones": ph}

        return fn

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {"feats": np.zeros((1, cfg["segment_frames"],
                                   cfg["feat_dim"]), np.float32),
                "real_phones": np.zeros((1, cfg["phone_frames"]),
                                        np.int32)}
