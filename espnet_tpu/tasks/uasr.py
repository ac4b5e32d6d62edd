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
from espnet_tpu.tasks.abs_task import AbsTask
from espnet_tpu.train.checkpoint import save_checkpoint
from espnet_tpu.train.gan_trainer import make_gan_train_step
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.reporter import Reporter
from espnet_tpu.utils.config import dump_yaml, resolve_config

logger = logging.getLogger(__name__)


class UASRTask(AbsTask):
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
            "use_preprocessor": False,
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
    def main(cls, cfg: Optional[Dict[str, Any]] = None, argv=None):
        from espnet_tpu.tasks.asr import read_token_list
        from espnet_tpu.text.tokenizer import TokenIDConverter
        cfg = resolve_config(cls.default_config(), overrides=cfg, argv=argv)
        logging.basicConfig(level=logging.INFO)
        out = Path(cfg["output_dir"])
        out.mkdir(parents=True, exist_ok=True)
        dump_yaml(cfg, out / "config.yaml")
        model = cls.build_model(cfg)
        phones = read_token_list(cfg["token_list"])
        conv = TokenIDConverter(phones)
        n_ph = len(phones)
        # unpaired phone text -> id sequences
        lines = Path(cfg["text_file"]).read_text(
            encoding="utf-8").splitlines()
        texts = [conv.tokens2ids(ln.split()[1:] if " " in ln
                                 else list(ln)) for ln in lines if ln]
        ds = cls.build_dataset(cfg, train=True)
        keys = ds.keys()
        F, Tf, Tp = cfg["feat_dim"], cfg["segment_frames"], \
            cfg["phone_frames"]
        rng = np.random.RandomState(cfg["seed"])
        params = model.init(jax.random.PRNGKey(cfg["seed"]),
                            jnp.zeros((1, Tf, F), jnp.float32),
                            jax.nn.one_hot(jnp.zeros((1, Tp), jnp.int32),
                                           n_ph))
        tx_g = build_optimizer(cfg["optim"], grad_clip=cfg["grad_clip"],
                               **cfg["optim_conf"])
        tx_d = build_optimizer(cfg["optim2"], grad_clip=cfg["grad_clip"],
                               **cfg["optim2_conf"])
        opt_g = tx_g.init(params["generator"])
        opt_d = tx_d.init(params["discriminator"])
        step_fn = jax.jit(make_gan_train_step(model.apply, tx_g, tx_d))
        reporter = Reporter()
        B = cfg["batch_size"]

        def crop(arr, n):
            if len(arr) < n:
                arr = np.concatenate(
                    [arr, np.zeros((n - len(arr),) + arr.shape[1:],
                                   arr.dtype)])
            s = rng.randint(0, len(arr) - n + 1)
            return arr[s:s + n]

        for epoch in range(1, cfg["max_epoch"] + 1):
            reporter.set_epoch(epoch)
            sub = reporter.start_epoch("train", epoch)
            order = rng.permutation(len(keys))
            for i in range(0, len(order) - B + 1, B):
                feats = np.stack([
                    crop(np.asarray(ds[keys[j]][1]["feats"], np.float32),
                         Tf) for j in order[i:i + B]])
                ph = np.stack([
                    crop(np.asarray(texts[rng.randint(len(texts))],
                                    np.int64), Tp)
                    for _ in range(B)])
                real = jax.nn.one_hot(jnp.asarray(ph), n_ph)
                params, opt_g, opt_d, stats, weight = step_fn(
                    params, opt_g, opt_d,
                    {"feats": jnp.asarray(feats), "real_phones": real},
                    jax.random.PRNGKey(epoch * 1000 + i),
                    jnp.asarray(False))
                sub.register({k: float(v) for k, v in stats.items()},
                             float(weight))
            reporter.finish_epoch(sub)
            logger.info(sub.log_message())
            save_checkpoint(out / "checkpoint", params,
                            meta={"epoch": epoch,
                                  "reporter": reporter.state_dict()})
        save_checkpoint(out / "final", params)
        return cfg, params
