"""GAN vocoder task: two-optimizer training loop (espnet2/tasks/
gan_tts.py num_optimizers=2 + gan_trainer contract), specialized to
HiFiGAN mel->wav vocoder training.

Data: speech (wav). Mel targets are computed on the fly; random fixed-
size segments are cropped per step (the reference crops in the model /
collate for vocoder efficiency).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.gan_vocoder import HiFiGANVocoderGAN
from espnet_tpu.ops.mel import log_mel
from espnet_tpu.ops.stft import stft_power
from espnet_tpu.tasks.abs_task import AbsTask, parse_triples
from espnet_tpu.train.gan_trainer import make_gan_train_step
from espnet_tpu.train.checkpoint import save_checkpoint
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.reporter import Reporter
from espnet_tpu.utils.config import dump_yaml, resolve_config

logger = logging.getLogger(__name__)


class GANVocoderTask(AbsTask):
    name = "gan_vocoder"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "fs": 22050, "n_fft": 1024, "hop_length": 256, "n_mels": 80,
            "generator": "hifigan",
            "generator_conf": {},
            "discriminator_conf": {},
            "segment_size": 8192,
            "optim": "adam", "optim_conf": {"lr": 2e-4},
            "optim2": "adam", "optim2_conf": {"lr": 2e-4},
            "generator_first": True,
        }

    @classmethod
    def build_gan_model(cls, cfg) -> HiFiGANVocoderGAN:
        return HiFiGANVocoderGAN(
            fs=cfg["fs"], n_fft=cfg["n_fft"], hop_length=cfg["hop_length"],
            n_mels=cfg["n_mels"],
            generator=cfg.get("generator", "hifigan"),
            generator_conf=dict(cfg.get("generator_conf") or {}),
            discriminator_conf=dict(cfg.get("discriminator_conf") or {}))

    @classmethod
    def main(cls, cfg: Optional[Dict[str, Any]] = None, argv=None):
        cfg = resolve_config(cls.default_config(), overrides=cfg, argv=argv)
        logging.basicConfig(level=logging.INFO)
        out = Path(cfg["output_dir"])
        out.mkdir(parents=True, exist_ok=True)
        dump_yaml(cfg, out / "config.yaml")
        model = cls.build_gan_model(cfg)
        hop, seg = cfg["hop_length"], cfg["segment_size"]
        seg_frames = seg // hop

        def featurize(wav_seg):
            p, _ = stft_power(wav_seg, None, n_fft=cfg["n_fft"],
                              hop_length=hop)
            return log_mel(p, fs=cfg["fs"], n_fft=cfg["n_fft"],
                           n_mels=cfg["n_mels"])

        ds = cls.build_dataset(cfg, train=True)
        keys = ds.keys()
        rng = np.random.RandomState(cfg["seed"])
        ex_wav = jnp.zeros((1, seg), jnp.float32)
        ex_mel = featurize(ex_wav)[:, :seg_frames]
        params = model.init(jax.random.PRNGKey(cfg["seed"]), ex_mel, ex_wav)
        tx_g = build_optimizer(cfg["optim"], grad_clip=cfg["grad_clip"],
                               **cfg["optim_conf"])
        tx_d = build_optimizer(cfg["optim2"], grad_clip=cfg["grad_clip"],
                               **cfg["optim2_conf"])
        opt_g, opt_d = tx_g.init(params["generator"]), tx_d.init(
            params["discriminator"])
        step_fn = jax.jit(make_gan_train_step(model.apply, tx_g, tx_d),
                          static_argnums=())
        reporter = Reporter()
        B = cfg["batch_size"]
        for epoch in range(1, cfg["max_epoch"] + 1):
            reporter.set_epoch(epoch)
            sub = reporter.start_epoch("train", epoch)
            order = rng.permutation(len(keys))
            for i in range(0, len(order) - B + 1, B):
                wavs = []
                for j in order[i:i + B]:
                    _, data = ds[keys[j]]
                    w = data["speech"]
                    if len(w) < seg:
                        w = np.pad(w, (0, seg - len(w)))
                    s = rng.randint(0, len(w) - seg + 1)
                    wavs.append(w[s:s + seg])
                wav = jnp.asarray(np.stack(wavs))
                mel = featurize(wav)[:, :seg_frames]
                params, opt_g, opt_d, stats, weight = step_fn(
                    params, opt_g, opt_d, {"feats": mel, "speech": wav},
                    jax.random.PRNGKey(epoch * 1000 + i),
                    jnp.asarray(False))
                sub.register({k: float(v) for k, v in stats.items()},
                             float(weight))
            reporter.finish_epoch(sub)
            save_checkpoint(out / "checkpoint", params,
                            meta={"epoch": epoch,
                                  "reporter": reporter.state_dict()})
        save_checkpoint(out / "final", params)
        return cfg, params
