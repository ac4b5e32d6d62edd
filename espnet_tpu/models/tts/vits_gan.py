"""VITS adversarial training wrapper (two-optimizer GAN container).

Behavioral contract: espnet2/gan_tts/vits/vits.py forward_generator /
forward_discriminator routing + loss weights (lambda_adv=1, mel=45,
feat_match=2, kl=1, dur=1 — vits.py defaults).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.hifigan import (HiFiGANMultiDiscriminator,
                                           discriminator_adv_loss,
                                           feature_match_loss,
                                           generator_adv_loss,
                                           mel_spectrogram_loss)
from espnet_tpu.models.tts.vits import VITS


@dataclasses.dataclass
class VITSGan:
    vocab_size: int
    fs: int = 8000
    n_fft: int = 128
    hop_length: int = 64
    n_mels: int = 20
    tts: str = "vits"        # vits | visinger | visinger2 (gan_svs)
    vits_conf: dict = None
    discriminator_conf: dict = None
    lambda_adv: float = 1.0
    lambda_mel: float = 45.0
    lambda_feat_match: float = 2.0
    lambda_kl: float = 1.0
    lambda_dur: float = 1.0

    def __post_init__(self):
        from espnet_tpu.models.tts.vits import VISinger, VISinger2
        vc = dict(self.vits_conf or {})
        vc.setdefault("hop_length", self.hop_length)
        vc.setdefault("spec_channels", self.n_fft // 2 + 1)
        cls = {"vits": VITS, "visinger": VISinger,
               "visinger2": VISinger2}[self.tts]
        if self.tts == "visinger2":
            vc.setdefault("fs", self.fs)
        self.generator = cls(vocab_size=self.vocab_size, **vc)
        self.discriminator = HiFiGANMultiDiscriminator(
            **dict(self.discriminator_conf or {}))
        self.seg = self.generator.segment_frames * self.hop_length

    def init(self, rng, text, text_lengths, spec, spec_lengths, wav,
             midi=None):
        r1, r2 = jax.random.split(rng)
        gp = self.generator.init({"params": r1}, text, text_lengths, spec,
                                 spec_lengths, r1, midi=midi)
        out = self.generator.apply(gp, text, text_lengths, spec,
                                   spec_lengths, r1, midi=midi)
        dp = self.discriminator.init(r2, out["wav_hat"])
        return {"generator": gp, "discriminator": dp}

    def _slice_real(self, wav, starts):
        return jax.vmap(lambda w, s: jax.lax.dynamic_slice_in_dim(
            w, s * self.hop_length, self.seg, axis=0))(wav, starts)

    def apply(self, params, batch, rngs, forward_generator: bool):
        rng = rngs.get("dropout", jax.random.PRNGKey(0)) if rngs else \
            jax.random.PRNGKey(0)
        midi = batch.get("midi")
        if midi is not None:
            midi = midi[:, :batch["text"].shape[1]].astype(jnp.int32)
        out = self.generator.apply(
            params["generator"], batch["text"], batch["text_lengths"],
            batch["spec"], batch["spec_lengths"], rng, midi=midi,
            deterministic=rngs is None,
            rngs={"dropout": rng} if rngs else None)
        wav_hat = out["wav_hat"]
        wav_real = self._slice_real(batch["speech"], out["starts"])
        if forward_generator:
            d_stop = jax.lax.stop_gradient(params["discriminator"])
            fake_outs = self.discriminator.apply(d_stop, wav_hat)
            real_outs = self.discriminator.apply(d_stop, wav_real)
            adv = generator_adv_loss(fake_outs)
            fm = feature_match_loss(real_outs, fake_outs)
            mel_l = mel_spectrogram_loss(
                wav_hat, wav_real, fs=self.fs, n_fft=self.n_fft,
                hop_length=self.hop_length, n_mels=self.n_mels)
            loss = (self.lambda_adv * adv + self.lambda_feat_match * fm
                    + self.lambda_mel * mel_l
                    + self.lambda_kl * out["kl_loss"]
                    + self.lambda_dur * out["dur_loss"])
            stats = {"generator_loss": loss, "generator_adv_loss": adv,
                     "generator_mel_loss": mel_l,
                     "generator_kl_loss": out["kl_loss"],
                     "generator_dur_loss": out["dur_loss"]}
        else:
            wav_hat = jax.lax.stop_gradient(wav_hat)
            real_outs = self.discriminator.apply(params["discriminator"],
                                                 wav_real)
            fake_outs = self.discriminator.apply(params["discriminator"],
                                                 wav_hat)
            loss = discriminator_adv_loss(real_outs, fake_outs)
            stats = {"discriminator_loss": loss}
        return loss, stats, jnp.asarray(batch["text"].shape[0], jnp.float32)

    def decode(self, params, text, text_lengths, **kw):
        wav, olens = self.generator.apply(params["generator"], text,
                                          text_lengths,
                                          method=self.generator.inference,
                                          **kw)
        return wav, olens
