"""JETS adversarial wrapper (two-optimizer container, same protocol as
vits_gan/gan_vocoder — espnet2/gan_tts/jets loss weights)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.hifigan import (HiFiGANMultiDiscriminator,
                                           discriminator_adv_loss,
                                           feature_match_loss,
                                           generator_adv_loss,
                                           mel_spectrogram_loss)
from espnet_tpu.models.tts.jets import JETSGenerator
from espnet_tpu.ops.mel import log_mel
from espnet_tpu.ops.stft import stft_power


@dataclasses.dataclass
class JETSGan:
    vocab_size: int
    fs: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    jets_conf: dict = None
    discriminator_conf: dict = None
    lambda_adv: float = 1.0
    lambda_mel: float = 45.0
    lambda_feat_match: float = 2.0
    lambda_dur: float = 1.0
    lambda_align: float = 2.0

    def __post_init__(self):
        jc = dict(self.jets_conf or {})
        jc.setdefault("n_mels", self.n_mels)
        jc.setdefault("hop_length", self.hop_length)
        self.generator = JETSGenerator(vocab_size=self.vocab_size, **jc)
        self.discriminator = HiFiGANMultiDiscriminator(
            **dict(self.discriminator_conf or {}))
        self.seg = self.generator.segment_frames * self.hop_length

    def featurize(self, wav):
        p, _ = stft_power(wav, None, n_fft=self.n_fft,
                          hop_length=self.hop_length)
        return log_mel(p, fs=self.fs, n_fft=self.n_fft, n_mels=self.n_mels)

    def init(self, rng, text, text_lengths, wav):
        mel = self.featurize(wav)
        r1, r2 = jax.random.split(rng)
        mel_lengths = jnp.full((text.shape[0],), mel.shape[1], jnp.int32)
        gp = self.generator.init({"params": r1}, text, text_lengths, mel,
                                 mel_lengths, wav, r1)
        out = self.generator.apply(gp, text, text_lengths, mel, mel_lengths,
                                   wav, r1)
        dp = self.discriminator.init(r2, out["wav_hat"])
        return {"generator": gp, "discriminator": dp}

    def apply(self, params, batch, rngs, forward_generator: bool):
        rng = rngs.get("dropout", jax.random.PRNGKey(0)) if rngs else \
            jax.random.PRNGKey(0)
        wav = batch["speech"]
        mel = self.featurize(wav)
        mel_lengths = (batch["speech_lengths"] // self.hop_length
                       ).astype(jnp.int32) + 1
        mel_lengths = jnp.minimum(mel_lengths, mel.shape[1])
        out = self.generator.apply(
            params["generator"], batch["text"], batch["text_lengths"], mel,
            mel_lengths, wav, rng, deterministic=rngs is None,
            rngs={"dropout": rng} if rngs else None)
        wav_hat = out["wav_hat"]
        wav_real = jax.vmap(lambda w, s: jax.lax.dynamic_slice_in_dim(
            w, s * self.hop_length, self.seg, axis=0))(wav, out["starts"])
        if forward_generator:
            d_stop = jax.lax.stop_gradient(params["discriminator"])
            fake_outs = self.discriminator.apply(d_stop, wav_hat)
            real_outs = self.discriminator.apply(d_stop, wav_real)
            adv = generator_adv_loss(fake_outs)
            fm = feature_match_loss(real_outs, fake_outs)
            mel_l = mel_spectrogram_loss(wav_hat, wav_real, fs=self.fs,
                                         n_fft=self.n_fft,
                                         hop_length=self.hop_length,
                                         n_mels=self.n_mels)
            loss = (self.lambda_adv * adv + self.lambda_feat_match * fm
                    + self.lambda_mel * mel_l
                    + self.lambda_dur * out["dur_loss"]
                    + self.lambda_align * out["align_loss"])
            stats = {"generator_loss": loss, "generator_adv_loss": adv,
                     "generator_mel_loss": mel_l,
                     "generator_dur_loss": out["dur_loss"],
                     "generator_align_loss": out["align_loss"]}
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
        return self.generator.apply(params["generator"], text, text_lengths,
                                    method=self.generator.inference, **kw)
