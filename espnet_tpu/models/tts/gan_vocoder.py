"""GAN vocoder training model (mel->wav), generator registry.

Behavioral contract: the GAN-TTS training path
(espnet2/gan_tts/espnet_model.py routing `forward_generator`;
generator losses = adversarial + feature-match + 45*mel L1 — or
multi-resolution STFT loss for ParallelWaveGAN — discriminator
least-squares loss; espnet2/gan_tts/{hifigan,melgan,style_melgan,
parallel_wavegan}/ + tasks/gan_tts.py num_optimizers=2).

Plain class (not a flax module): holds two flax modules and routes the
two-optimizer GAN step; params = {"generator": ..., "discriminator": ...}.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.hifigan import (HiFiGANGenerator,
                                           HiFiGANMultiDiscriminator,
                                           discriminator_adv_loss,
                                           feature_match_loss,
                                           generator_adv_loss,
                                           mel_spectrogram_loss)
from espnet_tpu.models.tts.vocoders import (MelGANGenerator,
                                            ParallelWaveGANGenerator,
                                            StyleMelGANGenerator,
                                            multi_resolution_stft_loss)

GENERATOR_CHOICES = {
    "hifigan": HiFiGANGenerator,
    "melgan": MelGANGenerator,
    "style_melgan": StyleMelGANGenerator,
    "parallel_wavegan": ParallelWaveGANGenerator,
}


@dataclasses.dataclass
class HiFiGANVocoderGAN:
    fs: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    generator: str = "hifigan"   # hifigan|melgan|style_melgan|parallel_wavegan
    generator_conf: Optional[dict] = None
    discriminator_conf: Optional[dict] = None
    lambda_adv: float = 1.0
    lambda_feat_match: float = 2.0
    lambda_mel: float = 45.0
    lambda_stft: float = 1.0     # PWG aux multi-resolution STFT loss

    def __post_init__(self):
        gc = dict(self.generator_conf or {})
        gc.setdefault("in_channels", self.n_mels)
        # upsample product must equal hop_length
        self.generator_name = self.generator
        gen_cls = GENERATOR_CHOICES[self.generator]
        self.generator = gen_cls(**gc)
        self.discriminator = HiFiGANMultiDiscriminator(
            **dict(self.discriminator_conf or {}))

    def featurize(self, wav):
        """wav (B, S) -> log-mel (B, S//hop, n_mels), on device."""
        from espnet_tpu.ops.mel import log_mel
        from espnet_tpu.ops.stft import stft_power
        p, _ = stft_power(wav, None, n_fft=self.n_fft,
                          hop_length=self.hop_length)
        mel = log_mel(p, fs=self.fs, n_fft=self.n_fft, n_mels=self.n_mels)
        return mel[:, :wav.shape[1] // self.hop_length]

    def init(self, rng, mel=None, wav=None, speech=None, feats=None):
        if speech is not None:
            wav = speech
        if feats is not None:
            mel = feats
        if mel is None:
            mel = self.featurize(wav)
        r1, r2 = jax.random.split(rng)
        gp = self.generator.init(r1, mel)
        wav_hat = self.generator.apply(gp, mel)
        dp = self.discriminator.init(r2, wav_hat)
        return {"generator": gp, "discriminator": dp}

    def apply(self, params, batch, rngs, forward_generator: bool):
        """batch: {"speech": (B, S), optional "feats": (B, T, n_mels)} —
        mel targets are computed on device when absent (fused into the
        GAN step; keeps the 1-core host out of the hot path)."""
        wav = batch["speech"]
        mel = batch.get("feats")
        if mel is None:
            mel = self.featurize(wav)
        wav_hat = self.generator.apply(params["generator"], mel)
        S = min(wav.shape[1], wav_hat.shape[1])
        wav, wav_hat = wav[:, :S], wav_hat[:, :S]
        if forward_generator:
            fake_outs = self.discriminator.apply(
                jax.lax.stop_gradient(params["discriminator"]), wav_hat)
            real_outs = self.discriminator.apply(
                jax.lax.stop_gradient(params["discriminator"]), wav)
            adv = generator_adv_loss(fake_outs)
            fm = feature_match_loss(real_outs, fake_outs)
            if self.generator_name == "parallel_wavegan":
                # PWG trains with multi-resolution STFT aux loss
                aux = multi_resolution_stft_loss(wav_hat, wav)
                loss = (self.lambda_adv * adv
                        + self.lambda_feat_match * fm
                        + self.lambda_stft * aux)
                stats = {"generator_loss": loss,
                         "generator_adv_loss": adv,
                         "generator_feat_match_loss": fm,
                         "generator_stft_loss": aux}
            else:
                mel_l = mel_spectrogram_loss(wav_hat, wav, fs=self.fs,
                                             n_fft=self.n_fft,
                                             hop_length=self.hop_length,
                                             n_mels=self.n_mels)
                loss = (self.lambda_adv * adv
                        + self.lambda_feat_match * fm
                        + self.lambda_mel * mel_l)
                stats = {"generator_loss": loss,
                         "generator_adv_loss": adv,
                         "generator_feat_match_loss": fm,
                         "generator_mel_loss": mel_l}
        else:
            wav_hat = jax.lax.stop_gradient(wav_hat)
            real_outs = self.discriminator.apply(params["discriminator"], wav)
            fake_outs = self.discriminator.apply(params["discriminator"],
                                                 wav_hat)
            loss = discriminator_adv_loss(real_outs, fake_outs)
            stats = {"discriminator_loss": loss}
        return loss, stats, jnp.asarray(mel.shape[0], jnp.float32)

    def decode(self, params, mel):
        """mel (B, T, n_mels) -> wav (B, T*hop)."""
        return self.generator.apply(params["generator"], mel)
