"""HiFi-GAN vocoder: generator + multi-period/multi-scale discriminators
+ GAN losses.

Behavioral contract: espnet2/gan_tts/hifigan/hifigan.py
(HiFiGANGenerator: conv-in -> [upsample ConvTranspose + MRF residual
blocks] -> conv-out tanh; HiFiGANMultiPeriodDiscriminator,
HiFiGANMultiScaleDiscriminator) and losses in
espnet2/gan_tts/hifigan/loss.py (GeneratorAdversarialLoss least-squares,
DiscriminatorAdversarialLoss, FeatureMatchLoss, MelSpectrogramLoss).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.ops.mel import log_mel
from espnet_tpu.ops.stft import stft_power


class ResBlock(nn.Module):
    """MRF residual block: dilated conv pairs (hifigan.py ResidualBlock)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME",
                        name=f"conv1_{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        name=f"conv2_{i}")(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3

    @nn.compact
    def __call__(self, mel):
        """mel: (B, T, in_ch) -> wav (B, T * prod(scales))."""
        h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    name="conv_pre")(mel)
        ch = self.channels
        for i, (s, k) in enumerate(zip(self.upsample_scales,
                                       self.upsample_kernel_sizes)):
            ch = ch // 2
            h = nn.leaky_relu(h, 0.1)
            h = nn.ConvTranspose(ch, (k,), strides=(s,), padding="SAME",
                                 name=f"upsample{i}")(h)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilations)):
                r = ResBlock(ch, rk, rd, name=f"resblock{i}_{j}")(h)
                acc = r if acc is None else acc + r
            h = acc / len(self.resblock_kernel_sizes)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                    name="conv_post")(h)
        return jnp.tanh(h)[..., 0]


class PeriodDiscriminator(nn.Module):
    period: int
    channels: Sequence[int] = (32, 128, 512, 1024)
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        """x: (B, S) -> (score, feature list). Reshape to (B, S/p, p)."""
        B, S = x.shape
        pad = (-S) % self.period
        x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect" if S > 1 else
                    "constant")
        feats = []
        h = x.reshape(B, -1, self.period, 1)  # (B, S/p, p, 1) NHWC
        for i, c in enumerate(self.channels):
            h = nn.Conv(c, (self.kernel_size, 1), strides=(self.stride, 1),
                        name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = nn.Conv(1, (3, 1), name="conv_post")(h)
        feats.append(h)
        return h.reshape(B, -1), feats


class ScaleDiscriminator(nn.Module):
    channels: Sequence[int] = (64, 128, 256, 512, 1024)
    kernel_sizes: Sequence[int] = (15, 41, 41, 41, 5)
    strides: Sequence[int] = (1, 4, 4, 4, 1)
    groups: Sequence[int] = (1, 4, 16, 16, 1)

    @nn.compact
    def __call__(self, x):
        B, S = x.shape
        h = x[:, :, None]
        feats = []
        for i, (c, k, s, g) in enumerate(zip(self.channels, self.kernel_sizes,
                                             self.strides, self.groups)):
            g_eff = g if (h.shape[-1] % g == 0 and c % g == 0) else 1
            h = nn.Conv(c, (k,), strides=(s,), feature_group_count=g_eff,
                        padding="SAME", name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = nn.Conv(1, (3,), padding="SAME", name="conv_post")(h)
        feats.append(h)
        return h.reshape(B, -1), feats


class HiFiGANMultiDiscriminator(nn.Module):
    """MPD (periods 2,3,5,7,11) + MSD (3 scales w/ avg-pool downsample)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    scales: int = 3

    @nn.compact
    def __call__(self, x):
        """x: (B, S) -> list of (score, feats)."""
        outs = []
        for p in self.periods:
            outs.append(PeriodDiscriminator(p, name=f"mpd{p}")(x))
        h = x
        for i in range(self.scales):
            outs.append(ScaleDiscriminator(name=f"msd{i}")(h))
            # avg-pool downsample x2
            S = h.shape[1] - h.shape[1] % 2
            h = h[:, :S].reshape(h.shape[0], -1, 2).mean(axis=-1)
        return outs


# ---- losses (hifigan/loss.py behavior, least-squares GAN) -----------

def generator_adv_loss(disc_outs):
    losses = [jnp.mean((score - 1.0) ** 2) for score, _ in disc_outs]
    return sum(losses) / len(losses)


def discriminator_adv_loss(real_outs, fake_outs):
    real = sum(jnp.mean((s - 1.0) ** 2) for s, _ in real_outs)
    fake = sum(jnp.mean(s ** 2) for s, _ in fake_outs)
    return (real + fake) / len(real_outs)


def feature_match_loss(real_outs, fake_outs):
    total, n = 0.0, 0
    for (_, rf), (_, ff) in zip(real_outs, fake_outs):
        for r, f in zip(rf[:-1], ff[:-1]):
            total = total + jnp.mean(jnp.abs(r - f))
            n += 1
    return total / max(n, 1)


def mel_spectrogram_loss(wav_fake, wav_real, *, fs=22050, n_fft=1024,
                         hop_length=256, n_mels=80, fmin=0.0, fmax=None):
    """L1 in log-mel domain (hifigan/loss.py MelSpectrogramLoss)."""
    def melspec(w):
        p, _ = stft_power(w, None, n_fft=n_fft, hop_length=hop_length)
        return log_mel(p, fs=fs, n_fft=n_fft, n_mels=n_mels, fmin=fmin,
                       fmax=fmax)

    return jnp.mean(jnp.abs(melspec(wav_fake) - melspec(wav_real)))
