"""Vocoder generator zoo: MelGAN, StyleMelGAN, ParallelWaveGAN.

Behavioral contracts:
- MelGAN: espnet2/gan_tts/melgan/melgan.py (conv-in ->
  [leaky_relu + ConvTranspose upsample + dilated residual stacks] ->
  conv-out tanh; multi-scale discriminator).
- StyleMelGAN: espnet2/gan_tts/style_melgan/style_melgan.py (noise seed
  upsampled through TADE residual blocks, each adaptively modulated by
  the mel conditioning via TADE — Temporal Adaptive DE-normalization —
  with softmax-gated tanh outputs).
- ParallelWaveGAN: espnet2/gan_tts/parallel_wavegan/parallel_wavegan.py
  (WaveNet-style non-causal dilated conv stack transforming noise to
  waveform, conditioned on upsampled mel; trained with adversarial +
  multi-resolution STFT loss — espnet2/gan_tts/parallel_wavegan/ uses
  stft_loss.py).

All generators share the contract mel (B, T, M) -> wav (B, T * hop)
with hop = prod(upsample_scales); everything is channels-last 1-D conv,
which XLA maps onto the MXU as batched matmuls.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.ops.stft import stft_power


# ---------------------------------------------------------------- MelGAN

class MelGANResidualStack(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 9)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, 0.2)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME",
                        name=f"conv1_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            h = nn.Conv(self.channels, (1,), name=f"conv2_{i}")(h)
            x = x + h
        return x


class MelGANGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    stacks: int = 3
    stack_kernel_size: int = 3

    @nn.compact
    def __call__(self, mel):
        h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    name="conv_pre")(mel)
        ch = self.channels
        for i, s in enumerate(self.upsample_scales):
            ch = max(ch // 2, 32)
            h = nn.leaky_relu(h, 0.2)
            h = nn.ConvTranspose(ch, (s * 2,), strides=(s,),
                                 padding="SAME", name=f"up{i}")(h)
            for j in range(self.stacks):
                h = MelGANResidualStack(
                    ch, self.stack_kernel_size,
                    dilations=tuple(self.stack_kernel_size ** k
                                    for k in range(3)),
                    name=f"stack{i}_{j}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                    name="conv_post")(h)
        return jnp.tanh(h)[..., 0]


# ----------------------------------------------------------- StyleMelGAN

class TADELayer(nn.Module):
    """Temporal Adaptive DE-normalization: instance-norm x, then
    modulate with (gamma, beta) predicted from the conditioning."""

    channels: int
    cond_channels: int = 64

    @nn.compact
    def __call__(self, x, cond):
        # nearest-neighbor stretch cond to x's length
        T = x.shape[1]
        Tc = cond.shape[1]
        idx = jnp.minimum((jnp.arange(T) * Tc) // T, Tc - 1)
        c = cond[:, idx]
        c = nn.Conv(self.cond_channels, (3,), padding="SAME",
                    name="cond_conv")(c)
        c = nn.leaky_relu(c, 0.2)
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-6)
        gamma = nn.Conv(self.channels, (3,), padding="SAME",
                        name="gamma")(c)
        beta = nn.Conv(self.channels, (3,), padding="SAME", name="beta")(c)
        return gamma * xn + beta, c


class TADEResBlock(nn.Module):
    channels: int
    kernel_size: int = 9
    upsample: int = 1

    @nn.compact
    def __call__(self, x, cond):
        h, c = TADELayer(self.channels, name="tade1")(x, cond)
        a = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    name="conv_a1")(h)
        b = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    name="conv_b1")(h)
        h = jnp.tanh(a) * jax.nn.softmax(b, axis=-1) * self.channels ** 0.5
        if self.upsample > 1:
            # repeat upsample (style_melgan uses nearest upsampling)
            h = jnp.repeat(h, self.upsample, axis=1)
            x = jnp.repeat(x, self.upsample, axis=1)
        h2, _ = TADELayer(self.channels, name="tade2")(h, cond)
        a = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(2,), padding="SAME",
                    name="conv_a2")(h2)
        b = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(2,), padding="SAME",
                    name="conv_b2")(h2)
        h2 = jnp.tanh(a) * jax.nn.softmax(b, axis=-1) * self.channels ** 0.5
        return x + h2


class StyleMelGANGenerator(nn.Module):
    in_channels: int = 80      # mel conditioning
    out_channels: int = 1
    channels: int = 64
    noise_dim: int = 128
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    kernel_size: int = 9

    @nn.compact
    def __call__(self, mel, noise=None):
        """mel (B, T, M) -> wav (B, T * prod(scales)). noise: optional
        (B, T0, noise_dim) latent; zeros give deterministic output."""
        B, T, _ = mel.shape
        if noise is None:
            noise = jnp.zeros((B, max(T // 1, 1), self.noise_dim),
                              mel.dtype)
        h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    name="noise_conv")(noise)
        for i, s in enumerate(self.upsample_scales):
            h = TADEResBlock(self.channels, self.kernel_size, upsample=s,
                             name=f"block{i}")(h, mel)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                    name="conv_post")(h)
        return jnp.tanh(h)[..., 0]


# ------------------------------------------------------- ParallelWaveGAN

class PWGResidualBlock(nn.Module):
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, cond):
        h = nn.Conv(self.gate_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    name="conv")(x)
        c = nn.Conv(self.gate_channels, (1,), use_bias=False,
                    name="cond_conv")(cond)
        h = h + c
        a, b = jnp.split(h, 2, axis=-1)
        z = jnp.tanh(a) * jax.nn.sigmoid(b)
        res = nn.Conv(self.residual_channels, (1,), name="res_conv")(z)
        skip = nn.Conv(self.skip_channels, (1,), name="skip_conv")(z)
        return (x + res) * (0.5 ** 0.5), skip


class ParallelWaveGANGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3
    upsample_scales: Sequence[int] = (4, 4, 4, 4)

    @nn.compact
    def __call__(self, mel, noise=None):
        """mel (B, T, M) [+ noise (B, T*hop)] -> wav (B, T*hop)."""
        B, T, _ = mel.shape
        hop = 1
        for s in self.upsample_scales:
            hop *= s
        S = T * hop
        if noise is None:
            noise = jnp.zeros((B, S), mel.dtype)
        # upsample conditioning by nearest repeat + smoothing convs
        c = mel
        for i, s in enumerate(self.upsample_scales):
            c = jnp.repeat(c, s, axis=1)
            c = nn.Conv(self.in_channels, (s * 2 + 1,), padding="SAME",
                        feature_group_count=1, name=f"upconv{i}")(c)
        x = nn.Conv(self.residual_channels, (1,),
                    name="first_conv")(noise[..., None])
        skips = 0.0
        per_stack = self.layers // self.stacks
        for i in range(self.layers):
            d = 2 ** (i % per_stack)
            x, skip = PWGResidualBlock(
                self.residual_channels, self.gate_channels,
                self.skip_channels, self.kernel_size, d,
                name=f"block{i}")(x, c)
            skips = skips + skip
        h = skips * (1.0 / self.layers) ** 0.5
        h = nn.relu(h)
        h = nn.Conv(self.skip_channels, (1,), name="post1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (1,), name="post2")(h)
        return jnp.tanh(h)[..., 0]


# ------------------------------------------------------------ STFT loss

def multi_resolution_stft_loss(wav_fake, wav_real,
                               fft_sizes=(1024, 2048, 512),
                               hop_sizes=(120, 240, 50),
                               win_lengths=(600, 1200, 240)):
    """Spectral-convergence + log-magnitude L1 at several resolutions
    (espnet2/gan_tts/parallel_wavegan stft_loss.py contract)."""
    total = 0.0
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        p_f, _ = stft_power(wav_fake, n_fft=n_fft, hop_length=hop,
                            win_length=win)
        p_r, _ = stft_power(wav_real, n_fft=n_fft, hop_length=hop,
                            win_length=win)
        m_f = jnp.sqrt(jnp.maximum(p_f, 1e-10))
        m_r = jnp.sqrt(jnp.maximum(p_r, 1e-10))
        sc = jnp.linalg.norm(m_r - m_f) / jnp.maximum(
            jnp.linalg.norm(m_r), 1e-6)
        mag = jnp.mean(jnp.abs(jnp.log(m_r) - jnp.log(m_f)))
        total = total + sc + mag
    return total / len(fft_sizes)
