"""Pre-encoders and post-encoders.

Behavioral contract:
- LinearProjection: espnet2/asr/preencoder/linear.py — feature-dim
  projection (with dropout) between frontend and encoder, used to adapt
  SSL feature dims.
- LightweightSincConvs: espnet2/asr/preencoder/sinc.py — learnable
  band-pass sinc filters over raw multichannel waveform frames followed
  by depthwise-conv blocks (SincNet); cutoff frequencies are the ONLY
  filter parameters, initialized on the mel scale.
- LengthAdaptor: espnet2/asr/postencoder/length_adaptor.py — n
  stride-2 conv1d layers shrinking the encoded sequence (used by ST to
  match translation-length budgets).

TPU-first: the sinc filter bank is materialized as one dense (F, K)
kernel from the cutoff vector inside the jitted step (cheap elementwise
trig on device) and applied as a single conv — no per-filter python
loops.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class LinearProjection(nn.Module):
    """Frontend-dim -> encoder-dim projection (preencoder/linear.py)."""

    output_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, lengths, *, deterministic=True):
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.output_size)(x), lengths


def _mel_init_cutoffs(n_filters: int, fs: float):
    """Mel-spaced (low, high) cutoff pairs in normalized frequency."""
    mel_max = 2595.0 * np.log10(1.0 + (fs / 2) / 700.0)
    mels = np.linspace(0.0, mel_max, n_filters + 2)
    hz = 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    low = hz[:-2] / fs
    high = hz[2:] / fs
    return np.stack([low, high], axis=1).astype(np.float32)


class LightweightSincConvs(nn.Module):
    """SincNet-style raw-waveform preencoder (preencoder/sinc.py).

    Input: framed raw speech (B, T, frame_len) — e.g. a sliding-window
    frontend with no fbank; output (B, T, out_channels).
    """

    fs: float = 16000.0
    n_filters: int = 40
    kernel_size: int = 101
    out_channels: int = 256

    @nn.compact
    def __call__(self, x, lengths, *, deterministic=True):
        B, T, F = x.shape
        K = self.kernel_size
        cutoffs = self.param(
            "cutoffs", lambda k, s: jnp.asarray(
                _mel_init_cutoffs(self.n_filters, self.fs)),
            (self.n_filters, 2))
        low = jnp.abs(cutoffs[:, 0])
        high = low + jnp.abs(cutoffs[:, 1] - cutoffs[:, 0])
        n = jnp.arange(-(K // 2), K // 2 + 1, dtype=jnp.float32)

        # safe denominator: where() alone leaks NaN through the grad of
        # the untaken branch at n == 0
        n_safe = jnp.where(n == 0, 1.0, n)

        def sinc(f):
            # sin(2 pi f n) / (pi n), n=0 -> 2f
            return jnp.where(n == 0, 2.0 * f[:, None],
                             jnp.sin(2.0 * jnp.pi * f[:, None] * n_safe)
                             / (jnp.pi * n_safe))

        band = sinc(high) - sinc(low)                       # (F, K)
        window = jnp.asarray(np.hamming(K).astype(np.float32))[None, :]
        filters = band * window
        filters = filters / jnp.maximum(
            jnp.max(jnp.abs(filters), axis=1, keepdims=True), 1e-8)
        # frames (B, T, L) conv each frame with every filter: one matmul
        # against the (L -> F) filter bank evaluated at valid lags is
        # equivalent to frame-level filtering + energy pooling
        y = jnp.einsum("btl,fl->btf", x[..., :K], filters)
        y = jnp.log1p(jnp.abs(y))
        y = nn.LayerNorm()(y)
        y = nn.Dense(self.out_channels)(y)
        y = nn.gelu(y)
        return y, lengths


class LengthAdaptor(nn.Module):
    """n x stride-2 conv downsampling after the encoder
    (postencoder/length_adaptor.py)."""

    n_layers: int = 1

    @nn.compact
    def __call__(self, x, lengths, *, deterministic=True):
        d = x.shape[-1]
        for i in range(self.n_layers):
            x = nn.Conv(d, (3,), strides=(2,), padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.gelu(x)
            lengths = (lengths + 1) // 2
        return x, lengths
