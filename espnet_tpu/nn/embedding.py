"""Positional encodings.

Behavioral contract: espnet2/legacy/nets/pytorch_backend/transformer/
embedding.py:38-456 (PositionalEncoding, ScaledPositionalEncoding,
RelPositionalEncoding). Tables are computed on the fly from static T —
cheap VPU work that XLA constant-folds per bucket shape.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_table(length: int, d_model: int, centered: bool = False) -> np.ndarray:
    """(L, d) sin/cos table; centered=True gives positions L-1 .. -(L-1)
    (2L-1 rows) for relative attention (Transformer-XL convention)."""
    if centered:
        pos = np.arange(length - 1, -length, -1.0)[:, None]
    else:
        pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(np.log(10000.0) / d_model))[None, :]
    pe = np.zeros((pos.shape[0], d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


class PositionalEncoding(nn.Module):
    """x -> dropout(x * sqrt(d) + PE)."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        T = x.shape[1]
        pe = jnp.asarray(sinusoidal_table(T, self.d_model))
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype)) + pe[None].astype(x.dtype)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class ScaledPositionalEncoding(nn.Module):
    """Learnable alpha scales PE (embedding.py:152)."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        T = x.shape[1]
        alpha = self.param("alpha", lambda k: jnp.ones(()))
        pe = jnp.asarray(sinusoidal_table(T, self.d_model))
        x = x + alpha * pe[None].astype(x.dtype)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class RelPositionalEncoding(nn.Module):
    """Returns (dropout(x*sqrt(d)), dropout(pos_emb)) with a centered
    (1, 2T-1, d) table (embedding.py:263 Transformer-XL style)."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        T = x.shape[1]
        pe = jnp.asarray(sinusoidal_table(T, self.d_model, centered=True))
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        drop = nn.Dropout(self.dropout_rate)
        return (drop(x, deterministic=deterministic),
                drop(pe[None].astype(x.dtype), deterministic=deterministic))
