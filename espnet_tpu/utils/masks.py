"""Length-mask vocabulary of the framework.

ESPnet encodes variable lengths with `make_pad_mask`
(reference: espnet2/legacy/nets/pytorch_backend/nets_utils.py). On TPU all
shapes are static, so masks are the *only* representation of length: every
batched tensor is padded to a bucketed max length and carries an `ilens`
int32 vector.

Convention: masks in this codebase are boolean with True = VALID frame
(i.e. `make_non_pad_mask` polarity) unless the name says `pad`.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """True at PADDED positions. lengths: (B,) int -> (B, maxlen) bool."""
    ar = jnp.arange(maxlen, dtype=lengths.dtype)
    return ar[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """True at VALID positions. lengths: (B,) int -> (B, maxlen) bool."""
    ar = jnp.arange(maxlen, dtype=lengths.dtype)
    return ar[None, :] < lengths[:, None]


def mask_fill(x: jnp.ndarray, valid_mask: jnp.ndarray, value=0.0) -> jnp.ndarray:
    """Set invalid positions of x (B, T, ...) to `value` given (B, T) valid mask."""
    shape = valid_mask.shape + (1,) * (x.ndim - valid_mask.ndim)
    return jnp.where(valid_mask.reshape(shape), x, jnp.asarray(value, x.dtype))


def subsequent_mask(size: int) -> jnp.ndarray:
    """(size, size) bool, True where attention is allowed (lower triangular)."""
    return jnp.tril(jnp.ones((size, size), dtype=bool))


def attention_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool mask (True=attend) -> additive bias (0 / large negative).

    Uses a large-but-finite negative instead of -inf so fully-masked rows
    produce a uniform softmax rather than NaN (the main masking footgun
    flagged in SURVEY.md hard-parts #1).
    """
    neg = jnp.asarray(-1e9 if dtype == jnp.float32 else -1e4, dtype)
    return jnp.where(mask, jnp.asarray(0.0, dtype), neg)
