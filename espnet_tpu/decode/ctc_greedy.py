"""Greedy CTC decoding — fully vectorized on device.

argmax per frame -> collapse repeats -> drop blanks. Mirrors the
reference's greedy path (espnet2/bin/asr_inference.py ctc_greedy via
maskctc/ctc utilities) with a static-shape formulation: output is a
fixed (B, T) token array + lengths, so a whole batch decodes in one
XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask


def ctc_greedy_decode(logits: jnp.ndarray, lengths: jnp.ndarray,
                      blank_id: int = 0):
    """(B, T, V), (B,) -> tokens (B, T) int32 0-padded, token_lengths (B,).

    Collapsed sequence is left-packed with a stable sort trick (valid
    positions keep order, invalid pushed right) — no host loop.
    """
    B, T, V = logits.shape
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    valid_frame = make_non_pad_mask(lengths, T)
    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), pred[:, :-1]],
                           axis=1)
    keep = (pred != blank_id) & (pred != prev) & valid_frame
    # left-pack kept tokens with a stable argsort (kept positions first,
    # original order preserved) — one gather, no host loop
    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(pred, order, axis=1)
    n_tok = jnp.sum(keep, axis=1).astype(jnp.int32)
    out = jnp.where(jnp.arange(T)[None, :] < n_tok[:, None], packed, 0)
    return out, n_tok
