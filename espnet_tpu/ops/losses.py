"""Shared loss functions: CTC, label smoothing, accuracy.

Behavioral contracts:
- CTC: espnet2/asr/ctc.py:9-71 (builtin type, reduce mean over batch,
  zero-infinity). Implemented via optax.ctc_loss (XLA-native lattice DP).
- LabelSmoothingLoss: espnet2/legacy/nets/pytorch_backend/transformer/
  label_smoothing_loss.py (KL to smoothed target, ignore padding,
  normalize by #non-pad when length-normalized).
- th_accuracy: espnet2/legacy/nets/pytorch_backend/nets_utils.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from espnet_tpu.utils.masks import make_non_pad_mask


def ctc_loss(logits: jnp.ndarray, logit_lens: jnp.ndarray,
             labels: jnp.ndarray, label_lens: jnp.ndarray,
             blank_id: int = 0) -> jnp.ndarray:
    """Mean-over-batch CTC negative log likelihood.

    logits: (B, T, V) unnormalized; labels: (B, U) with 0-padding.
    """
    B, T, V = logits.shape
    U = labels.shape[1]
    logit_pad = (~make_non_pad_mask(logit_lens, T)).astype(jnp.float32)
    label_pad = (~make_non_pad_mask(label_lens, U)).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad, labels,
                             label_pad, blank_id=blank_id)
    # zero_infinity semantics: invalid alignments (U > T) contribute 0
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
    return jnp.mean(per_seq)


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         smoothing: float = 0.1, padding_idx: int = -1,
                         normalize_length: bool = False) -> jnp.ndarray:
    """KL(smoothed one-hot || softmax(logits)) summed over tokens.

    logits: (B, L, V); targets: (B, L) int with padding_idx marking pad.
    Returns loss normalized by batch (default) or token count.
    """
    V = logits.shape[-1]
    valid = targets != padding_idx
    tgt = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    smooth_val = smoothing / (V - 1)
    # KL(t||p) = sum t log t - sum t log p ; constant term included to
    # match reference's kl_div semantics
    true_dist_logp_sum = (confidence * jnp.take_along_axis(
        logp, tgt[..., None], axis=-1)[..., 0]
        + smooth_val * (jnp.sum(logp, axis=-1)
                        - jnp.take_along_axis(logp, tgt[..., None],
                                              axis=-1)[..., 0]))
    ent = -(confidence * jnp.log(jnp.maximum(confidence, 1e-20))
            + (V - 1) * smooth_val * jnp.log(jnp.maximum(smooth_val, 1e-20)))
    kl = -true_dist_logp_sum - ent
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1) if normalize_length \
        else jnp.maximum(jnp.sum(jnp.any(valid, axis=-1)), 1)
    return jnp.sum(kl) / denom


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
             padding_idx: int = -1) -> jnp.ndarray:
    """Token accuracy over non-pad positions (th_accuracy equivalent)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != padding_idx
    correct = jnp.sum((pred == targets) & valid)
    return correct / jnp.maximum(jnp.sum(valid), 1)


def add_sos_eos(ys_pad: jnp.ndarray, ys_lens: jnp.ndarray, sos: int, eos: int,
                ignore_id: int = -1):
    """(B, U) 0-padded labels -> (ys_in (B, U+1) , ys_out (B, U+1)).

    ys_in = [sos, y...]; ys_out = [y..., eos] with ignore_id padding —
    mirrors espnet2/legacy/nets/pytorch_backend/nets_utils.py add_sos_eos.
    """
    B, U = ys_pad.shape
    valid = make_non_pad_mask(ys_lens, U)
    ys_in = jnp.concatenate(
        [jnp.full((B, 1), sos, ys_pad.dtype), jnp.where(valid, ys_pad, eos)],
        axis=1)
    # ys_out: y tokens then eos at position ys_lens, ignore elsewhere
    pos = jnp.arange(U + 1)[None, :]
    y_ext = jnp.concatenate([ys_pad, jnp.zeros((B, 1), ys_pad.dtype)], axis=1)
    ys_out = jnp.where(pos < ys_lens[:, None], y_ext,
                       jnp.where(pos == ys_lens[:, None], eos, ignore_id))
    return ys_in, ys_out
