"""Enhancement losses: SI-SNR, SNR, L1/MSE TF losses + PIT wrapper.

Behavioral contract: espnet2/enh/loss/criterions/time_domain.py
(SISNRLoss), tf_domain.py, and wrappers/pit_solver.py (permutation-
invariant training). PIT on TPU = `vmap` over the (num_spk!) permutation
set and a min-reduce — no Hungarian solver needed for the 2-4 speaker
cases the reference targets.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask


def si_snr_loss(est: jnp.ndarray, ref: jnp.ndarray,
                lengths: jnp.ndarray | None = None,
                eps: float = 1e-8) -> jnp.ndarray:
    """-SI-SNR in dB per batch element. est/ref: (B, S)."""
    if lengths is not None:
        mask = make_non_pad_mask(lengths, est.shape[1]).astype(est.dtype)
        est = est * mask
        ref = ref * mask
        n = jnp.maximum(lengths.astype(est.dtype), 1.0)[:, None]
    else:
        n = est.shape[1]
    est = est - jnp.sum(est, axis=1, keepdims=True) / n
    ref = ref - jnp.sum(ref, axis=1, keepdims=True) / n
    if lengths is not None:
        mask = make_non_pad_mask(lengths, est.shape[1]).astype(est.dtype)
        est = est * mask
        ref = ref * mask
    dot = jnp.sum(est * ref, axis=1, keepdims=True)
    s_ref = dot * ref / (jnp.sum(ref * ref, axis=1, keepdims=True) + eps)
    e = est - s_ref
    ratio = (jnp.sum(s_ref * s_ref, axis=1) + eps) / (
        jnp.sum(e * e, axis=1) + eps)
    return -10.0 * jnp.log10(ratio)


def snr_loss(est, ref, lengths=None, eps: float = 1e-8):
    if lengths is not None:
        mask = make_non_pad_mask(lengths, est.shape[1]).astype(est.dtype)
        est, ref = est * mask, ref * mask
    noise = est - ref
    ratio = (jnp.sum(ref * ref, axis=1) + eps) / (
        jnp.sum(noise * noise, axis=1) + eps)
    return -10.0 * jnp.log10(ratio)


def l1_loss(est, ref, lengths=None):
    d = jnp.abs(est - ref)
    if lengths is not None:
        mask = make_non_pad_mask(lengths, est.shape[1])
        mask = mask.reshape(mask.shape + (1,) * (d.ndim - 2))
        d = jnp.where(mask, d, 0.0)
        denom = jnp.maximum(jnp.sum(mask, axis=tuple(range(1, d.ndim))), 1)
        return jnp.sum(d, axis=tuple(range(1, d.ndim))) / denom
    return jnp.mean(d, axis=tuple(range(1, d.ndim)))


CRITERIA = {"si_snr": si_snr_loss, "snr": snr_loss, "l1": l1_loss}


def mixit_loss(loss_fn, ests, mixtures, lengths=None):
    """Mixture-invariant training (espnet2/enh/loss/wrappers/
    mixit_solver.py): assign each of M estimated sources to one of the
    two reference mixtures; loss = min over all 2^M binary assignments
    of the pairwise loss between summed assignments and the mixtures.

    ests: list of M (B, S) estimates; mixtures: list of 2 (B, S).
    Returns (loss (B,), best_assignment (B,) bitmask: bit i set =
    source i assigned to mixture 1).
    """
    M = len(ests)
    est = jnp.stack(ests, axis=1)           # (B, M, S)
    losses = []
    for bits in range(2 ** M):
        sel = jnp.asarray([(bits >> i) & 1 for i in range(M)],
                          est.dtype)        # (M,)
        mix1 = jnp.einsum("m,bms->bs", sel, est)
        mix0 = jnp.einsum("m,bms->bs", 1.0 - sel, est)
        l = (loss_fn(mix0, mixtures[0], lengths)
             + loss_fn(mix1, mixtures[1], lengths)) / 2.0
        losses.append(l)
    losses = jnp.stack(losses, axis=1)      # (B, 2^M)
    best = jnp.argmin(losses, axis=1)
    return jnp.take_along_axis(losses, best[:, None], axis=1)[:, 0], best


def pit_loss(loss_fn, ests, refs, lengths=None):
    """Permutation-invariant wrapper (pit_solver.py behavior).

    ests/refs: lists of (B, ...) per speaker. Returns (loss (B,),
    best_perm (B,) index into the permutation table).
    """
    n = len(ests)
    perms = list(itertools.permutations(range(n)))
    losses = []
    for perm in perms:
        per_perm = sum(loss_fn(ests[i], refs[p], lengths)
                       for i, p in enumerate(perm)) / n
        losses.append(per_perm)
    losses = jnp.stack(losses, axis=1)  # (B, n_perm)
    best = jnp.argmin(losses, axis=1)
    return jnp.take_along_axis(losses, best[:, None], axis=1)[:, 0], best
