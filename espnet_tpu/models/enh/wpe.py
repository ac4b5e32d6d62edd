"""WPE (weighted prediction error) dereverberation.

Behavioral contract: the reference's DNN-WPE frontend chain
(legacy/nets/pytorch_backend/frontends/frontend.py — nara-WPE style
iterative multichannel linear prediction applied before the MVDR
beamformer). Pure JAX: per-frequency correlation build + solve are
batched einsums over (B, F) — MXU-heavy and fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stack_taps(spec: jnp.ndarray, taps: int, delay: int) -> jnp.ndarray:
    """spec: (B, F, C, T) complex -> (B, F, C*taps, T) delayed stack:
    tilde_x[t] = [x[t-delay], ..., x[t-delay-taps+1]]."""
    B, F, C, T = spec.shape
    outs = []
    for k in range(taps):
        d = delay + k
        pad = jnp.zeros((B, F, C, d), spec.dtype)
        outs.append(jnp.concatenate([pad, spec[..., :T - d]], axis=-1))
    return jnp.concatenate(outs, axis=2)  # (B, F, C*taps, T)


def wpe_dereverb(spec: jnp.ndarray, taps: int = 5, delay: int = 3,
                 iterations: int = 3, eps: float = 1e-8) -> jnp.ndarray:
    """spec: (B, T, C, F) complex STFT -> dereverberated same shape."""
    x = spec.transpose(0, 3, 2, 1)  # (B, F, C, T)
    B, F, C, T = x.shape
    y = x
    tilde = _stack_taps(x, taps, delay)  # (B, F, K, T), K = C*taps
    for _ in range(iterations):
        # power (variance) estimate from current enhanced signal
        lam = jnp.mean(jnp.abs(y) ** 2, axis=2) + eps  # (B, F, T)
        w = 1.0 / lam[:, :, None, :]  # (B, F, 1, T)
        # correlation R = sum_t w * tilde tilde^H ; P = sum_t w * tilde x^H
        R = jnp.einsum("bfkt,bflt->bfkl", tilde * w, jnp.conj(tilde))
        P = jnp.einsum("bfkt,bfct->bfkc", tilde * w, jnp.conj(x))
        K = R.shape[-1]
        # trace-relative diagonal loading keeps near-singular correlation
        # matrices (e.g. correlated channels) solvable
        load = (jnp.trace(R, axis1=-2, axis2=-1).real[..., None, None]
                / K) * 1e-4 + eps
        R = R + load * jnp.eye(K, dtype=R.dtype)
        G = jnp.linalg.solve(R, P)  # (B, F, K, C)
        y = x - jnp.einsum("bfkc,bfkt->bfct", jnp.conj(G), tilde)
    return y.transpose(0, 3, 2, 1)  # (B, T, C, F)
