"""RWKV WKV recurrence — native scan with numerically-stable running max.

Behavioral contract: the reference's CUDA kernel
espnet2/asr_transducer/decoder/modules/rwkv/cuda/wkv_cuda.cu (+ pybind
binding wkv_op.cpp:7-37): wkv[t] = (sum_{i<t} e^{k_i + w*(t-1-i)} v_i +
e^{u + k_t} v_t) / (same denominator), computed with a running-maximum
trick for stability.

TPU-first: a `lax.scan` over time carrying (numerator a, denominator b,
running max p) per channel — the linear-attention recurrence is
elementwise VPU work; XLA autodiff provides the backward scan (the CUDA
backward kernel's role).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wkv(w: jnp.ndarray, u: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
        ) -> jnp.ndarray:
    """w, u: (D,) channel decay/bonus; k, v: (B, T, D) -> (B, T, D).

    w is the (positive) decay magnitude; the recurrence applies e^{-w}
    per step (wkv_cuda.cu uses w = -exp(w_log) internally; here pass the
    already-negated decay as `w` < 0 like the kernel's input).
    """
    B, T, D = k.shape

    def step(carry, kt_vt):
        a, b, p = carry  # (B, D) num, den, running max exponent
        kt, vt = kt_vt   # (B, D)
        # output at t uses bonus u
        q = jnp.maximum(p, u + kt)
        e1 = jnp.exp(p - q)
        e2 = jnp.exp(u + kt - q)
        out = (e1 * a + e2 * vt) / jnp.maximum(e1 * b + e2, 1e-30)
        # state update with decay w
        q2 = jnp.maximum(p + w, kt)
        e1s = jnp.exp(p + w - q2)
        e2s = jnp.exp(kt - q2)
        a2 = e1s * a + e2s * vt
        b2 = e1s * b + e2s
        return (a2, b2, q2), out

    init = (jnp.zeros((B, D)), jnp.zeros((B, D)),
            jnp.full((B, D), -1e30))
    _, outs = jax.lax.scan(step, init,
                           (k.transpose(1, 0, 2), v.transpose(1, 0, 2)))
    return outs.transpose(1, 0, 2)


def wkv_step(w, u, k_t, v_t, state):
    """Single-step WKV for incremental decoding.

    state = (a, b, p) each (B, D); returns (out, new_state).
    """
    a, b, p = state
    q = jnp.maximum(p, u + k_t)
    e1 = jnp.exp(p - q)
    e2 = jnp.exp(u + k_t - q)
    out = (e1 * a + e2 * v_t) / jnp.maximum(e1 * b + e2, 1e-30)
    q2 = jnp.maximum(p + w, k_t)
    e1s = jnp.exp(p + w - q2)
    e2s = jnp.exp(k_t - q2)
    return out, (e1s * a + e2s * v_t, e1s * b + e2s, q2)


def wkv_init_state(batch: int, dim: int, dtype=jnp.float32):
    return (jnp.zeros((batch, dim), dtype), jnp.zeros((batch, dim), dtype),
            jnp.full((batch, dim), -1e30, dtype))
