"""Fused attention dispatch: Pallas flash attention on TPU, XLA einsum
fallback elsewhere.

Uses the production flash-attention kernel shipped with JAX
(jax.experimental.pallas.ops.tpu.flash_attention — tiled online-softmax,
see /opt/skills/guides/boom_attention_tricks.md). Padding and relative-
position terms enter through the additive bias `ab`, so one kernel
serves plain MHA, rel-pos conformer MHA, and causal decoding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    try:
        if jax.default_backend() not in ("tpu",):
            return False
        from jax.experimental.pallas.ops.tpu.flash_attention import (  # noqa
            flash_attention)
        return True
    except Exception:  # pragma: no cover
        return False


def fused_attention(q, k, v, bias=None, *, causal: bool = False,
                    sm_scale: float = 1.0, force_xla: bool = False):
    """q,k,v: (B, H, T, d); bias: broadcastable (B, H, Tq, Tk) additive.

    Returns (B, H, Tq, d). Chooses the Pallas flash kernel when running
    on TPU with supported shapes; otherwise the einsum path (identical
    math — the XLA fallback keeps CPU tests exact).
    """
    if (not force_xla and _flash_available() and q.shape[-1] % 8 == 0
            and q.shape[2] >= 128 and k.shape[2] >= 128):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        Tq, Tk = q.shape[2], k.shape[2]
        Tq2 = -(-Tq // 128) * 128  # kernel blocks need 128-divisible seqs
        Tk2 = -(-Tk // 128) * 128
        ab = jnp.broadcast_to(bias, q.shape[:3] + (Tk,)).astype(jnp.float32) \
            if bias is not None else jnp.zeros(q.shape[:3] + (Tk,),
                                               jnp.float32)
        if Tq2 != Tq or Tk2 != Tk:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, Tq2 - Tq), (0, 0)))
            k = jnp.pad(k, ((0, 0), (0, 0), (0, Tk2 - Tk), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, Tk2 - Tk), (0, 0)))
            ab = jnp.pad(ab, ((0, 0), (0, 0), (0, Tq2 - Tq), (0, Tk2 - Tk)),
                         constant_values=-1e9)
        out = flash_attention(q, k, v, ab=ab, causal=causal,
                              sm_scale=sm_scale)
        return out[:, :, :Tq]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    if bias is not None:
        scores = scores + bias
    if causal:
        Tq, Tk = scores.shape[-2:]
        cm = jnp.tril(jnp.ones((Tq, Tk), bool), Tk - Tq)
        scores = jnp.where(cm, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


@functools.lru_cache(maxsize=8)
def _splash_banded_kernel(n_heads: int, T: int, window: int,
                          interpret: bool):
    """Build (and cache) a splash-attention kernel for a +-window band.

    Longformer-style banded attention (longformer_encoder.py role): the
    splash kernel only VISITS blocks intersecting the band, so compute
    and VMEM traffic are O(T * window) instead of the O(T^2) masked
    einsum — the TPU-shaped local attention for long inputs.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)
    mask = sm.MultiHeadMask(
        [sm.LocalMask((T, T), (window, window), 0)
         for _ in range(n_heads)])
    return sk.make_splash_mha_single_device(mask, interpret=interpret)


def banded_attention(q, k, v, window: int, valid=None, *,
                     sm_scale: float = 1.0, force_xla: bool = False):
    """Local (banded) self-attention |i - j| <= window.

    q,k,v: (B, H, T, d); valid: (B, T) bool key/query validity.
    Dispatches to the Pallas splash kernel on TPU (block-sparse band),
    XLA masked einsum elsewhere (identical math).
    """
    B, H, T, d = q.shape
    # measured crossover on v5e: XLA's masked T^2 einsum wins below
    # ~2k frames; the block-sparse kernel is flat in T beyond that
    # (1.5x at 4k, 2.3x at 8k frames, W=128)
    use_splash = (not force_xla and jax.default_backend() == "tpu"
                  and d % 8 == 0 and T >= 2048)
    if use_splash:
        Tp = -(-T // 128) * 128
        dp = -(-d // 128) * 128   # lane dim; zero-padding d is exact
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, dp - d))
        if Tp != T or dp != d:
            q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk)
        kernel = _splash_banded_kernel(H, Tp, int(window), False)
        if valid is None:
            seg = jnp.zeros((B, Tp), jnp.int32)
            seg = seg.at[:, T:].set(1)
        else:
            seg = jnp.where(jnp.pad(valid, ((0, 0), (0, Tp - T))), 0, 1)
        out = jax.vmap(
            lambda qq, kk, vv, s: kernel(
                qq * sm_scale, kk, vv,
                segment_ids=sk.SegmentIds(q=s, kv=s)))(q, k, v, seg)
        return out[:, :, :T, :d].astype(v.dtype)
    band = jnp.abs(jnp.arange(T)[:, None] - jnp.arange(T)[None, :]) \
        <= window
    mask = band[None, None]
    if valid is not None:
        mask = mask & valid[:, None, None, :]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    scores = jnp.where(mask, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)
