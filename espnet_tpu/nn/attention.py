"""Multi-head attention (absolute + relative-position variants).

Behavioral contract: espnet2/legacy/nets/pytorch_backend/transformer/
attention.py:24 (MultiHeadedAttention) and :363
(RelPositionMultiHeadedAttention, Transformer-XL matrices A+C / B+D with
rel_shift). TPU-first notes:

- one fused QKV projection per layer (single MXU matmul instead of 3)
- additive mask bias with finite negative (no -inf NaN leaks)
- optional KV cache passed explicitly for incremental decoding; the cache
  is a fixed-size pytree so beam search can run inside lax.while_loop
  with gather-based reindexing (SURVEY.md §7 scorer protocol).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.utils.masks import attention_bias


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) -> (B, H, T, T) Transformer-XL relative shift.

    Implements the pad-reshape trick (attention.py:377-398) which XLA
    compiles to pure data movement.
    """
    B, H, T, P = x.shape  # P == 2T-1
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, P + 1, T)
    x = x[:, :, 1:].reshape(B, H, T, P)
    return x[:, :, :, :T]


class MultiHeadedAttention(nn.Module):
    """Standard scaled dot-product MHA over (B, T, D)."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, mask=None, *, deterministic=True,
                 cache=None, cache_index=None, window=None, valid=None):
        """mask: bool (B, Tq, Tk) or (B, 1, Tk), True = attend.

        cache: optional dict {"k": (B,H,Tmax,dk), "v": ...} for incremental
        decoding; cache_index is the current write position (int scalar).
        Returns (out, new_cache).

        window/valid: Longformer-style +-window band over a (B, T) valid
        mask — routed to the block-sparse splash kernel on TPU
        (ops/attention_kernels.banded_attention) instead of a masked
        T^2 einsum.
        """
        H, D = self.n_head, self.n_feat
        dk = D // H
        q = nn.Dense(D, name="linear_q")(query)
        k = nn.Dense(D, name="linear_k")(key)
        v = nn.Dense(D, name="linear_v")(value)

        def split(x):
            B, T = x.shape[0], x.shape[1]
            return x.reshape(B, T, H, dk).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if window is not None and cache is None \
                and not self.is_mutable_collection("intermediates") \
                and (self.dropout_rate == 0.0 or deterministic):
            from espnet_tpu.ops.attention_kernels import banded_attention
            out = banded_attention(q, k, v, window, valid,
                                   sm_scale=1.0 / float(np.sqrt(dk)))
            B, _, Tq, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
            return nn.Dense(D, name="linear_out")(out)
        new_cache = None
        if cache is not None:
            # write current k/v at cache_index, attend over the full cache
            k = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, cache_index, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, cache_index, 0))
            new_cache = {"k": k, "v": v}
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(dk, jnp.float32))
        if mask is not None:
            scores = scores + attention_bias(mask[:, None], scores.dtype)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        if self.is_mutable_collection("intermediates"):
            # attention heatmaps (calculate_all_attentions.py:30 contract);
            # dead code under plain apply() — XLA DCEs the sow
            self.sow("intermediates", "attn", attn)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        B, _, Tq, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
        out = nn.Dense(D, name="linear_out")(out)
        if cache is not None:
            return out, new_cache
        return out


class RelPositionMultiHeadedAttention(nn.Module):
    """Relative-position MHA (Transformer-XL / Conformer flavor)."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, pos_emb, mask=None, *,
                 deterministic=True):
        H, D = self.n_head, self.n_feat
        dk = D // H
        q = nn.Dense(D, name="linear_q")(query)
        k = nn.Dense(D, name="linear_k")(key)
        v = nn.Dense(D, name="linear_v")(value)
        p = nn.Dense(D, use_bias=False, name="linear_pos")(pos_emb)

        def split(x):
            B, T = x.shape[0], x.shape[1]
            return x.reshape(B, T, H, dk).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        p = split(p)  # (1, H, 2T-1, dk)
        bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(),
                            (H, dk))
        bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(),
                            (H, dk))
        q_u = q + bias_u[None, :, None, :]
        q_v = q + bias_v[None, :, None, :]
        # position scores (b)+(d) become an additive bias for the fused
        # attention kernel; content scores (a)+(c) are the kernel's QK^T
        bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, p,
                        preferred_element_type=jnp.float32)
        bd = rel_shift(bd)
        sm_scale = 1.0 / float(np.sqrt(dk))
        bias = bd * sm_scale
        if mask is not None:
            bias = bias + attention_bias(mask[:, None], bias.dtype)
        if (self.dropout_rate > 0.0 and not deterministic) \
                or self.is_mutable_collection("intermediates"):
            # attention-prob dropout / heatmap capture require the
            # explicit (non-fused) path
            scores = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                                preferred_element_type=jnp.float32
                                ) * sm_scale + bias
            attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            if self.is_mutable_collection("intermediates"):
                self.sow("intermediates", "attn", attn)
            attn = nn.Dropout(self.dropout_rate)(attn,
                                                 deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        else:
            from espnet_tpu.ops.attention_kernels import fused_attention
            out = fused_attention(q_u, k, v, bias=bias, sm_scale=sm_scale)
        B, _, Tq, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
        return nn.Dense(D, name="linear_out")(out)
