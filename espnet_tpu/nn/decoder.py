"""Transformer decoder with teacher-forced forward and cached one-step
scoring for beam search.

Behavioral contract: espnet2/asr/decoder/transformer_decoder.py
(BaseTransformerDecoder.forward :393, forward_one_step :191,
batch_score :262). TPU-first redesign of the scoring path: instead of
re-running the decoder over a growing prefix with per-layer state lists,
`init_state`/`score_step` maintain a FIXED-SIZE KV cache pytree
(B*, H, Lmax, dk per layer) written at position `step` — so the whole
beam loop stays inside one `lax.while_loop` with gather-based beam
reindexing (SURVEY.md §7).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.nn.embedding import PositionalEncoding, sinusoidal_table
from espnet_tpu.nn.transformer import PositionwiseFeedForward
from espnet_tpu.utils.masks import attention_bias, make_non_pad_mask, subsequent_mask


class DecoderMHA(nn.Module):
    """MHA specialized for decoding: supports full-sequence and cached
    single-step modes with shared parameters."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0

    def setup(self):
        self.linear_q = nn.Dense(self.n_feat)
        self.linear_k = nn.Dense(self.n_feat)
        self.linear_v = nn.Dense(self.n_feat)
        self.linear_out = nn.Dense(self.n_feat)
        self.drop = nn.Dropout(self.dropout_rate)

    def _split(self, x):
        B, T = x.shape[0], x.shape[1]
        dk = self.n_feat // self.n_head
        return x.reshape(B, T, self.n_head, dk).transpose(0, 2, 1, 3)

    def _attend(self, q, k, v, mask, deterministic):
        dk = self.n_feat // self.n_head
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(dk, jnp.float32))
        if mask is not None:
            scores = scores + attention_bias(mask, scores.dtype)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = self.drop(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        B, _, Tq, _ = out.shape
        return self.linear_out(out.transpose(0, 2, 1, 3).reshape(B, Tq, self.n_feat))

    def __call__(self, query, key, value, mask, *, deterministic=True):
        """mask: (B, Tq, Tk) or (B, 1, Tk) bool -> broadcast over heads."""
        q, k, v = (self._split(self.linear_q(query)),
                   self._split(self.linear_k(key)),
                   self._split(self.linear_v(value)))
        m = None if mask is None else mask[:, None]
        return self._attend(q, k, v, m, deterministic)

    def step(self, query, cache_k, cache_v, step, kv_mask, *,
             deterministic=True):
        """query: (B, 1, D); cache_{k,v}: (B, H, Lmax, dk) updated at
        `step`; kv_mask: (B, Lmax) bool valid. Returns (out, ck, cv)."""
        q = self._split(self.linear_q(query))
        k1 = self._split(self.linear_k(query))
        v1 = self._split(self.linear_v(query))
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k1.astype(cache_k.dtype), (0, 0, step, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v1.astype(cache_v.dtype), (0, 0, step, 0))
        out = self._attend(q, cache_k, cache_v, kv_mask[:, None, None, :],
                           deterministic)
        return out, cache_k, cache_v

    def cross(self, query, enc_k, enc_v, enc_mask, *, deterministic=True):
        """Cross-attention with precomputed encoder K/V (B, H, Tenc, dk).

        `query` may carry rows = B * beam hypothesis rows against K/V
        kept at utterance resolution (B): the beam dimension folds into
        the query-time axis by reshape, so beam copies of the encoder
        K/V are never materialized (they are immutable and identical
        within a beam block — expanding them doubled the decode-state
        bytes and the per-step reorder traffic)."""
        rows, Tq, _ = query.shape
        B = enc_k.shape[0]
        if rows == B:
            q = self._split(self.linear_q(query))
            return self._attend(q, enc_k, enc_v, enc_mask[:, None, None, :],
                                deterministic)
        n = rows // B
        dk = self.n_feat // self.n_head
        q = self.linear_q(query).reshape(
            B, n * Tq, self.n_head, dk).transpose(0, 2, 1, 3)
        out = self._attend(q, enc_k, enc_v, enc_mask[:, None, None, :],
                           deterministic)  # (B, n*Tq, D)
        return out.reshape(rows, Tq, self.n_feat)

    def encode_kv(self, memory):
        return self._split(self.linear_k(memory)), self._split(self.linear_v(memory))


class TransformerDecoderLayer(nn.Module):
    attention_heads: int
    d_model: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True

    def setup(self):
        self.self_attn = DecoderMHA(self.attention_heads, self.d_model,
                                    self.self_attention_dropout_rate)
        self.src_attn = DecoderMHA(self.attention_heads, self.d_model,
                                   self.src_attention_dropout_rate)
        self.feed_forward = PositionwiseFeedForward(self.linear_units,
                                                    self.dropout_rate)
        self.norm1 = nn.LayerNorm()
        self.norm2 = nn.LayerNorm()
        self.norm3 = nn.LayerNorm()
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, tgt, tgt_mask, memory, memory_mask, *,
                 deterministic=True):
        residual = tgt
        x = self.norm1(tgt) if self.normalize_before else tgt
        x = residual + self.drop(self.self_attn(x, x, x, tgt_mask,
                                                deterministic=deterministic),
                                 deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)
        residual = x
        h = self.norm2(x) if self.normalize_before else x
        x = residual + self.drop(self.src_attn(h, memory, memory, memory_mask,
                                               deterministic=deterministic),
                                 deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)
        residual = x
        h = self.norm3(x) if self.normalize_before else x
        x = residual + self.drop(self.feed_forward(h, deterministic=deterministic),
                                 deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm3(x)
        return x

    def step(self, tgt, cache_k, cache_v, step, self_mask, enc_k, enc_v,
             enc_mask, *, deterministic=True):
        residual = tgt
        x = self.norm1(tgt) if self.normalize_before else tgt
        sa, cache_k, cache_v = self.self_attn.step(
            x, cache_k, cache_v, step, self_mask, deterministic=deterministic)
        x = residual + sa
        if not self.normalize_before:
            x = self.norm1(x)
        residual = x
        h = self.norm2(x) if self.normalize_before else x
        x = residual + self.src_attn.cross(h, enc_k, enc_v, enc_mask,
                                           deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)
        residual = x
        h = self.norm3(x) if self.normalize_before else x
        x = residual + self.feed_forward(h, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, cache_k, cache_v


class TransformerDecoder(nn.Module):
    vocab_size: int
    encoder_output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    input_layer: str = "embed"

    def setup(self):
        d = self.encoder_output_size
        self.embed = nn.Embed(self.vocab_size, d)
        self.pos_enc = PositionalEncoding(d, self.positional_dropout_rate)
        self.layers = [
            TransformerDecoderLayer(
                self.attention_heads, d, self.linear_units, self.dropout_rate,
                self.self_attention_dropout_rate,
                self.src_attention_dropout_rate, self.normalize_before,
                name=f"layer{i}")
            for i in range(self.num_blocks)]
        self.after_norm = nn.LayerNorm()
        self.output_layer = nn.Dense(self.vocab_size)

    def __call__(self, memory, memory_lens, ys_in, ys_in_lens, *,
                 deterministic=True, return_hidden=False):
        """Teacher-forced forward -> (B, L, V) logits
        [+ pre-output hidden states when return_hidden — the
        translatotron2/UnitY second-pass conditioning hook]."""
        L = ys_in.shape[1]
        tgt_mask = (make_non_pad_mask(ys_in_lens, L)[:, None, :]
                    & subsequent_mask(L)[None])
        mem_mask = make_non_pad_mask(memory_lens, memory.shape[1])[:, None, :]
        x = self.pos_enc(self.embed(ys_in), deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, tgt_mask, memory, mem_mask,
                      deterministic=deterministic)
        if self.normalize_before:
            x = self.after_norm(x)
        logits = self.output_layer(x)
        if return_hidden:
            return logits, x
        return logits

    # ---- functional scorer protocol (beam search) ----

    def init_state(self, memory, memory_lens, batch: int, maxlen: int):
        """Build the fixed-size decode state for `batch` hypothesis rows.

        Returns dict with per-layer KV caches and precomputed encoder K/V.
        memory: (B, Tenc, D) at UTTERANCE resolution with B dividing
        `batch` (= B * beam hypothesis rows). Encoder K/V and mask stay
        at B — they are immutable during search and identical across a
        beam block, so keeping them un-expanded halves the decode-state
        bytes and exempts them from the per-step beam reorder (the
        dominant HBM traffic of the search loop: gathering the full
        1.1 GB state each step cost ~3x the decode compute).
        """
        d = self.encoder_output_size
        dk = d // self.attention_heads
        enc_mask = make_non_pad_mask(memory_lens, memory.shape[1])
        state = {
            "cache_k": jnp.zeros((self.num_blocks, batch, self.attention_heads,
                                  maxlen, dk), memory.dtype),
            "cache_v": jnp.zeros((self.num_blocks, batch, self.attention_heads,
                                  maxlen, dk), memory.dtype),
            "enc_k": jnp.stack([layer.src_attn.encode_kv(memory)[0]
                                for layer in self.layers]),
            "enc_v": jnp.stack([layer.src_attn.encode_kv(memory)[1]
                                for layer in self.layers]),
            "enc_mask": enc_mask,
        }
        return state

    @staticmethod
    def select_state(state, idx):
        """Gather decode-state rows by new-beam source indices (the
        batch_score state-reordering contract, transformer_decoder.py:262,
        as one gather on the stacked caches). Only the self-attention
        caches move: encoder K/V are at utterance resolution and beam
        reordering never crosses an utterance's beam block, so gathering
        them would be an expensive identity."""
        return dict(state,
                    cache_k=state["cache_k"][:, idx],
                    cache_v=state["cache_v"][:, idx])

    def score_step(self, token, step, state, *, deterministic=True):
        """token: (B*,) int32 last token; step: scalar int position.

        Returns (log_probs (B*, V), new_state). Self-attention sees
        positions [0, step] via the running KV cache.
        """
        B = token.shape[0]
        d = self.encoder_output_size
        x = self.embed(token)[:, None, :]  # (B,1,D)
        pe = jnp.asarray(sinusoidal_table(2048, d))
        x = x * jnp.sqrt(jnp.asarray(d, x.dtype)) + jax.lax.dynamic_slice(
            pe, (step, 0), (1, d))[None].astype(x.dtype)
        maxlen = state["cache_k"].shape[3]
        pos_mask = jnp.arange(maxlen)[None, :] <= step  # (1, Lmax)
        self_mask = jnp.broadcast_to(pos_mask, (B, maxlen))
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, ck, cv = layer.step(
                x, state["cache_k"][i], state["cache_v"][i], step, self_mask,
                state["enc_k"][i], state["enc_v"][i], state["enc_mask"],
                deterministic=deterministic)
            new_k.append(ck)
            new_v.append(cv)
        if self.normalize_before:
            x = self.after_norm(x)
        logits = self.output_layer(x[:, 0])
        new_state = dict(state, cache_k=jnp.stack(new_k),
                         cache_v=jnp.stack(new_v))
        return jax.nn.log_softmax(logits, axis=-1), new_state
