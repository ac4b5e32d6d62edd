"""Streaming (block-wise) conformer encoder with context carry-over.

Behavioral contract: espnet2/asr/encoder/contextual_block_conformer_
encoder.py:40 — block-synchronous processing with context inheritance so
streaming outputs match training; espnet2/bin/asr_inference_streaming.py
consumes it block by block.

TPU-first redesign: chunked-causal attention instead of the reference's
context-embedding scheme — training runs the full utterance with a
block-diagonal + left-context attention mask (one XLA program, exact
match to inference), and inference is a `step` function over fixed-size
chunks whose state is an explicit pytree:
  - per-layer rolling K/V-context of the last `left_chunks` chunks
  - depthwise-conv left tail (kernel-1 frames)
so a whole streaming session is state-in/state-out with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.nn.attention import MultiHeadedAttention
from espnet_tpu.nn.embedding import PositionalEncoding
from espnet_tpu.nn.subsampling import Conv2dSubsampling
from espnet_tpu.nn.transformer import PositionwiseFeedForward
from espnet_tpu.utils.masks import make_non_pad_mask
from espnet_tpu.nn.convolution import DepthwiseConv1d


def chunk_attention_mask(T: int, chunk: int, left_chunks: int) -> jnp.ndarray:
    """(T, T) bool: frame q attends frames in its chunk + left_chunks
    previous chunks (the standard chunked-causal streaming mask)."""
    q = jnp.arange(T)[:, None] // chunk
    k = jnp.arange(T)[None, :] // chunk
    return (k <= q) & (k >= q - left_chunks)


class CausalConvModule(nn.Module):
    """Conformer conv module with LEFT-only padding so inference can
    stream with a (kernel-1)-frame tail cache."""

    channels: int
    kernel_size: int = 15

    @nn.compact
    def __call__(self, x, valid_mask=None, tail=None):
        """tail: (B, kernel-1, D) previous frames or None (zeros)."""
        if valid_mask is not None:
            x = jnp.where(valid_mask[:, :, None], x, 0.0)
        h = nn.Dense(2 * self.channels, name="pointwise_conv1")(x)
        h = nn.glu(h, axis=-1)
        pad = self.kernel_size - 1
        if tail is None:
            tail_h = jnp.zeros((h.shape[0], pad, h.shape[2]), h.dtype)
        else:
            tail_h = tail
        h_ext = jnp.concatenate([tail_h, h], axis=1)
        new_tail = h_ext[:, -pad:] if pad > 0 else tail_h
        h = DepthwiseConv1d(self.channels, self.kernel_size,
                            padding="VALID",
                            name="depthwise_conv")(h_ext)
        h = nn.LayerNorm(name="norm")(h)
        h = nn.swish(h)
        h = nn.Dense(self.channels, name="pointwise_conv2")(h)
        if valid_mask is not None:
            h = jnp.where(valid_mask[:, :, None], h, 0.0)
        return h, new_tail


class StreamingConformerLayer(nn.Module):
    attention_heads: int
    d_model: int
    linear_units: int
    cnn_kernel: int = 15
    dropout_rate: float = 0.1

    def setup(self):
        self.ff_macaron = PositionwiseFeedForward(self.linear_units,
                                                  self.dropout_rate,
                                                  activation="swish")
        self.self_attn = MultiHeadedAttention(self.attention_heads,
                                              self.d_model)
        self.conv = CausalConvModule(self.d_model, self.cnn_kernel)
        self.ff = PositionwiseFeedForward(self.linear_units,
                                          self.dropout_rate,
                                          activation="swish")
        self.norm_ff_macaron = nn.LayerNorm()
        self.norm_mha = nn.LayerNorm()
        self.norm_conv = nn.LayerNorm()
        self.norm_ff = nn.LayerNorm()
        self.norm_final = nn.LayerNorm()
        self.drop = nn.Dropout(self.dropout_rate)

    def _common(self, x, attn_out, valid_mask, conv_tail, deterministic):
        x = x + self.drop(attn_out, deterministic=deterministic)
        residual = x
        h, new_tail = self.conv(self.norm_conv(x), valid_mask, conv_tail)
        x = residual + self.drop(h, deterministic=deterministic)
        residual = x
        x = residual + 0.5 * self.drop(
            self.ff(self.norm_ff(x), deterministic=deterministic),
            deterministic=deterministic)
        return self.norm_final(x), new_tail

    def __call__(self, x, attn_mask, valid_mask, *, deterministic=True):
        """Full-utterance (training) path with chunked mask."""
        residual = x
        x = residual + 0.5 * self.drop(
            self.ff_macaron(self.norm_ff_macaron(x),
                            deterministic=deterministic),
            deterministic=deterministic)
        h = self.norm_mha(x)
        attn = self.self_attn(h, h, h, attn_mask,
                              deterministic=deterministic)
        out, _ = self._common(x, attn, valid_mask, None, deterministic)
        return out

    def step(self, x, ctx, conv_tail, kv_mask):
        """x: (B, chunk, D) current chunk; ctx: (B, L_ctx, D) previous
        layer-input context (post-macaron); kv_mask: (B, L_ctx+chunk) bool
        (False on not-yet-filled context slots). Returns
        (out, new_ctx_entry, new_conv_tail)."""
        residual = x
        x = residual + 0.5 * self.ff_macaron(self.norm_ff_macaron(x))
        h = self.norm_mha(x)
        ctx_h = self.norm_mha(ctx)
        kv = jnp.concatenate([ctx_h, h], axis=1)
        attn = self.self_attn(h, kv, kv, kv_mask[:, None, :])
        out, new_tail = self._common(x, attn, None, conv_tail, True)
        return out, x, new_tail  # x (post-macaron) becomes future context


class StreamingState(NamedTuple):
    ctx: jnp.ndarray        # (layers, B, L_ctx, D) attention context
    conv_tail: jnp.ndarray  # (layers, B, kernel-1, D)
    frame_offset: jnp.ndarray  # (B,) frames processed per row (pos enc);
    # scalar accepted for back-compat (broadcast in stream_step)


class StreamingConformerEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 6
    chunk_size: int = 16         # post-subsampling frames per chunk
    left_chunks: int = 2
    cnn_kernel: int = 15
    dropout_rate: float = 0.1
    input_layer: str = "conv2d"

    def setup(self):
        rate = {"conv2d": 4, "conv2d2": 2, "conv2d6": 6, "conv2d8": 8}.get(
            self.input_layer)
        if rate is not None:
            self.embed = Conv2dSubsampling(self.output_size,
                                           self.dropout_rate, rate=rate)
        else:
            self.embed = None
            self.embed_lin = nn.Dense(self.output_size)
        self.pos_enc = PositionalEncoding(self.output_size,
                                          self.dropout_rate)
        self.layers = [StreamingConformerLayer(
            self.attention_heads, self.output_size, self.linear_units,
            self.cnn_kernel, self.dropout_rate, name=f"layer{i}")
            for i in range(self.num_blocks)]
        self.after_norm = nn.LayerNorm()

    def __call__(self, xs, ilens, *, deterministic=True,
                 return_intermediates=False):
        """Training path: full utterance, chunked-causal mask."""
        if self.embed is not None:
            xs, olens = self.embed(xs, ilens, deterministic=deterministic)
        else:
            xs, olens = self.embed_lin(xs), ilens
        xs = self.pos_enc(xs, deterministic=deterministic)
        T = xs.shape[1]
        valid = make_non_pad_mask(olens, T)
        mask = (chunk_attention_mask(T, self.chunk_size, self.left_chunks)
                [None] & valid[:, None, :])
        for layer in self.layers:
            xs = layer(xs, mask, valid, deterministic=deterministic)
        xs = self.after_norm(xs)
        if return_intermediates:
            return xs, olens, []
        return xs, olens

    # -- streaming step API -----------------------------------------
    def init_stream_state(self, batch: int, dtype=jnp.float32
                          ) -> StreamingState:
        L_ctx = self.chunk_size * self.left_chunks
        return StreamingState(
            ctx=jnp.zeros((self.num_blocks, batch, L_ctx, self.output_size),
                          dtype),
            conv_tail=jnp.zeros((self.num_blocks, batch,
                                 self.cnn_kernel - 1, self.output_size),
                                dtype),
            frame_offset=jnp.zeros((batch,), jnp.int32))

    def stream_step(self, feats_chunk, state: StreamingState):
        """feats_chunk: (B, chunk_feat_frames, F) pre-subsampling features
        for exactly one chunk; returns (enc_chunk, new_state)."""
        B = feats_chunk.shape[0]
        if self.embed is not None:
            xs, _ = self.embed(feats_chunk,
                               jnp.full((B,), feats_chunk.shape[1]),
                               deterministic=True)
        else:
            xs = self.embed_lin(feats_chunk)
        # positional encoding continuing from frame_offset
        from espnet_tpu.nn.embedding import sinusoidal_table
        d = self.output_size
        pe = jnp.asarray(sinusoidal_table(8192, d))
        T = xs.shape[1]
        # per-row offsets (session pools run rows at different positions)
        off = jnp.broadcast_to(jnp.asarray(state.frame_offset), (B,))
        pos = pe[off[:, None] + jnp.arange(T)]        # (B, T, d)
        xs = xs * jnp.sqrt(jnp.asarray(d, xs.dtype)) + pos
        new_ctx, new_tail = [], []
        L_ctx = self.chunk_size * self.left_chunks
        # context slots fill right-to-left; first min(offset, L_ctx) of the
        # tail are valid
        n_valid = jnp.minimum(off, L_ctx)             # (B,)
        kv_mask = jnp.concatenate(
            [jnp.arange(L_ctx)[None, :] >= (L_ctx - n_valid)[:, None],
             jnp.ones((B, T), bool)], axis=1)
        for i, layer in enumerate(self.layers):
            xs, ctx_entry, tail = layer.step(xs, state.ctx[i],
                                             state.conv_tail[i], kv_mask)
            rolled = jnp.concatenate([state.ctx[i], ctx_entry], axis=1)
            new_ctx.append(rolled[:, -L_ctx:])
            new_tail.append(tail)
        xs = self.after_norm(xs)
        return xs, StreamingState(
            ctx=jnp.stack(new_ctx), conv_tail=jnp.stack(new_tail),
            frame_offset=off + T)
