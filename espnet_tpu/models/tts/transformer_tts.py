"""Transformer-TTS (AR mel prediction) + Global Style Tokens.

Behavioral contract: espnet2/tts/transformer/transformer.py
(Transformer TTS — encoder-decoder transformer, mel prenet, stop token,
guided-attention-free L1+MSE+BCE loss as in tacotron) and
espnet2/tts/gst/style_encoder.py (StyleEncoder: reference conv stack +
GRU -> multi-head attention over learned style tokens).

TPU-first: teacher forcing runs the decoder stack once over the full
frame sequence with a causal mask (one fused program); AR inference is a
single `lax.scan` over the fixed-size KV caches of the shared
TransformerDecoderLayer.step path — the same cached-decode machinery the
ASR beam search uses (nn/decoder.py), driven by continuous frame
embeddings instead of token embeddings.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.tacotron2 import tacotron_loss
from espnet_tpu.nn.decoder import TransformerDecoderLayer
from espnet_tpu.nn.embedding import PositionalEncoding, sinusoidal_table
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.models.tts.fastspeech2 import Postnet
from espnet_tpu.utils.masks import make_non_pad_mask, subsequent_mask


class StyleEncoder(nn.Module):
    """GST: reference mel -> conv stack -> GRU -> attention over learned
    style tokens -> style embedding (style_encoder.py:25)."""

    gst_tokens: int = 10
    gst_heads: int = 4
    d_model: int = 256
    conv_chans: tuple = (32, 32, 64, 64)

    @nn.compact
    def __call__(self, feats, feats_lengths):
        h = feats[..., None]                       # (B, T, M, 1)
        for i, ch in enumerate(self.conv_chans):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"conv{i}")(h)
            h = nn.relu(h)
        B, T, M, C = h.shape
        h = h.reshape(B, T, M * C)
        h = nn.RNN(nn.GRUCell(self.d_model))(h)
        # ref embedding = final GRU step at the downsampled valid length
        ds_len = jnp.maximum(feats_lengths // (2 ** len(self.conv_chans)), 1)
        idx = jnp.clip(ds_len - 1, 0, T - 1)
        ref = jnp.take_along_axis(h, idx[:, None, None].repeat(
            h.shape[-1], axis=2), axis=1)[:, 0]    # (B, D)
        tokens = self.param("style_tokens", nn.initializers.normal(0.5),
                            (self.gst_tokens, self.d_model))
        Hh = self.gst_heads
        dk = self.d_model // Hh
        q = nn.Dense(self.d_model, name="q")(ref).reshape(B, Hh, dk)
        k = nn.Dense(self.d_model, name="k")(jnp.tanh(tokens)).reshape(
            self.gst_tokens, Hh, dk)
        v = nn.Dense(self.d_model, name="v")(jnp.tanh(tokens)).reshape(
            self.gst_tokens, Hh, dk)
        att = jax.nn.softmax(
            jnp.einsum("bhd,thd->bht", q, k) / jnp.sqrt(float(dk)), axis=-1)
        style = jnp.einsum("bht,thd->bhd", att, v).reshape(B, self.d_model)
        return style


class TransformerTTS(nn.Module):
    """Encoder-decoder transformer predicting mel frames AR."""

    idim: int
    odim: int = 80
    d_model: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    encoder_blocks: int = 3
    decoder_blocks: int = 3
    prenet_units: int = 128
    postnet_layers: int = 3
    postnet_chans: int = 256
    dropout_rate: float = 0.1
    use_gst: bool = False
    gst_tokens: int = 10
    gst_heads: int = 4
    max_frames: int = 500

    def setup(self):
        self.encoder = TransformerEncoder(
            input_size=self.idim, output_size=self.d_model,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units, num_blocks=self.encoder_blocks,
            input_layer="embed", dropout_rate=self.dropout_rate)
        self.prenet1 = nn.Dense(self.prenet_units)
        self.prenet2 = nn.Dense(self.d_model)
        self.prenet_drop = nn.Dropout(0.5)
        self.pos_enc = PositionalEncoding(self.d_model, self.dropout_rate)
        self.layers = [
            TransformerDecoderLayer(self.attention_heads, self.d_model,
                                    self.linear_units, self.dropout_rate,
                                    name=f"layer{i}")
            for i in range(self.decoder_blocks)]
        self.after_norm = nn.LayerNorm()
        self.feat_out = nn.Dense(self.odim)
        self.prob_out = nn.Dense(1)
        self.postnet = Postnet(self.odim, self.postnet_layers,
                               self.postnet_chans,
                               dropout_rate=self.dropout_rate)
        if self.use_gst:
            self.gst = StyleEncoder(self.gst_tokens, self.gst_heads,
                                    self.d_model)

    def encode(self, text, text_lengths, *, deterministic=True,
               style: Optional[jnp.ndarray] = None):
        enc, enc_lens = self.encoder(text, text_lengths,
                                     deterministic=deterministic)
        if style is not None:
            enc = enc + style[:, None, :]
        return enc, enc_lens

    def _prenet(self, frames, deterministic):
        h = nn.relu(self.prenet1(frames))
        h = self.prenet_drop(h, deterministic=deterministic)
        return self.prenet2(h)

    def __call__(self, text, text_lengths, feats, feats_lengths, *,
                 deterministic=True):
        B, T_out, _ = feats.shape
        style = None
        if self.use_gst:
            style = self.gst(feats, feats_lengths)
        enc, enc_lens = self.encode(text, text_lengths,
                                    deterministic=deterministic,
                                    style=style)
        mem_mask = make_non_pad_mask(enc_lens, enc.shape[1])[:, None, :]
        frames_in = jnp.concatenate(
            [jnp.zeros((B, 1, self.odim)), feats[:, :-1]], axis=1)
        x = self.pos_enc(self._prenet(frames_in, deterministic),
                         deterministic=deterministic)
        tgt_mask = (make_non_pad_mask(feats_lengths, T_out)[:, None, :]
                    & subsequent_mask(T_out)[None])
        for layer in self.layers:
            x = layer(x, tgt_mask, enc, mem_mask,
                      deterministic=deterministic)
        x = self.after_norm(x)
        before = self.feat_out(x)
        stops = self.prob_out(x)[..., 0]
        after = before + self.postnet(before, deterministic=deterministic)
        loss, stats = tacotron_loss(before, after, stops, feats,
                                    feats_lengths)
        return loss, stats, jnp.asarray(B, jnp.float32)

    def inference(self, text, text_lengths, *, threshold: float = 0.5,
                  max_frames: Optional[int] = None,
                  style: Optional[jnp.ndarray] = None):
        """AR mel generation through the cached decoder-step path."""
        max_frames = max_frames or self.max_frames
        B = text.shape[0]
        enc, enc_lens = self.encode(text, text_lengths, deterministic=True,
                                    style=style)
        enc_mask = make_non_pad_mask(enc_lens, enc.shape[1])
        dk = self.d_model // self.attention_heads
        cache_k = jnp.zeros((self.decoder_blocks, B, self.attention_heads,
                             max_frames, dk), enc.dtype)
        cache_v = jnp.zeros_like(cache_k)
        enc_k = jnp.stack([layer.src_attn.encode_kv(enc)[0]
                           for layer in self.layers])
        enc_v = jnp.stack([layer.src_attn.encode_kv(enc)[1]
                           for layer in self.layers])
        pe = jnp.asarray(sinusoidal_table(max_frames + 1, self.d_model))

        def step(mdl, carry, t):
            cache_k, cache_v, frame_prev, stopped = carry
            x = mdl._prenet(frame_prev[:, None], True)
            x = x * jnp.sqrt(jnp.asarray(mdl.d_model, x.dtype)) \
                + jax.lax.dynamic_slice(pe, (t, 0),
                                        (1, mdl.d_model))[None]
            pos_mask = jnp.broadcast_to(
                jnp.arange(max_frames)[None, :] <= t, (B, max_frames))
            new_k, new_v = [], []
            for i, layer in enumerate(mdl.layers):
                x, ck, cv = layer.step(x, cache_k[i], cache_v[i], t,
                                       pos_mask, enc_k[i], enc_v[i],
                                       enc_mask)
                new_k.append(ck)
                new_v.append(cv)
            x = mdl.after_norm(x)
            frame = mdl.feat_out(x)[:, 0]
            stop_p = jax.nn.sigmoid(mdl.prob_out(x)[:, 0, 0])
            stopped = stopped | (stop_p > threshold)
            return ((jnp.stack(new_k), jnp.stack(new_v), frame, stopped),
                    (frame, stopped))

        carry0 = (cache_k, cache_v, jnp.zeros((B, self.odim)),
                  jnp.zeros((B,), bool))
        _, (frames, stopped_seq) = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False},
            in_axes=0, out_axes=0)(self, carry0, jnp.arange(max_frames))
        mel = frames.transpose(1, 0, 2)
        mel = mel + self.postnet(mel, deterministic=True)
        olens = jnp.maximum(
            jnp.sum(~stopped_seq.T, axis=1).astype(jnp.int32), 1)
        return mel, olens
