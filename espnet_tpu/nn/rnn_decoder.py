"""RNN attention decoder (location-aware) for hybrid ASR.

Behavioral contract: espnet2/asr/decoder/rnn_decoder.py (RNNDecoder) —
per output step: attention context from the first-layer hidden state
(rnn_decoder.py:212), LSTM stack over [embedding, context]
(rnn_forward :155), output projection over [top hidden, context]
(context_residual, :242). Location-sensitive attention is the AttLoc of
legacy/nets/pytorch_backend/rnn/attentions.py.

TPU-first: teacher forcing is one `nn.scan` over output positions; the
beam-search scorer state is a FIXED-SIZE batch-first pytree (LSTM
carries + attention weights) so the whole search stays inside one
`lax.while_loop` with plain axis-0 gathers for beam reindexing.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.tacotron2 import LocationAttention
from espnet_tpu.utils.masks import make_non_pad_mask


class RNNDecoder(nn.Module):
    vocab_size: int
    encoder_output_size: int = 256
    hidden_size: int = 320
    num_layers: int = 1
    dropout_rate: float = 0.0
    att_dim: int = 128

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.hidden_size)
        self.cells = [nn.OptimizedLSTMCell(self.hidden_size,
                                           name=f"lstm{i}")
                      for i in range(self.num_layers)]
        self.att = LocationAttention(self.att_dim)
        self.output_layer = nn.Dense(self.vocab_size)
        self.drop = nn.Dropout(self.dropout_rate)

    def _zero_states(self, B, dtype=jnp.float32):
        z = jnp.zeros((B, self.num_layers, self.hidden_size), dtype)
        return z, z  # (c, h) stacked over layers, batch-first

    def _cell_step(self, carry, emb_t, memory, enc_proj, enc_mask, *,
                   deterministic=True):
        """One decode step. carry: (c (B,L,H), h (B,L,H), att_w (B,T))."""
        c, h, att_w = carry
        query = self.drop(h[:, 0], deterministic=deterministic)
        ctx, att_w = self.att(memory, enc_proj, query, att_w, enc_mask)
        x = jnp.concatenate([emb_t, ctx], axis=-1)
        cs, hs = [], []
        for i, cell in enumerate(self.cells):
            (ci, hi), out = cell((c[:, i], h[:, i]), x)
            cs.append(ci)
            hs.append(hi)
            x = self.drop(out, deterministic=deterministic)
        logits = self.output_layer(jnp.concatenate([x, ctx], axis=-1))
        return (jnp.stack(cs, 1), jnp.stack(hs, 1), att_w), logits

    def __call__(self, memory, memory_lens, ys_in, ys_in_lens, *,
                 deterministic=True):
        """Teacher-forced forward -> (B, L, V) logits."""
        B, T = memory.shape[:2]
        enc_mask = make_non_pad_mask(memory_lens, T)
        enc_proj = self.att.mlp_enc(memory)
        init_att = jnp.where(
            enc_mask, 1.0 / jnp.maximum(
                jnp.sum(enc_mask, 1, keepdims=True), 1), 0.0)
        emb = self.embed(ys_in)  # (B, L, H)
        c0, h0 = self._zero_states(B, memory.dtype)

        def step(mdl, carry, emb_t):
            return mdl._cell_step(carry, emb_t, memory, enc_proj, enc_mask,
                                  deterministic=deterministic)

        _, logits = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False,
                                                           "dropout": True},
            in_axes=1, out_axes=1)(self, (c0, h0, init_att), emb)
        return logits

    # ---- functional scorer protocol (beam search) ----

    def init_state(self, memory, memory_lens, batch: int, maxlen: int):
        """Fixed-size batch-first decode state (no KV cache needed).

        memory may arrive at utterance resolution (B dividing `batch` =
        B * beam rows); location-aware attention needs per-row memory,
        so it is expanded here — but the expanded copies are immutable
        and exempt from the per-step beam reorder (select_state)."""
        if memory.shape[0] != batch:
            n = batch // memory.shape[0]
            memory = jnp.repeat(memory, n, axis=0)
            memory_lens = jnp.repeat(memory_lens, n, axis=0)
        enc_mask = make_non_pad_mask(memory_lens, memory.shape[1])
        c0, h0 = self._zero_states(batch, memory.dtype)
        init_att = jnp.where(
            enc_mask, 1.0 / jnp.maximum(
                jnp.sum(enc_mask, 1, keepdims=True), 1), 0.0)
        return {"c": c0, "h": h0, "att_w": init_att,
                "memory": memory,
                "enc_proj": self.att.mlp_enc(memory),
                "enc_mask": enc_mask}

    @staticmethod
    def select_state(state, idx):
        """Beam reindex = one axis-0 gather of the MUTABLE leaves only.
        memory/enc_proj/enc_mask are per-utterance constants replicated
        across the beam block (beam reordering never crosses a block),
        so gathering them would be an expensive identity."""
        return dict(state, c=state["c"][idx], h=state["h"][idx],
                    att_w=state["att_w"][idx])

    def score_step(self, token, step, state, *, deterministic=True):
        emb = self.embed(token)  # (B, H)
        (c, h, att_w), logits = self._cell_step(
            (state["c"], state["h"], state["att_w"]), emb,
            state["memory"], state["enc_proj"], state["enc_mask"],
            deterministic=deterministic)
        new_state = dict(state, c=c, h=h, att_w=att_w)
        return jax.nn.log_softmax(logits, axis=-1), new_state
