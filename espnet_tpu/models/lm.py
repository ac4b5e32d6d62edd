"""Language models: Transformer LM + sequential RNN LM.

Behavioral contract: espnet2/lm/transformer_lm.py:12,
espnet2/lm/seq_rnn_lm.py:12 and the wrapper ESPnetLanguageModel
(espnet2/lm/espnet_model.py:13 — nll with sos/eos, loss = sum nll /
ntokens). Both expose the functional scorer protocol (init_carry /
score_step with fixed-shape state) so beam-search shallow fusion runs
inside the decode while_loop.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.nn.decoder import DecoderMHA
from espnet_tpu.nn.embedding import sinusoidal_table
from espnet_tpu.nn.transformer import PositionwiseFeedForward
from espnet_tpu.ops.losses import accuracy
from espnet_tpu.utils.masks import make_non_pad_mask, subsequent_mask


class CausalSelfAttnLayer(nn.Module):
    """Pre-norm causal self-attention + FF block with a cached single-step
    path (shares DecoderMHA so full and stepwise modes use one param set)."""

    head: int
    d_model: int
    units: int
    dropout_rate: float = 0.0

    def setup(self):
        self.self_attn = DecoderMHA(self.head, self.d_model)
        self.feed_forward = PositionwiseFeedForward(self.units,
                                                    self.dropout_rate)
        self.norm1 = nn.LayerNorm()
        self.norm2 = nn.LayerNorm()
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, mask, *, deterministic=True):
        residual = x
        h = self.norm1(x)
        x = residual + self.drop(self.self_attn(h, h, h, mask,
                                                deterministic=deterministic),
                                 deterministic=deterministic)
        residual = x
        h = self.norm2(x)
        return residual + self.drop(
            self.feed_forward(h, deterministic=deterministic),
            deterministic=deterministic)

    def step(self, x, cache_k, cache_v, step, kv_mask):
        residual = x
        h = self.norm1(x)
        sa, cache_k, cache_v = self.self_attn.step(h, cache_k, cache_v, step,
                                                   kv_mask)
        x = residual + sa
        residual = x
        h = self.norm2(x)
        return residual + self.feed_forward(h), cache_k, cache_v


class TransformerLM(nn.Module):
    vocab_size: int
    pos_enc: Optional[str] = "sinusoidal"
    embed_unit: int = 128
    att_unit: int = 256
    head: int = 2
    unit: int = 1024
    layer: int = 4
    dropout_rate: float = 0.5

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.embed_unit)
        self.input_proj = nn.Dense(self.att_unit)
        self.layers = [CausalSelfAttnLayer(
            self.head, self.att_unit, self.unit, self.dropout_rate,
            name=f"layer{i}") for i in range(self.layer)]
        self.after_norm = nn.LayerNorm()
        self.decoder = nn.Dense(self.vocab_size)
        self.dropout = nn.Dropout(self.dropout_rate)

    def _embed_pos(self, tok, pos):
        """tok: (B,) or (B, L); pos: scalar start position."""
        x = self.input_proj(self.embed(tok))
        d = self.att_unit
        pe = jnp.asarray(sinusoidal_table(2048, d))
        if x.ndim == 2:  # single step (B, D)
            p = jax.lax.dynamic_slice(pe, (pos, 0), (1, d))
            return x * jnp.sqrt(jnp.asarray(d, x.dtype)) + p.astype(x.dtype)
        L = x.shape[1]
        return x * jnp.sqrt(jnp.asarray(d, x.dtype)) + pe[None, :L].astype(
            x.dtype)

    def __call__(self, input_ids, lengths=None, *, deterministic=True):
        """(B, L) -> (B, L, V) logits with causal masking."""
        B, L = input_ids.shape
        x = self._embed_pos(input_ids, 0)
        x = self.dropout(x, deterministic=deterministic)
        mask = subsequent_mask(L)[None]
        if lengths is not None:
            mask = mask & make_non_pad_mask(lengths, L)[:, None, :]
        for layer in self.layers:
            x = layer(x, mask, deterministic=deterministic)
        x = self.after_norm(x)
        return self.decoder(x)

    # -- scorer protocol --------------------------------------------
    # NOTE: caches are BATCH-FIRST (batch, layers, H, maxlen, dk) so beam
    # reindexing is a uniform axis-0 gather across all LM types.
    def init_carry(self, batch: int, maxlen: int = 256, dtype=jnp.float32):
        dk = self.att_unit // self.head
        return {
            "cache_k": jnp.zeros((batch, self.layer, self.head, maxlen, dk),
                                 dtype),
            "cache_v": jnp.zeros((batch, self.layer, self.head, maxlen, dk),
                                 dtype),
        }

    def score_step(self, token, step, state):
        """token: (B,); returns (log_probs (B, V), new_state)."""
        B = token.shape[0]
        x = self._embed_pos(token, step)[:, None, :]  # (B,1,D)
        maxlen = state["cache_k"].shape[3]
        kv_mask = jnp.broadcast_to(jnp.arange(maxlen)[None, :] <= step,
                                   (B, maxlen))
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, ck, cv = layer.step(x, state["cache_k"][:, i],
                                   state["cache_v"][:, i], step, kv_mask)
            new_k.append(ck)
            new_v.append(cv)
        x = self.after_norm(x)
        logits = self.decoder(x[:, 0])
        return jax.nn.log_softmax(logits, axis=-1), {
            "cache_k": jnp.stack(new_k, axis=1),
            "cache_v": jnp.stack(new_v, axis=1)}

    def select_state(self, state, idx):
        return {"cache_k": state["cache_k"][idx],
                "cache_v": state["cache_v"][idx]}


class SequentialRNNLM(nn.Module):
    """LSTM/GRU LM (espnet2/lm/seq_rnn_lm.py:12).

    The recurrent carry is the scorer state — naturally fixed-shape.
    """

    vocab_size: int
    unit: int = 650
    nlayers: int = 2
    rnn_type: str = "lstm"
    dropout_rate: float = 0.0
    tie_weights: bool = False

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.unit)
        if self.rnn_type == "lstm":
            self.cells = [nn.OptimizedLSTMCell(self.unit, name=f"rnn{i}")
                          for i in range(self.nlayers)]
        else:
            self.cells = [nn.GRUCell(self.unit, name=f"rnn{i}")
                          for i in range(self.nlayers)]
        self.decoder = nn.Dense(self.vocab_size)
        self.dropout = nn.Dropout(self.dropout_rate)

    def init_carry(self, batch: int, maxlen: int = 0, dtype=jnp.float32):
        if self.rnn_type == "lstm":
            return [(jnp.zeros((batch, self.unit), dtype),
                     jnp.zeros((batch, self.unit), dtype))
                    for _ in range(self.nlayers)]
        return [jnp.zeros((batch, self.unit), dtype)
                for _ in range(self.nlayers)]

    def _step(self, carry, x):
        new_carry = []
        h = x
        for cell, c in zip(self.cells, carry):
            c2, h = cell(c, h)
            new_carry.append(c2)
        return new_carry, h

    def __call__(self, input_ids, lengths=None, *, deterministic=True):
        """(B, L) -> (B, L, V) logits."""
        B, L = input_ids.shape
        emb = self.embed(input_ids)
        emb = self.dropout(emb, deterministic=deterministic)
        carry = self.init_carry(B, dtype=emb.dtype)
        outs = []
        for t in range(L):  # L is static; XLA pipelines the unrolled loop
            carry, h = self._step(carry, emb[:, t])
            outs.append(h)
        out = jnp.stack(outs, axis=1)
        return self.decoder(out)

    def score_step(self, token, step, state):
        emb = self.embed(token)
        state, h = self._step(state, emb)
        return jax.nn.log_softmax(self.decoder(h), axis=-1), state

    def select_state(self, state, idx):
        return jax.tree_util.tree_map(lambda t: t[idx], state)


class HuggingFaceLM(nn.Module):
    """HF flax causal LM as an espnet LM (espnet2/lm/
    huggingface_pretrained_opt_lm.py role): the HF module (GPT-2 family
    here — flax OPT is not shipped) nests in this param tree and
    conforms to the same scorer protocol. Offline environment: built
    from architecture kwargs (`hf_config`) with random init, or a LOCAL
    pretrained directory. Scoring re-runs the prefix each step (the
    reference wrapper's batch_score does the same)."""

    vocab_size: int
    model_name_or_path: str = ""
    hf_config: dict = None

    def setup(self):
        from transformers import AutoConfig, GPT2Config
        from transformers.models.gpt2.modeling_flax_gpt2 import \
            FlaxGPT2LMHeadModule
        if self.model_name_or_path:
            try:
                config = AutoConfig.from_pretrained(
                    self.model_name_or_path, local_files_only=True)
            except Exception as e:
                raise RuntimeError(
                    f"could not load a local HF config from "
                    f"{self.model_name_or_path!r} (offline environment; "
                    f"pass hf_config architecture kwargs instead)") from e
        else:
            conf = dict(self.hf_config or {})
            conf.setdefault("vocab_size", self.vocab_size)
            conf.setdefault("n_embd", 128)
            conf.setdefault("n_layer", 2)
            conf.setdefault("n_head", 4)
            conf.setdefault("n_positions", 1024)
            config = GPT2Config(**conf)
        if config.vocab_size < self.vocab_size:
            raise ValueError(
                f"HF LM vocab ({config.vocab_size}) smaller than task "
                f"vocab ({self.vocab_size})")
        self.hf_lm = FlaxGPT2LMHeadModule(config, name="hf_lm")

    def __call__(self, input_ids, lengths=None, *, deterministic=True):
        B, L = input_ids.shape
        if lengths is not None:
            attn = (jnp.arange(L)[None] < lengths[:, None])
        else:
            attn = jnp.ones((B, L), bool)
        pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        out = self.hf_lm(input_ids, attn.astype(jnp.int32), pos,
                         deterministic=deterministic)
        return out.logits[..., :self.vocab_size]

    def init_carry(self, batch: int, maxlen: int = 256,
                   dtype=jnp.float32):
        return {"ys": jnp.zeros((batch, maxlen), jnp.int32)}

    def score_step(self, token, step, state):
        ys = jax.vmap(
            lambda row, t: jax.lax.dynamic_update_index_in_dim(
                row, t, step, axis=0))(state["ys"],
                                       token.astype(jnp.int32))
        B, maxlen = ys.shape
        attn = jnp.broadcast_to(jnp.arange(maxlen)[None] <= step,
                                (B, maxlen))
        pos = jnp.broadcast_to(jnp.arange(maxlen)[None], (B, maxlen))
        out = self.hf_lm(ys, attn.astype(jnp.int32), pos,
                         deterministic=True)
        cur = jax.lax.dynamic_slice_in_dim(
            out.logits, step, 1, axis=1)[:, 0, :self.vocab_size]
        return jax.nn.log_softmax(cur, axis=-1), {"ys": ys}

    def select_state(self, state, idx):
        return {"ys": state["ys"][idx]}


class LanguageModel(nn.Module):
    """ESPnetLanguageModel wrapper: (text, lengths) -> (loss, stats, w).

    nll: input [sos, y...], target [y..., eos]
    (espnet2/lm/espnet_model.py:40-90).
    """

    vocab_size: int
    lm_type: str = "transformer"
    lm_conf: dict = None
    ignore_id: int = 0  # padding id in text tensors

    def setup(self):
        conf = dict(self.lm_conf or {})
        if self.lm_type == "transformer":
            self.lm = TransformerLM(self.vocab_size, **conf)
        elif self.lm_type == "seq_rnn":
            self.lm = SequentialRNNLM(self.vocab_size, **conf)
        elif self.lm_type == "hugging_face":
            self.lm = HuggingFaceLM(self.vocab_size, **conf)
        else:
            raise ValueError(self.lm_type)

    @property
    def sos_eos(self):
        return self.vocab_size - 1

    def nll(self, text, text_lengths, *, deterministic=True):
        B, U = text.shape
        sos = jnp.full((B, 1), self.sos_eos, text.dtype)
        valid = make_non_pad_mask(text_lengths, U)
        x = jnp.concatenate([sos, jnp.where(valid, text, 0)], axis=1)
        pos = jnp.arange(U + 1)[None, :]
        y_ext = jnp.concatenate([text, jnp.zeros((B, 1), text.dtype)], axis=1)
        t = jnp.where(pos < text_lengths[:, None], y_ext,
                      jnp.where(pos == text_lengths[:, None], self.sos_eos, 0))
        t_valid = pos <= text_lengths[:, None]
        logits = self.lm(x, text_lengths + 1, deterministic=deterministic)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
        nll = jnp.where(t_valid, nll, 0.0)
        return nll, t_valid, logits, t

    def __call__(self, text, text_lengths, *, deterministic=True):
        nll, t_valid, logits, targets = self.nll(
            text, text_lengths, deterministic=deterministic)
        ntokens = jnp.maximum(jnp.sum(t_valid), 1)
        loss = jnp.sum(nll) / ntokens
        stats = {"loss": loss, "ppl": jnp.exp(loss),
                 "acc": accuracy(logits, jnp.where(t_valid, targets, -1), -1)}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    # scorer protocol delegation (shallow fusion)
    def init_carry(self, batch: int, maxlen: int = 256):
        return self.lm.init_carry(batch, maxlen)

    def score_step(self, token, step, state):
        return self.lm.score_step(token, step, state)

    def select_state(self, state, idx):
        return self.lm.select_state(state, idx)
