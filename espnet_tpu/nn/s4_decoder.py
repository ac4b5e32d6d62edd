"""S4 (diagonal state-space) decoder for hybrid ASR.

Behavioral contract: espnet2/asr/decoder/s4_decoder.py (S4Decoder) — an
embed -> N x (SSM + cross-attention + FFN) -> output stack whose
self-interaction is a state-space recurrence instead of self-attention,
giving O(1) per-step decode state. The SSM is the S4D diagonal
parameterization (state_spaces/s4.py S4D-Lin init: A = -exp(log a) +
i*pi*n, ZOH discretization).

TPU-first: training-time recurrence is a `jax.lax.associative_scan`
(parallel prefix over the sequence, log-depth on device) that is
BIT-IDENTICAL to the single-step decode recurrence used by beam search —
no train/decode kernel mismatch. The beam-scorer state is batch-first
(complex SSM state per layer), so beam reindexing is one axis-0 gather.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.nn.decoder import DecoderMHA
from espnet_tpu.nn.transformer import PositionwiseFeedForward
from espnet_tpu.utils.masks import make_non_pad_mask


class S4DLayer(nn.Module):
    """Diagonal SSM (S4D): y = 2 Re(C x) + D u with ZOH discretization."""

    d_model: int
    d_state: int = 16
    dt_min: float = 1e-3
    dt_max: float = 1e-1

    def setup(self):
        H, N = self.d_model, self.d_state

        def init_log_dt(key, shape):
            u = jax.random.uniform(key, shape)
            return (math.log(self.dt_min)
                    + u * (math.log(self.dt_max) - math.log(self.dt_min)))

        self.log_dt = self.param("log_dt", init_log_dt, (H,))
        self.log_a_re = self.param(
            "log_a_re", lambda k, s: jnp.full(s, math.log(0.5)), (H, N))
        self.a_im = self.param(
            "a_im", lambda k, s: jnp.tile(
                math.pi * jnp.arange(N, dtype=jnp.float32), (H, 1)), (H, N))
        self.c_re = self.param("c_re", nn.initializers.normal(0.5), (H, N))
        self.c_im = self.param("c_im", nn.initializers.normal(0.5), (H, N))
        self.d = self.param("d", nn.initializers.ones, (H,))
        self.out = nn.Dense(self.d_model)

    def _discretize(self):
        dt = jnp.exp(self.log_dt)[:, None]                       # (H, 1)
        A = -jnp.exp(self.log_a_re) + 1j * self.a_im             # (H, N)
        Abar = jnp.exp(dt * A)
        Bbar = (Abar - 1.0) / A                                  # B == 1
        C = self.c_re + 1j * self.c_im
        return Abar, Bbar, C

    def _readout(self, x, u, C):
        y = 2.0 * jnp.real(jnp.einsum("...hn,hn->...h", x, C))
        y = y + self.d * u
        return self.out(nn.gelu(y))

    def __call__(self, u):
        """u: (B, L, H) -> (B, L, H); full-sequence parallel scan."""
        Abar, Bbar, C = self._discretize()
        Bu = Bbar[None, None] * u[..., None].astype(Abar.dtype)  # (B,L,H,N)
        A_seq = jnp.broadcast_to(Abar[None, None], Bu.shape)

        def combine(left, right):
            a1, b1 = left
            a2, b2 = right
            return a1 * a2, a2 * b1 + b2

        _, xs = jax.lax.associative_scan(combine, (A_seq, Bu), axis=1)
        return self._readout(xs, u, C)

    def step(self, u, x_prev):
        """u: (B, H); x_prev: (B, H, N) complex -> (y, x_new)."""
        Abar, Bbar, C = self._discretize()
        x = Abar[None] * x_prev + Bbar[None] * u[..., None].astype(
            x_prev.dtype)
        return self._readout(x, u, C), x

    def init_ssm_state(self, batch: int):
        return jnp.zeros((batch, self.d_model, self.d_state),
                         jnp.complex64)


class S4DecoderLayer(nn.Module):
    d_model: int
    attention_heads: int = 4
    linear_units: int = 2048
    d_state: int = 16
    dropout_rate: float = 0.1

    def setup(self):
        self.ssm = S4DLayer(self.d_model, self.d_state)
        self.src_attn = DecoderMHA(self.attention_heads, self.d_model)
        self.feed_forward = PositionwiseFeedForward(self.linear_units,
                                                    self.dropout_rate)
        self.norm1 = nn.LayerNorm()
        self.norm2 = nn.LayerNorm()
        self.norm3 = nn.LayerNorm()
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, memory, memory_mask, *, deterministic=True):
        x = x + self.drop(self.ssm(self.norm1(x)),
                          deterministic=deterministic)
        x = x + self.drop(
            self.src_attn(self.norm2(x), memory, memory, memory_mask,
                          deterministic=deterministic),
            deterministic=deterministic)
        x = x + self.drop(self.feed_forward(self.norm3(x),
                                            deterministic=deterministic),
                          deterministic=deterministic)
        return x

    def step(self, x, ssm_state, enc_k, enc_v, enc_mask, *,
             deterministic=True):
        """x: (B, 1, H); ssm_state: (B, H, N)."""
        h, new_state = self.ssm.step(self.norm1(x)[:, 0], ssm_state)
        x = x + h[:, None]
        x = x + self.src_attn.cross(self.norm2(x), enc_k, enc_v, enc_mask,
                                    deterministic=deterministic)
        x = x + self.feed_forward(self.norm3(x), deterministic=deterministic)
        return x, new_state


class S4Decoder(nn.Module):
    vocab_size: int
    encoder_output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 4
    d_state: int = 16
    dropout_rate: float = 0.1

    def setup(self):
        d = self.encoder_output_size
        self.embed = nn.Embed(self.vocab_size, d)
        self.layers = [
            S4DecoderLayer(d, self.attention_heads, self.linear_units,
                           self.d_state, self.dropout_rate,
                           name=f"layer{i}")
            for i in range(self.num_blocks)]
        self.after_norm = nn.LayerNorm()
        self.output_layer = nn.Dense(self.vocab_size)

    def __call__(self, memory, memory_lens, ys_in, ys_in_lens, *,
                 deterministic=True):
        mem_mask = make_non_pad_mask(memory_lens, memory.shape[1])[:, None, :]
        x = self.embed(ys_in)
        for layer in self.layers:
            x = layer(x, memory, mem_mask, deterministic=deterministic)
        return self.output_layer(self.after_norm(x))

    # ---- functional scorer protocol (beam search) ----

    def init_state(self, memory, memory_lens, batch: int, maxlen: int):
        """memory may arrive at utterance resolution (B dividing `batch`
        = B * beam rows): encoder K/V and mask stay at B — immutable
        during search, identical across a beam block — and the beam
        dimension folds into the cross-attention query (DecoderMHA.cross).
        """
        enc_mask = make_non_pad_mask(memory_lens, memory.shape[1])
        return {
            "ssm": jnp.stack([layer.ssm.init_ssm_state(batch)
                              for layer in self.layers], axis=1),
            "enc_k": jnp.stack([layer.src_attn.encode_kv(memory)[0]
                                for layer in self.layers], axis=1),
            "enc_v": jnp.stack([layer.src_attn.encode_kv(memory)[1]
                                for layer in self.layers], axis=1),
            "enc_mask": enc_mask,
        }

    @staticmethod
    def select_state(state, idx):
        """Only the recurrent SSM state moves on beam reorder; encoder
        K/V are per-utterance constants (see init_state)."""
        return dict(state, ssm=state["ssm"][idx])

    def score_step(self, token, step, state, *, deterministic=True):
        x = self.embed(token)[:, None]
        new_ssm = []
        for i, layer in enumerate(self.layers):
            x, s = layer.step(x, state["ssm"][:, i], state["enc_k"][:, i],
                              state["enc_v"][:, i], state["enc_mask"],
                              deterministic=deterministic)
            new_ssm.append(s)
        logits = self.output_layer(self.after_norm(x)[:, 0])
        new_state = dict(state, ssm=jnp.stack(new_ssm, axis=1))
        return jax.nn.log_softmax(logits, axis=-1), new_state
