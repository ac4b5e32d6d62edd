"""RWKV and MEGA prediction networks for the transducer.

Behavioral contracts:
- RWKV: espnet2/asr_transducer/decoder/rwkv_decoder.py + modules/rwkv/
  (attention.py time-mix with the WKV recurrence — the CUDA kernel's
  role is espnet_tpu/ops/wkv.py — and feed_forward.py channel-mix,
  both with token-shift interpolation).
- MEGA: espnet2/asr_transducer/decoder/mega_decoder.py + modules/mega/
  (multi-dim damped EMA + single-head gated causal attention).

Both expose the transducer prediction-network protocol
(init_carry/step/__call__) so greedy/beam/mAES searches and the RNN-T
loss path work unchanged; step() == __call__() per-position is
parity-tested. All sequence ops are scans or causal attention with
static shapes.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.wkv import wkv, wkv_init_state, wkv_step


class RWKVTimeMix(nn.Module):
    dim: int

    def setup(self):
        D = self.dim
        init = nn.initializers.uniform(1.0)
        self.mu_k = self.param("mu_k", init, (D,))
        self.mu_v = self.param("mu_v", init, (D,))
        self.mu_r = self.param("mu_r", init, (D,))
        self.w_log = self.param("w_log", nn.initializers.zeros, (D,))
        self.u = self.param("u", nn.initializers.zeros, (D,))
        self.key = nn.Dense(D, use_bias=False)
        self.value = nn.Dense(D, use_bias=False)
        self.recept = nn.Dense(D, use_bias=False)
        self.out = nn.Dense(D, use_bias=False)

    def _krv(self, x, x_prev):
        k = self.key(x * self.mu_k + x_prev * (1 - self.mu_k))
        v = self.value(x * self.mu_v + x_prev * (1 - self.mu_v))
        r = jax.nn.sigmoid(
            self.recept(x * self.mu_r + x_prev * (1 - self.mu_r)))
        return k, v, r

    @property
    def decay(self):
        # kernel convention: w = -exp(w_log) < 0
        return -jnp.exp(self.w_log)

    def __call__(self, x):
        """x: (B, T, D) full-sequence (training)."""
        x_prev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        k, v, r = self._krv(x, x_prev)
        y = wkv(self.decay, self.u, k, v)
        return self.out(r * y)

    def step(self, x, state):
        """x: (B, D); state = (x_last, wkv_state)."""
        x_last, wstate = state
        k, v, r = self._krv(x, x_last)
        y, wstate = wkv_step(self.decay, self.u, k, v, wstate)
        return self.out(r * y), (x, wstate)


class RWKVChannelMix(nn.Module):
    dim: int
    hidden_ratio: int = 4

    def setup(self):
        D = self.dim
        init = nn.initializers.uniform(1.0)
        self.mu_k = self.param("mu_k", init, (D,))
        self.mu_r = self.param("mu_r", init, (D,))
        self.key = nn.Dense(D * self.hidden_ratio, use_bias=False)
        self.recept = nn.Dense(D, use_bias=False)
        self.value = nn.Dense(D, use_bias=False)

    def _core(self, x, x_prev):
        k = self.key(x * self.mu_k + x_prev * (1 - self.mu_k))
        r = jax.nn.sigmoid(
            self.recept(x * self.mu_r + x_prev * (1 - self.mu_r)))
        return r * self.value(jnp.square(nn.relu(k)))

    def __call__(self, x):
        x_prev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        return self._core(x, x_prev)

    def step(self, x, state):
        return self._core(x, state), x


class RWKVBlock(nn.Module):
    dim: int

    def setup(self):
        self.ln1 = nn.LayerNorm()
        self.ln2 = nn.LayerNorm()
        self.att = RWKVTimeMix(self.dim)
        self.ffn = RWKVChannelMix(self.dim)

    def __call__(self, x):
        x = x + self.att(self.ln1(x))
        return x + self.ffn(self.ln2(x))

    def step(self, x, state):
        att_state, ffn_state = state
        h, att_state = self.att.step(self.ln1(x), att_state)
        x = x + h
        h, ffn_state = self.ffn.step(self.ln2(x), ffn_state)
        return x + h, (att_state, ffn_state)


class RWKVDecoder(nn.Module):
    """RWKV prediction network (rwkv_decoder.py contract)."""

    vocab_size: int
    hidden_size: int = 256
    num_layers: int = 2
    dropout_rate: float = 0.0

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.hidden_size)
        self.ln_in = nn.LayerNorm()
        self.blocks = [RWKVBlock(self.hidden_size, name=f"block{i}")
                       for i in range(self.num_layers)]
        self.ln_out = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)

    @property
    def output_size(self):
        return self.hidden_size

    def init_carry(self, batch: int, dtype=jnp.float32):
        D = self.hidden_size
        return [((jnp.zeros((batch, D), dtype),
                  wkv_init_state(batch, D, dtype)),
                 jnp.zeros((batch, D), dtype))
                for _ in range(self.num_layers)]

    def step(self, carry, token):
        x = self.ln_in(self.embed(token))
        new_carry = []
        for blk, st in zip(self.blocks, carry):
            x, st = blk.step(x, st)
            new_carry.append(st)
        return self.ln_out(x), new_carry

    def __call__(self, labels_in, *, deterministic=True):
        x = self.ln_in(self.embed(labels_in))
        x = self.dropout(x, deterministic=deterministic)
        for blk in self.blocks:
            x = blk(x)
        return self.ln_out(x)


# ------------------------------------------------------------------ MEGA

class MultiDimEMA(nn.Module):
    """Multi-dimensional damped EMA (mega/multi_head_damped_ema.py):
    per channel, ndim parallel damped EMAs mixed back to the channel."""

    dim: int
    ndim: int = 4

    def setup(self):
        D, N = self.dim, self.ndim
        self.alpha_l = self.param("alpha", nn.initializers.normal(0.2),
                                  (D, N))
        self.delta_l = self.param("delta", nn.initializers.normal(0.2),
                                  (D, N))
        self.beta = self.param("beta", nn.initializers.normal(0.02),
                               (D, N))
        self.gamma = self.param("gamma", nn.initializers.normal(1.0),
                                (D, N))
        self.omega = self.param("omega", nn.initializers.zeros, (D,))

    def _coeffs(self):
        alpha = jax.nn.sigmoid(self.alpha_l)          # (D, N)
        delta = jax.nn.sigmoid(self.delta_l)
        q = 1.0 - alpha * delta                       # damping factor
        return alpha, q

    def __call__(self, x):
        """x: (B, T, D) -> (B, T, D); h_t = q*h_{t-1} + alpha*beta*x_t,
        y_t = sum_n gamma_n h_t + omega * x_t."""
        alpha, q = self._coeffs()

        def scan_step(h, xt):  # h: (B, D, N), xt: (B, D)
            h = h * q[None] + xt[:, :, None] * (alpha * self.beta)[None]
            y = jnp.einsum("bdn,dn->bd", h, self.gamma)
            return h, y

        B = x.shape[0]
        h0 = jnp.zeros((B, self.dim, self.ndim), x.dtype)
        _, ys = jax.lax.scan(scan_step, h0, x.transpose(1, 0, 2))
        return ys.transpose(1, 0, 2) + x * self.omega

    def init_state(self, batch, dtype=jnp.float32):
        return jnp.zeros((batch, self.dim, self.ndim), dtype)

    def step(self, x, h):
        alpha, q = self._coeffs()
        h = h * q[None] + x[:, :, None] * (alpha * self.beta)[None]
        y = jnp.einsum("bdn,dn->bd", h, self.gamma) + x * self.omega
        return y, h


class MEGABlock(nn.Module):
    """Moving-average-equipped gated attention (mega/mega.py), causal,
    single head, fixed max context for incremental decoding."""

    dim: int
    zdim: int = 64
    ndim: int = 4
    max_len: int = 512

    def setup(self):
        D = self.dim
        self.ln = nn.LayerNorm()
        self.ema = MultiDimEMA(D, self.ndim)
        self.z_proj = nn.Dense(self.zdim)
        self.q_scale = self.param("q_scale", nn.initializers.ones,
                                  (self.zdim,))
        self.q_bias = self.param("q_bias", nn.initializers.zeros,
                                 (self.zdim,))
        self.k_scale = self.param("k_scale", nn.initializers.ones,
                                  (self.zdim,))
        self.k_bias = self.param("k_bias", nn.initializers.zeros,
                                 (self.zdim,))
        self.v_proj = nn.Dense(D)
        self.gate_proj = nn.Dense(D)     # reset gate over attention out
        self.update_proj = nn.Dense(D)   # update gate (residual blend)
        self.h_proj = nn.Dense(D)

    def _qkv(self, xl, ema_out):
        z = nn.silu(self.z_proj(ema_out))
        q = z * self.q_scale + self.q_bias
        k = z * self.k_scale + self.k_bias
        v = nn.silu(self.v_proj(xl))
        return q, k, v

    def _merge(self, xl, x, attn_out):
        r = nn.silu(self.gate_proj(attn_out))
        u = jax.nn.sigmoid(self.update_proj(xl))
        h = nn.silu(self.h_proj(attn_out) * r)
        return u * h + (1.0 - u) * x

    def __call__(self, x):
        xl = self.ln(x)
        ema_out = self.ema(xl)
        q, k, v = self._qkv(xl, ema_out)
        T = x.shape[1]
        scores = jnp.einsum("btz,bsz->bts", q, k) / np.sqrt(self.zdim)
        causal = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(causal[None], scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bts,bsd->btd", attn, v)
        return self._merge(xl, x, out)

    def init_state(self, batch, dtype=jnp.float32):
        return {"ema": self.ema.init_state(batch, dtype),
                "k": jnp.zeros((batch, self.max_len, self.zdim), dtype),
                "v": jnp.zeros((batch, self.max_len, self.dim), dtype),
                # per-row position: beam/greedy searches advance rows
                # independently (conditional tree_map carry updates)
                "pos": jnp.zeros((batch,), jnp.int32)}

    def step(self, x, state):
        xl = self.ln(x[:, None])[:, 0]
        ema_out, ema_state = self.ema.step(xl, state["ema"])
        q, k, v = self._qkv(xl[:, None], ema_out[:, None])
        pos = state["pos"]
        upd = jax.vmap(
            lambda c, new, p: jax.lax.dynamic_update_slice(c, new, (p, 0)))
        kc = upd(state["k"], k, pos)
        vc = upd(state["v"], v, pos)
        scores = jnp.einsum("bz,bsz->bs", q[:, 0], kc) / np.sqrt(self.zdim)
        valid = jnp.arange(self.max_len)[None] <= pos[:, None]
        scores = jnp.where(valid, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bs,bsd->bd", attn, vc)
        y = self._merge(xl, x, out)
        return y, {"ema": ema_state, "k": kc, "v": vc, "pos": pos + 1}


class MEGADecoder(nn.Module):
    """MEGA prediction network (mega_decoder.py contract)."""

    vocab_size: int
    hidden_size: int = 256
    num_layers: int = 2
    zdim: int = 64
    ndim: int = 4
    max_len: int = 512
    dropout_rate: float = 0.0

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.hidden_size)
        self.blocks = [MEGABlock(self.hidden_size, self.zdim, self.ndim,
                                 self.max_len, name=f"block{i}")
                       for i in range(self.num_layers)]
        self.ln_out = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)

    @property
    def output_size(self):
        return self.hidden_size

    def init_carry(self, batch: int, dtype=jnp.float32):
        return [blk.init_state(batch, dtype) for blk in self.blocks]

    def step(self, carry, token):
        x = self.embed(token)
        new_carry = []
        for blk, st in zip(self.blocks, carry):
            x, st = blk.step(x, st)
            new_carry.append(st)
        return self.ln_out(x), new_carry

    def __call__(self, labels_in, *, deterministic=True):
        x = self.embed(labels_in)
        x = self.dropout(x, deterministic=deterministic)
        for blk in self.blocks:
            x = blk(x)
        return self.ln_out(x)
