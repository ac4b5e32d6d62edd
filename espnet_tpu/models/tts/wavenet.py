"""Autoregressive WaveNet vocoder (mu-law categorical).

Behavioral contract: espnet2/gan_tts/wavenet/wavenet.py (dilated gated
residual stack with local conditioning; kernel-2 causal convs) used as a
standalone AR vocoder: teacher-forced categorical training on mu-law
targets, sample-by-sample generation. TPU-first design:

- Training is fully parallel: one pass over the whole utterance, every
  conv a batched matmul (kernel-2 causal conv == two shifted 1x1
  matmuls riding the MXU).
- Generation is a single `lax.scan` over samples with fast-WaveNet ring
  buffers (Paine et al. 2016): each layer keeps a (dilation,)-deep
  queue of its input activations, so one step costs O(layers) small
  matmuls, not a full receptive-field re-run — the scan stays entirely
  on device (no per-sample host dispatch).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def mu_law_encode(x: jnp.ndarray, channels: int = 256) -> jnp.ndarray:
    """float wav in [-1, 1] -> int ids in [0, channels)."""
    mu = channels - 1.0
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return jnp.clip(((y + 1.0) / 2.0 * mu + 0.5), 0, mu).astype(jnp.int32)


def mu_law_decode(ids: jnp.ndarray, channels: int = 256) -> jnp.ndarray:
    mu = channels - 1.0
    y = 2.0 * ids.astype(jnp.float32) / mu - 1.0
    return jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu


class WaveNetVocoder(nn.Module):
    """AR WaveNet: p(x_t | x_<t, mel)."""

    quantize: int = 256
    layers: int = 20
    stacks: int = 2
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80        # mel bins
    hop_length: int = 256         # upsampling factor for conditioning

    def dilations(self):
        per = self.layers // self.stacks
        return [2 ** (i % per) for i in range(self.layers)]

    @property
    def receptive_field(self) -> int:
        return sum(self.dilations()) + 1

    def setup(self):
        q = self.quantize
        self.embed = nn.Embed(q, self.residual_channels)
        self.conv_prev = [nn.Dense(self.gate_channels, name=f"prev{i}")
                          for i in range(self.layers)]
        self.conv_cur = [nn.Dense(self.gate_channels, use_bias=False,
                                  name=f"cur{i}")
                         for i in range(self.layers)]
        self.conv_aux = [nn.Dense(self.gate_channels, use_bias=False,
                                  name=f"aux{i}")
                         for i in range(self.layers)]
        self.conv_res = [nn.Dense(self.residual_channels, name=f"res{i}")
                         for i in range(self.layers)]
        self.conv_skip = [nn.Dense(self.skip_channels, name=f"skip{i}")
                          for i in range(self.layers)]
        self.out1 = nn.Dense(self.skip_channels)
        self.out2 = nn.Dense(q)

    def _upsample_cond(self, mel, T):
        """(B, Tm, n_mels) -> (B, T, aux) by repeat (nearest)."""
        c = jnp.repeat(mel, self.hop_length, axis=1)
        if c.shape[1] < T:
            c = jnp.pad(c, ((0, 0), (0, T - c.shape[1]), (0, 0)),
                        mode="edge")
        return c[:, :T]

    def _gate(self, i, h_prev, h_cur, c):
        z = (self.conv_prev[i](h_prev) + self.conv_cur[i](h_cur)
             + self.conv_aux[i](c))
        a, b = jnp.split(z, 2, axis=-1)
        return jnp.tanh(a) * nn.sigmoid(b)

    def __call__(self, wav, mel, *, deterministic=True):
        """Teacher-forced training: wav (B, S) float, mel (B, S//hop, M)
        -> (loss, logits (B, S, Q))."""
        ids = mu_law_encode(wav, self.quantize)
        # inputs are the PREVIOUS samples (causal shift by one); the
        # t=0 input is silence (mu-law midpoint), matching generate()
        x = self.embed(jnp.pad(ids[:, :-1], ((0, 0), (1, 0)),
                               constant_values=self.quantize // 2))
        B, S, _ = x.shape
        cond = self._upsample_cond(mel, S)
        skips = 0.0
        h = x
        for i, d in enumerate(self.dilations()):
            # kernel-2 dilated causal conv == h[t-d] branch + h[t] branch
            h_prev = jnp.pad(h, ((0, 0), (d, 0), (0, 0)))[:, :S]
            z = self._gate(i, h_prev, h, cond)
            skips = skips + self.conv_skip[i](z)
            h = h + self.conv_res[i](z)
        out = nn.relu(skips)
        out = nn.relu(self.out1(out))
        logits = self.out2(out)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, ids[:, :, None], axis=-1)[..., 0]
        return jnp.mean(nll), logits

    def generate(self, mel, teacher_ids=None):
        """AR generation: mel (B, Tm, M) -> wav (B, Tm*hop) in one
        on-device scan (argmax sampling).

        teacher_ids (B, S): replay mode — the next input is the ground
        truth instead of the sample; returns (wav, logits (B, S, Q)) for
        parity-testing the ring buffers against the parallel forward."""
        B, Tm, _ = mel.shape
        S = Tm * self.hop_length if teacher_ids is None \
            else teacher_ids.shape[1]
        cond = self._upsample_cond(mel, S)          # (B, S, M)
        dil = self.dilations()
        R = self.residual_channels
        # ring buffer per layer: (B, d, R) of past inputs to that layer
        bufs = [jnp.zeros((B, d, R)) for d in dil]
        x0 = self.embed(jnp.full((B,), self.quantize // 2, jnp.int32))

        def step(carry, t):
            x, bufs = carry
            c = jax.lax.dynamic_slice_in_dim(cond, t, 1, axis=1)[:, 0]
            h = x
            new_bufs = []
            skips = 0.0
            for i, d in enumerate(dil):
                pos = jnp.mod(t, d)
                h_prev = jax.lax.dynamic_slice_in_dim(
                    bufs[i], pos, 1, axis=1)[:, 0]
                nb = jax.lax.dynamic_update_slice_in_dim(
                    bufs[i], h[:, None], pos, axis=1)
                new_bufs.append(nb)
                z = self._gate(i, h_prev, h, c)
                skips = skips + self.conv_skip[i](z)
                h = h + self.conv_res[i](z)
            out = nn.relu(skips)
            logits = self.out2(nn.relu(self.out1(out)))
            ids = jnp.argmax(logits, -1)
            if teacher_ids is not None:
                nxt = jax.lax.dynamic_slice_in_dim(
                    teacher_ids, t, 1, axis=1)[:, 0]
            else:
                nxt = ids
            x_next = self.embed(nxt)
            return (x_next, new_bufs), (ids, logits)

        (_, _), (ids, logits) = jax.lax.scan(step, (x0, bufs),
                                             jnp.arange(S))
        wav = mu_law_decode(ids.T, self.quantize)    # (B, S)
        if teacher_ids is not None:
            return wav, logits.transpose(1, 0, 2)
        return wav
