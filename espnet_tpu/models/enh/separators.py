"""Enhancement separators: RNN TF-masking + TCN (Conv-TasNet).

Behavioral contract: espnet2/enh/separator/rnn_separator.py (BLSTM over
TF magnitude -> per-source sigmoid masks) and tcn_separator.py
(Conv-TasNet temporal conv network, Luo & Mesgarani 2019). The
encoder/separator/decoder triad matches espnet2/enh/espnet_model.py:28.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BLSTM(nn.Module):
    """Bidirectional LSTM layer via nn.RNN over both directions."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class RNNSeparator(nn.Module):
    """(B, T, F) magnitude/feature -> num_spk masks (B, T, F) in [0,1]."""

    input_dim: int
    num_spk: int = 2
    rnn_hidden: int = 128
    num_layers: int = 2
    nonlinear: str = "sigmoid"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        h = x
        for i in range(self.num_layers):
            h = BLSTM(self.rnn_hidden, name=f"blstm{i}")(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        masks = []
        for s in range(self.num_spk):
            m = nn.Dense(self.input_dim, name=f"mask{s}")(h)
            m = {"sigmoid": nn.sigmoid, "relu": nn.relu,
                 "tanh": nn.tanh}[self.nonlinear](m)
            masks.append(m)
        return masks


class TCNBlock(nn.Module):
    bottleneck: int
    hidden: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.hidden, (1,), name="conv1x1")(x)
        h = nn.PReLU()(h)
        h = nn.LayerNorm(name="norm1")(h)
        h = nn.Conv(self.hidden, (self.kernel,),
                    kernel_dilation=(self.dilation,),
                    feature_group_count=self.hidden, padding="SAME",
                    name="dconv")(h)
        h = nn.PReLU()(h)
        h = nn.LayerNorm(name="norm2")(h)
        h = nn.Conv(self.bottleneck, (1,), name="res_out")(h)
        return x + h


class TCNSeparator(nn.Module):
    """Conv-TasNet TCN (tcn_separator.py): stacked dilated conv blocks."""

    input_dim: int
    num_spk: int = 2
    layers: int = 4      # X: blocks per repeat
    stacks: int = 2      # R: repeats
    bottleneck_dim: int = 64
    hidden_dim: int = 128
    kernel: int = 3
    nonlinear: str = "relu"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        h = nn.LayerNorm(name="norm_in")(x)
        h = nn.Conv(self.bottleneck_dim, (1,), name="bottleneck")(h)
        for r in range(self.stacks):
            for i in range(self.layers):
                h = TCNBlock(self.bottleneck_dim, self.hidden_dim,
                             self.kernel, 2 ** i, name=f"tcn{r}_{i}")(h)
        h = nn.PReLU()(h)
        m = nn.Conv(self.num_spk * self.input_dim, (1,), name="mask_out")(h)
        B, T, _ = m.shape
        m = m.reshape(B, T, self.num_spk, self.input_dim)
        m = {"relu": nn.relu, "sigmoid": nn.sigmoid,
             "softmax": lambda z: jax.nn.softmax(z, axis=2)}[self.nonlinear](m)
        return [m[:, :, s] for s in range(self.num_spk)]


SEPARATORS = {"rnn": RNNSeparator, "tcn": TCNSeparator}


def _segment(x, K: int):
    """(B, T, F) -> (B, n_chunks, K, F) with 50% overlap (hop K//2),
    zero-padded; returns (chunks, T_padded)."""
    B, T, F = x.shape
    P = K // 2
    n = -(-max(T - K, 0) // P) + 1
    Tp = (n - 1) * P + K
    x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    idx = jnp.arange(K)[None, :] + P * jnp.arange(n)[:, None]  # (n, K)
    return x[:, idx], Tp


def _merge(chunks, T: int):
    """Inverse of _segment via overlap-add averaging -> (B, T, F)."""
    B, n, K, F = chunks.shape
    P = K // 2
    Tp = (n - 1) * P + K
    idx = (jnp.arange(K)[None, :] + P * jnp.arange(n)[:, None]).reshape(-1)
    out = jnp.zeros((B, Tp, F)).at[:, idx].add(
        chunks.reshape(B, n * K, F))
    wt = jnp.zeros((Tp,)).at[idx].add(1.0)
    return (out / jnp.maximum(wt, 1.0)[None, :, None])[:, :T]


class DPRNNSeparator(nn.Module):
    """Dual-path RNN (Luo et al. 2020; espnet2/enh/separator/
    dprnn_separator.py): alternating intra-chunk and inter-chunk BLSTMs
    over 50%-overlapped time segments -> per-source masks."""

    input_dim: int
    num_spk: int = 2
    num_blocks: int = 3
    chunk_size: int = 40
    hidden: int = 64
    bottleneck: int = 64
    nonlinear: str = "relu"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        B, T, F = x.shape
        h = nn.Dense(self.bottleneck, name="embed")(x)
        seg, _ = _segment(h, self.chunk_size)  # (B, n, K, D)
        Bn, n, K, D = seg.shape
        for blk in range(self.num_blocks):
            # intra-chunk (over K)
            intra = seg.reshape(B * n, K, D)
            intra = BLSTM(self.hidden, name=f"intra{blk}")(intra)
            intra = nn.Dense(D, name=f"intra_proj{blk}")(intra)
            seg = nn.LayerNorm(name=f"intra_norm{blk}")(
                seg + intra.reshape(B, n, K, D))
            # inter-chunk (over n)
            inter = seg.transpose(0, 2, 1, 3).reshape(B * K, n, D)
            inter = BLSTM(self.hidden, name=f"inter{blk}")(inter)
            inter = nn.Dense(D, name=f"inter_proj{blk}")(inter)
            seg = nn.LayerNorm(name=f"inter_norm{blk}")(
                seg + inter.reshape(B, K, n, D).transpose(0, 2, 1, 3))
        h = _merge(seg, T)  # (B, T, D)
        m = nn.Dense(self.num_spk * self.input_dim, name="mask_out")(
            nn.PReLU()(h))
        m = m.reshape(B, T, self.num_spk, self.input_dim)
        m = {"relu": nn.relu, "sigmoid": nn.sigmoid,
             "softmax": lambda z: jax.nn.softmax(z, axis=2)}[self.nonlinear](m)
        return [m[:, :, s] for s in range(self.num_spk)]


class TFGridNetSeparator(nn.Module):
    """TF-GridNet (Wang et al. 2023; espnet2/enh/separator/
    tfgridnet_separator.py): per block, a full-band intra-frame BLSTM
    (over frequency), a sub-band temporal BLSTM (over time), and a
    cross-frame self-attention path. Consumes the complex spectrum and
    emits complex source estimates directly (not masks)."""

    input_dim: int               # n_freq
    num_spk: int = 2
    num_blocks: int = 3
    emb_dim: int = 32
    hidden: int = 64
    attn_heads: int = 2

    complex_input = True
    output = "spectrum"

    @nn.compact
    def __call__(self, ri, *, deterministic=True):
        real, imag = ri
        B, T, F = real.shape
        x = jnp.stack([real, imag], axis=-1)       # (B, T, F, 2)
        h = nn.Dense(self.emb_dim, name="embed")(x)  # (B, T, F, D)
        D = self.emb_dim
        for blk in range(self.num_blocks):
            # intra-frame full-band (over F)
            z = nn.LayerNorm(name=f"fnorm{blk}")(h)
            z = z.reshape(B * T, F, D)
            z = BLSTM(self.hidden, name=f"freq_blstm{blk}")(z)
            z = nn.Dense(D, name=f"freq_proj{blk}")(z)
            h = h + z.reshape(B, T, F, D)
            # sub-band temporal (over T)
            z = nn.LayerNorm(name=f"tnorm{blk}")(h)
            z = z.transpose(0, 2, 1, 3).reshape(B * F, T, D)
            z = BLSTM(self.hidden, name=f"time_blstm{blk}")(z)
            z = nn.Dense(D, name=f"time_proj{blk}")(z)
            h = h + z.reshape(B, F, T, D).transpose(0, 2, 1, 3)
            # cross-frame self-attention over time (frame embedding =
            # mean over freq, broadcast back — the full-band attention
            # path of the paper at TPU-friendly cost)
            z = nn.LayerNorm(name=f"anorm{blk}")(h)
            frame = jnp.mean(z, axis=2)  # (B, T, D)
            att = nn.SelfAttention(num_heads=self.attn_heads,
                                   deterministic=True,
                                   name=f"attn{blk}")(frame)
            h = h + att[:, :, None, :]
        out = nn.Dense(2 * self.num_spk, name="deconv")(h)  # (B,T,F,2S)
        out = out.reshape(B, T, F, self.num_spk, 2)
        return [(out[..., s, 0], out[..., s, 1])
                for s in range(self.num_spk)]


class BSRNNSeparator(nn.Module):
    """Band-split RNN (Luo & Yu 2023; espnet2/enh/separator/
    bsrnn_separator.py): frequency bands embedded separately, then
    alternating BLSTMs over time and over bands; per-band complex mask
    decoder."""

    input_dim: int
    num_spk: int = 2
    num_bands: int = 8
    feature_dim: int = 32
    hidden: int = 64
    num_blocks: int = 3

    complex_input = True
    output = "complex_mask"

    @nn.compact
    def __call__(self, ri, *, deterministic=True):
        real, imag = ri
        B, T, F = real.shape
        # uniform band split (reference uses psychoacoustic widths; the
        # split is config in both cases)
        nb = self.num_bands
        Fp = -(-F // nb) * nb
        x = jnp.stack([real, imag], -1)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Fp - F), (0, 0)))
        W = Fp // nb
        x = x.reshape(B, T, nb, W * 2)
        h = nn.Dense(self.feature_dim, name="band_embed")(
            nn.LayerNorm(name="band_norm")(x))  # (B, T, nb, N)
        N = self.feature_dim
        for blk in range(self.num_blocks):
            z = nn.LayerNorm(name=f"tnorm{blk}")(h)
            z = z.transpose(0, 2, 1, 3).reshape(B * nb, T, N)
            z = BLSTM(self.hidden, name=f"time_blstm{blk}")(z)
            z = nn.Dense(N, name=f"time_proj{blk}")(z)
            h = h + z.reshape(B, nb, T, N).transpose(0, 2, 1, 3)
            z = nn.LayerNorm(name=f"bnorm{blk}")(h)
            z = z.reshape(B * T, nb, N)
            z = BLSTM(self.hidden, name=f"band_blstm{blk}")(z)
            z = nn.Dense(N, name=f"band_proj{blk}")(z)
            h = h + z.reshape(B, T, nb, N)
        # per-band complex mask MLP
        m = nn.Dense(4 * N, name="dec_hidden")(
            nn.LayerNorm(name="dec_norm")(h))
        m = nn.tanh(m)
        m = nn.Dense(self.num_spk * W * 2, name="dec_out")(m)
        m = m.reshape(B, T, nb, self.num_spk, W, 2)
        m = m.transpose(0, 1, 3, 2, 4, 5).reshape(B, T, self.num_spk,
                                                  Fp, 2)[:, :, :, :F]
        return [(m[:, :, s, :, 0], m[:, :, s, :, 1])
                for s in range(self.num_spk)]


SEPARATORS.update({"dprnn": DPRNNSeparator, "tfgridnet": TFGridNetSeparator,
                   "bsrnn": BSRNNSeparator})
