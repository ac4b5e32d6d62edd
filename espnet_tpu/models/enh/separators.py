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
from espnet_tpu.nn.convolution import DepthwiseConv1d
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
        h = DepthwiseConv1d(self.hidden, self.kernel,
                            kernel_dilation=self.dilation,
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
    attn_qk_dim: int = 4         # E: per-head Q/K channels (paper E=4)

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
            # full-band per-frame self-attention over time (paper §II-C /
            # tfgridnet_separator.py:260 attention path): per head, 1x1
            # projections to E (Q,K) and D//H (V) channels, PReLU +
            # LayerNorm over (F, channel), then the WHOLE frequency axis
            # is flattened into the frame vector (F*E), so attention
            # keys carry full-band structure — not a pooled summary.
            z = nn.LayerNorm(name=f"anorm{blk}")(h)
            E = self.attn_qk_dim
            Hh = self.attn_heads
            Dv = D // Hh
            heads = []
            for ii in range(Hh):
                q = nn.LayerNorm(reduction_axes=(-2, -1),
                                 name=f"attnQn{blk}_{ii}")(
                    nn.PReLU()(nn.Dense(E, name=f"attnQ{blk}_{ii}")(z)))
                k = nn.LayerNorm(reduction_axes=(-2, -1),
                                 name=f"attnKn{blk}_{ii}")(
                    nn.PReLU()(nn.Dense(E, name=f"attnK{blk}_{ii}")(z)))
                v = nn.LayerNorm(reduction_axes=(-2, -1),
                                 name=f"attnVn{blk}_{ii}")(
                    nn.PReLU()(nn.Dense(Dv, name=f"attnV{blk}_{ii}")(z)))
                qf = q.reshape(B, T, F * E)
                kf = k.reshape(B, T, F * E)
                vf = v.reshape(B, T, F * Dv)
                att = jax.nn.softmax(
                    jnp.einsum("btd,bsd->bts", qf, kf)
                    / jnp.sqrt(jnp.asarray(F * E, qf.dtype)), axis=-1)
                heads.append(jnp.einsum("bts,bsd->btd", att, vf)
                             .reshape(B, T, F, Dv))
            cat = jnp.concatenate(heads, axis=-1)        # (B, T, F, D)
            proj = nn.LayerNorm(reduction_axes=(-2, -1),
                                name=f"attnOn{blk}")(
                nn.PReLU()(nn.Dense(D, name=f"attnO{blk}")(cat)))
            h = h + proj
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


class _ImprovedTransformerLayer(nn.Module):
    """DPTNet's 'improved transformer' (Chen et al. 2020;
    espnet2/enh/layers/dptnet.py): MHA + an RNN-based position-wise FF
    (LSTM -> Dense) replacing the plain MLP, both pre-norm residual."""

    heads: int
    hidden: int

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        D = x.shape[-1]
        z = nn.LayerNorm(name="norm1")(x)
        x = x + nn.SelfAttention(num_heads=self.heads, deterministic=True,
                                 name="mha")(z)
        z = nn.LayerNorm(name="norm2")(x)
        z = BLSTM(self.hidden, name="ff_rnn")(z)
        z = nn.Dense(D, name="ff_out")(nn.relu(z))
        return x + z


class DPTNetSeparator(nn.Module):
    """Dual-path transformer network (Chen et al. 2020;
    espnet2/enh/separator/dptnet_separator.py:13): DPRNN's segment/merge
    grid with improved-transformer blocks along the intra-chunk and
    inter-chunk paths."""

    input_dim: int
    num_spk: int = 2
    num_blocks: int = 3
    chunk_size: int = 40
    heads: int = 4
    hidden: int = 64
    bottleneck: int = 64
    nonlinear: str = "relu"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        B, T, F = x.shape
        h = nn.Dense(self.bottleneck, name="embed")(x)
        seg, _ = _segment(h, self.chunk_size)
        _, n, K, D = seg.shape
        for blk in range(self.num_blocks):
            intra = seg.reshape(B * n, K, D)
            intra = _ImprovedTransformerLayer(
                self.heads, self.hidden, name=f"intra{blk}")(
                intra, deterministic=deterministic)
            seg = intra.reshape(B, n, K, D)
            inter = seg.transpose(0, 2, 1, 3).reshape(B * K, n, D)
            inter = _ImprovedTransformerLayer(
                self.heads, self.hidden, name=f"inter{blk}")(
                inter, deterministic=deterministic)
            seg = inter.reshape(B, K, n, D).transpose(0, 2, 1, 3)
        h = _merge(seg, T)
        m = nn.Dense(self.num_spk * self.input_dim, name="mask_out")(
            nn.PReLU()(h))
        m = m.reshape(B, T, self.num_spk, self.input_dim)
        m = {"relu": nn.relu, "sigmoid": nn.sigmoid,
             "softmax": lambda z: jax.nn.softmax(z, axis=2)}[self.nonlinear](m)
        return [m[:, :, s] for s in range(self.num_spk)]


class _SkiMChunkStep(nn.Module):
    """One segment step of a SkiM block (lifted over the segment axis
    with nn.scan): run the segment LSTM over K frames from the carried
    initial state, then pass the final (h, c) through the memory LSTMs
    (mem_type='hc') or identically ('id') to seed the next segment."""

    hidden: int
    mem_type: str

    @nn.compact
    def __call__(self, carry, chunk):
        # chunk: (B, K, D)
        (h0, c0), mem_state = carry
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden), return_carry=True,
                     name="seg_lstm")
        (cK, hK), outs = rnn(chunk, initial_carry=(c0, h0))
        if self.mem_type == "hc":
            mh_state, mc_state = mem_state
            mh_state, h_next = nn.OptimizedLSTMCell(
                self.hidden, name="mem_h")(mh_state, hK)
            mc_state, c_next = nn.OptimizedLSTMCell(
                self.hidden, name="mem_c")(mc_state, cK)
            mem_state = (mh_state, mc_state)
        else:  # 'id': states pass through unchanged
            h_next, c_next = hK, cK
        return ((h_next, c_next), mem_state), outs


class SkiMSeparator(nn.Module):
    """SkiM — Skipping Memory LSTM (Li et al. 2022;
    espnet2/enh/separator/skim_separator.py:12 + enh/layers/skim.py):
    non-overlapping segments processed by a per-segment LSTM whose
    initial (h, c) comes from a MEMORY LSTM that steps once per segment
    over the previous segment's final state — long-range context at
    O(T/K) recurrent length, causal by construction.

    TPU-first: the segment axis is an `nn.scan` (sequential, carries
    the memory state); each step runs the segment LSTM over K frames.
    mem_type: 'hc' (memory transforms both states) or 'id' (states pass
    through unchanged — SkiM's ablation baseline)."""

    input_dim: int
    num_spk: int = 2
    num_blocks: int = 2
    segment_size: int = 20
    hidden: int = 64
    bottleneck: int = 64
    mem_type: str = "hc"
    nonlinear: str = "relu"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        B, T, F = x.shape
        D = self.bottleneck
        h = nn.Dense(D, name="embed")(x)
        K = self.segment_size
        S = -(-T // K)
        h = jnp.pad(h, ((0, 0), (0, S * K - T), (0, 0)))
        seg = h.reshape(B, S, K, D)
        H = self.hidden
        scan = nn.scan(_SkiMChunkStep, variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        for blk in range(self.num_blocks):
            zeros = jnp.zeros((B, H))
            mem0 = (((zeros, zeros), (zeros, zeros))
                    if self.mem_type == "hc" else None)
            carry0 = ((zeros, zeros), mem0)
            _, outs = scan(hidden=H, mem_type=self.mem_type,
                           name=f"skim{blk}")(carry0, seg)  # (B,S,K,H)
            seg = nn.LayerNorm(name=f"seg_norm{blk}")(
                seg + nn.Dense(D, name=f"seg_proj{blk}")(outs))
        h = seg.reshape(B, S * K, D)[:, :T]
        m = nn.Dense(self.num_spk * self.input_dim, name="mask_out")(
            nn.PReLU()(h))
        m = m.reshape(B, T, self.num_spk, self.input_dim)
        m = {"relu": nn.relu, "sigmoid": nn.sigmoid,
             "softmax": lambda z: jax.nn.softmax(z, axis=2)}[self.nonlinear](m)
        return [m[:, :, s] for s in range(self.num_spk)]


class _GLUConvBlock(nn.Module):
    """Densely-connected GLU conv block over (T, F) (dc_crn.py
    DenselyConnectedBlock role, depth-2 dense connectivity)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        a = nn.Conv(self.channels, (3, 3), padding="SAME", name="c1")(x)
        g = nn.Conv(self.channels, (3, 3), padding="SAME", name="g1")(x)
        h1 = a * nn.sigmoid(g)
        h1 = nn.LayerNorm(name="n1")(h1)
        cat = jnp.concatenate([x, h1], axis=-1)       # dense link
        a = nn.Conv(self.channels, (3, 3), padding="SAME", name="c2")(cat)
        g = nn.Conv(self.channels, (3, 3), padding="SAME", name="g2")(cat)
        h2 = a * nn.sigmoid(g)
        return nn.LayerNorm(name="n2")(h2)


class DC_CRNSeparator(nn.Module):
    """DC-CRN (Tan & Wang 2021; espnet2/enh/separator/
    dc_crn_separator.py:14 + enh/layers/dc_crn.py): U-net of densely-
    connected GLU conv blocks striding over frequency, an LSTM
    bottleneck over time, skip-connected GLU deconv decoder; emits
    per-speaker complex ratio masks from the stacked RI input."""

    input_dim: int
    num_spk: int = 2
    enc_channels: Sequence[int] = (8, 16, 32)
    hidden: int = 64

    complex_input = True
    output = "complex_mask"

    @nn.compact
    def __call__(self, ri, *, deterministic=True):
        real, imag = ri
        B, T, F = real.shape
        # pad F to a multiple of 2^len(enc_channels) for clean striding
        L = len(self.enc_channels)
        Fp = -(-F // (2 ** L)) * (2 ** L)
        x = jnp.stack([real, imag], -1)               # (B, T, F, 2)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Fp - F), (0, 0)))
        skips = []
        h = x
        for i, ch in enumerate(self.enc_channels):
            h = _GLUConvBlock(ch, name=f"enc{i}")(h)
            skips.append(h)
            h = nn.Conv(ch, (1, 3), strides=(1, 2), padding="SAME",
                        name=f"down{i}")(h)            # stride freq
        Bn, Tn, Fb, Cb = h.shape
        z = h.reshape(B, T, Fb * Cb)
        z = BLSTM(self.hidden, name="bottleneck")(z)
        z = nn.Dense(Fb * Cb, name="bottleneck_proj")(z)
        h = z.reshape(B, T, Fb, Cb)
        for i in reversed(range(L)):
            ch = self.enc_channels[i]
            h = nn.ConvTranspose(ch, (1, 3), strides=(1, 2),
                                 padding="SAME", name=f"up{i}")(h)
            h = h[:, :, :skips[i].shape[2]]
            h = _GLUConvBlock(ch, name=f"dec{i}")(
                jnp.concatenate([h, skips[i]], axis=-1))
        m = nn.Conv(2 * self.num_spk, (1, 1), name="mask_out")(h)
        m = m[:, :, :F]                                # (B, T, F, 2S)
        m = m.reshape(B, T, F, self.num_spk, 2)
        return [(m[..., s, 0], m[..., s, 1]) for s in range(self.num_spk)]


class TransformerSeparator(nn.Module):
    """Self-attention TF-masking (espnet2/enh/separator/
    transformer_separator.py): linear embed -> transformer encoder stack
    -> per-source mask heads. Reuses the shared nn.TransformerEncoder
    (one implementation of attention for the whole framework)."""

    input_dim: int
    num_spk: int = 2
    adim: int = 128
    aheads: int = 4
    layers: int = 2
    linear_units: int = 512
    nonlinear: str = "relu"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        from espnet_tpu.nn.transformer import TransformerEncoder
        B, T, F = x.shape
        ilens = jnp.full((B,), T, jnp.int32)
        h, _ = TransformerEncoder(
            input_size=F, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.linear_units,
            num_blocks=self.layers, dropout_rate=self.dropout_rate,
            positional_dropout_rate=self.dropout_rate,
            input_layer="linear", name="enc")(
            x, ilens, deterministic=deterministic)
        masks = []
        for s in range(self.num_spk):
            m = nn.Dense(self.input_dim, name=f"mask{s}")(h)
            m = {"sigmoid": nn.sigmoid, "relu": nn.relu,
                 "tanh": nn.tanh}[self.nonlinear](m)
            masks.append(m)
        return masks


class ConformerSeparator(nn.Module):
    """Conformer TF-masking (espnet2/enh/separator/
    conformer_separator.py): conformer blocks over the magnitude
    spectrogram, per-source mask heads."""

    input_dim: int
    num_spk: int = 2
    adim: int = 128
    aheads: int = 4
    layers: int = 2
    linear_units: int = 512
    cnn_module_kernel: int = 15
    nonlinear: str = "relu"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        from espnet_tpu.nn.conformer import ConformerEncoder
        B, T, F = x.shape
        ilens = jnp.full((B,), T, jnp.int32)
        h, _ = ConformerEncoder(
            input_size=F, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.linear_units,
            num_blocks=self.layers, dropout_rate=self.dropout_rate,
            positional_dropout_rate=self.dropout_rate,
            cnn_module_kernel=self.cnn_module_kernel,
            input_layer="linear", name="enc")(
            x, ilens, deterministic=deterministic)
        masks = []
        for s in range(self.num_spk):
            m = nn.Dense(self.input_dim, name=f"mask{s}")(h)
            m = {"sigmoid": nn.sigmoid, "relu": nn.relu,
                 "tanh": nn.tanh}[self.nonlinear](m)
            masks.append(m)
        return masks


def _sq_dist(emb, centers):
    """emb (B,N,D), centers (B,K,D) -> squared distances (B,N,K) without
    materializing the (B,N,K,D) difference tensor."""
    e2 = jnp.sum(emb * emb, -1)[..., None]
    c2 = jnp.sum(centers * centers, -1)[:, None]
    ec = jnp.einsum("bnd,bkd->bnk", emb, centers)
    return e2 - 2.0 * ec + c2


def kmeans_tf_bins(emb, n_clusters: int, n_iter: int = 10):
    """Fixed-iteration batched k-means over T-F bin embeddings.

    The reference (dpcl_separator.py:107-125) loops until label
    convergence on the host; on TPU a fixed lax.scan of Lloyd steps is
    the static-shape equivalent (10 iterations converges on these
    problem sizes). Returns (labels (B,N), centers (B,K,D))."""
    centers = emb[:, :n_clusters]
    def _step(c, _):
        lab = jnp.argmin(_sq_dist(emb, c), -1)
        oh = jax.nn.one_hot(lab, n_clusters, dtype=emb.dtype)
        c = jnp.einsum("bnk,bnd->bkd", oh, emb) / (
            oh.sum(1)[:, :, None] + 1e-8)
        return c, None
    centers, _ = jax.lax.scan(_step, centers, None, length=n_iter)
    return jnp.argmin(_sq_dist(emb, centers), -1), centers


class DPCLSeparator(nn.Module):
    """Deep Clustering (Hershey et al. 2016; espnet2/enh/separator/
    dpcl_separator.py): BLSTM -> per-T-F-bin embedding. Training uses
    the affinity loss on the embedding (model loss_type='dpcl');
    inference k-means clusters bins into binary masks."""

    input_dim: int
    num_spk: int = 2
    layers: int = 2
    unit: int = 256
    emb_D: int = 20
    nonlinear: str = "tanh"
    dropout_rate: float = 0.0

    output = "dpcl"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        """(B, T, F) magnitude -> embedding (B, T, F, D)."""
        h = x
        for i in range(self.layers):
            h = BLSTM(self.unit, name=f"blstm{i}")(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        e = nn.Dense(self.input_dim * self.emb_D, name="embed")(h)
        e = {"sigmoid": nn.sigmoid, "relu": nn.relu,
             "tanh": nn.tanh}[self.nonlinear](e)
        B, T, _ = e.shape
        return e.reshape(B, T, self.input_dim, self.emb_D)


class DANSeparator(nn.Module):
    """Deep Attractor Network (Chen et al. 2017; espnet2/enh/separator/
    dan_separator.py): T-F bin embeddings; attractors are
    ideal-assignment means of the embedding at train time (refs_mag
    given) and k-means centers at inference; masks are the softmax of
    embedding-attractor affinity."""

    input_dim: int
    num_spk: int = 2
    layers: int = 2
    unit: int = 256
    emb_D: int = 40
    nonlinear: str = "tanh"
    dropout_rate: float = 0.0

    needs_ref_spectra = True

    @nn.compact
    def __call__(self, x, *, deterministic=True, refs_mag=None):
        B, T, F = x.shape
        h = x
        for i in range(self.layers):
            h = BLSTM(self.unit, name=f"blstm{i}")(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        e = nn.Dense(self.input_dim * self.emb_D, name="embed")(h)
        e = {"sigmoid": nn.sigmoid, "relu": nn.relu,
             "tanh": nn.tanh}[self.nonlinear](e)
        emb = e.reshape(B, T * F, self.emb_D)
        if refs_mag is not None:
            # ideal assignment: bin belongs to its loudest source
            stacked = jnp.stack(refs_mag, -1)          # (B, T, F, S)
            lab = jnp.argmax(stacked, -1).reshape(B, T * F)
            oh = jax.nn.one_hot(lab, self.num_spk, dtype=emb.dtype)
            attractor = jnp.einsum("bnd,bns->bds", emb, oh) / (
                oh.sum(1)[:, None] + 1e-8)             # (B, D, S)
        else:
            _, centers = kmeans_tf_bins(emb, self.num_spk)
            attractor = centers.transpose(0, 2, 1)     # (B, D, S)
        dist = jnp.einsum("bnd,bds->bns", emb, attractor)
        masks = jax.nn.softmax(dist, -1).reshape(B, T, F, self.num_spk)
        return [masks[..., s] for s in range(self.num_spk)]


def dpcl_loss(emb, refs_mag):
    """Deep-clustering affinity loss (tf_domain.py:274 FrequencyDomainDPCL
    'dpcl' mode): ||E^T E||_F^2 + ||Y^T Y||_F^2 - 2||E^T Y||_F^2 per
    utterance via the D x D / S x S Gram matrices (never forms the
    N x N affinity). Normalized by N^2 (the reference returns the raw
    Frobenius form; the normalization only rescales gradients)."""
    B, T, F, D = emb.shape
    E = emb.reshape(B, T * F, D)
    stacked = jnp.stack(refs_mag, -1)                 # (B, T, F, S)
    S = stacked.shape[-1]
    lab = jnp.argmax(stacked, -1).reshape(B, T * F)
    Y = jax.nn.one_hot(lab, S, dtype=emb.dtype)       # (B, N, S)
    EtE = jnp.einsum("bnd,bne->bde", E, E)
    YtY = jnp.einsum("bns,bnt->bst", Y, Y)
    EtY = jnp.einsum("bnd,bns->bds", E, Y)
    n = jnp.asarray((T * F) ** 2, emb.dtype)
    return (jnp.sum(EtE ** 2, (1, 2)) + jnp.sum(YtY ** 2, (1, 2))
            - 2.0 * jnp.sum(EtY ** 2, (1, 2))) / n


def _complex_conv(hr, hi, ch, kernel, strides, name, transpose=False):
    """Complex conv as two real convs sharing the complex product rule:
    (Wr + iWi)(xr + ixi) = (Wr xr - Wi xi) + i(Wr xi + Wi xr)."""
    Conv = nn.ConvTranspose if transpose else nn.Conv
    cr = Conv(ch, kernel, strides=strides, padding="SAME",
              name=f"{name}_re")
    ci = Conv(ch, kernel, strides=strides, padding="SAME",
              name=f"{name}_im")
    return cr(hr) - ci(hi), cr(hi) + ci(hr)


class DCCRNSeparator(nn.Module):
    """DCCRN — Deep Complex Convolution Recurrent Network (Hu et al.
    2020; espnet2/enh/separator/dccrn_separator.py + enh/layers/
    complexnn.py): complex-valued conv encoder striding over frequency,
    complex LSTM bottleneck, skip-connected complex deconv decoder;
    emits per-speaker tanh-bounded polar complex ratio masks
    (the reference's masking_mode='E')."""

    input_dim: int
    num_spk: int = 2
    enc_channels: Sequence[int] = (16, 32, 64)
    hidden: int = 128

    complex_input = True
    output = "complex_mask"

    @nn.compact
    def __call__(self, ri, *, deterministic=True):
        real, imag = ri
        B, T, F = real.shape
        L = len(self.enc_channels)
        Fp = -(-F // (2 ** L)) * (2 ** L)
        hr = jnp.pad(real, ((0, 0), (0, 0), (0, Fp - F)))[..., None]
        hi = jnp.pad(imag, ((0, 0), (0, 0), (0, Fp - F)))[..., None]
        skips = []
        for i, ch in enumerate(self.enc_channels):
            hr, hi = _complex_conv(hr, hi, ch, (2, 5), (1, 2), f"enc{i}")
            hr = nn.LayerNorm(name=f"enc_nr{i}")(hr)
            hi = nn.LayerNorm(name=f"enc_ni{i}")(hi)
            hr, hi = nn.PReLU()(hr), nn.PReLU()(hi)
            skips.append((hr, hi))
        Bn, Tn, Fb, Cb = hr.shape
        # complex LSTM over time: Lr/Li real RNNs, complex product rule
        zr = hr.reshape(B, T, Fb * Cb)
        zi = hi.reshape(B, T, Fb * Cb)
        rnn_r = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="lstm_re")
        rnn_i = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="lstm_im")
        yr = rnn_r(zr) - rnn_i(zi)
        yi = rnn_r(zi) + rnn_i(zr)
        proj = nn.Dense(Fb * Cb, name="bottleneck_proj")
        hr = proj(yr).reshape(B, T, Fb, Cb)
        hi = proj(yi).reshape(B, T, Fb, Cb)
        for i in reversed(range(L)):
            sr, si = skips[i]
            hr = jnp.concatenate([hr, sr], axis=-1)
            hi = jnp.concatenate([hi, si], axis=-1)
            ch = self.enc_channels[i - 1] if i else self.num_spk
            hr, hi = _complex_conv(hr, hi, ch, (2, 5), (1, 2), f"dec{i}",
                                   transpose=True)
            if i:
                hr = nn.LayerNorm(name=f"dec_nr{i}")(hr)
                hi = nn.LayerNorm(name=f"dec_ni{i}")(hi)
                hr, hi = nn.PReLU()(hr), nn.PReLU()(hi)
        # (B, T, Fp, S) complex -> polar 'E' mask: |m|<=1 via tanh
        hr, hi = hr[:, :, :F], hi[:, :, :F]
        mag = jnp.sqrt(hr * hr + hi * hi + 1e-8)
        scale = jnp.tanh(mag) / mag
        return [(hr[..., s] * scale[..., s], hi[..., s] * scale[..., s])
                for s in range(self.num_spk)]


class DPCLE2ESeparator(nn.Module):
    """DPCL++ end-to-end (Isik et al. 2016; espnet2/enh/separator/
    dpcl_e2e_separator.py): BLSTM T-F-bin embeddings -> differentiable
    soft k-means (fixed lax.scan iterations replace the reference's
    convergence loop — static shapes for jit) -> soft masks -> a second
    enhancement BLSTM over the masked spectra -> softmax masks. Unlike
    plain DPCL the whole pipeline trains with the signal-level PIT
    loss, no affinity loss needed."""

    input_dim: int
    num_spk: int = 2
    layers: int = 2
    unit: int = 256
    emb_D: int = 20
    alpha: float = 5.0
    n_iter: int = 10
    nonlinear: str = "tanh"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        B, T, F = x.shape
        h = x
        for i in range(self.layers):
            h = BLSTM(self.unit, name=f"blstm{i}")(h)
        V = nn.Dense(F * self.emb_D, name="emb")(h)
        V = {"sigmoid": nn.sigmoid, "relu": nn.relu,
             "tanh": nn.tanh}[self.nonlinear](V)
        V = V.reshape(B, T * F, self.emb_D)
        S = self.num_spk

        def _soft_step(centers, _):
            d = _sq_dist(V, centers)                     # (B, N, S)
            gamma = jax.nn.softmax(-self.alpha * d, axis=-1)
            centers = jnp.einsum("bns,bnd->bsd", gamma, V) / (
                gamma.sum(1)[..., None] + 1e-8)
            return centers, None

        centers, _ = jax.lax.scan(_soft_step, V[:, :S], None,
                                  length=self.n_iter)
        gamma = jax.nn.softmax(-self.alpha * _sq_dist(V, centers), -1)
        soft_masks = gamma.reshape(B, T, F, S)
        masked = [x * soft_masks[..., s] for s in range(S)] + [x]
        z = BLSTM(self.unit, name="enh_blstm")(
            jnp.concatenate(masked, axis=-1))
        z = nn.Dense(F * S, name="enh_out")(z).reshape(B, T, F, S)
        m = jax.nn.softmax(z, axis=-1)
        return [m[..., s] for s in range(S)]


class _MulCatLayer(nn.Module):
    """MulCat block (Nachmani et al. 2020; espnet2/enh/layers/
    dpmulcat.py): two parallel BLSTMs whose outputs multiply
    elementwise, concatenated with the input, projected back."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        a = BLSTM(self.hidden, name="rnn")(x)
        g = BLSTM(self.hidden, name="gate")(x)
        h = jnp.concatenate([a * g, x], axis=-1)
        return nn.Dense(D, name="proj")(h)


class SVoiceSeparator(nn.Module):
    """SVoice (Nachmani et al. 2020, "Voice Separation with an Unknown
    Number of Multiple Speakers"; espnet2/enh/separator/
    svoice_separator.py): learned conv filterbank over the raw mixture,
    dual-path MulCat RNN blocks (no masking — the blocks output source
    representations directly), average-pool decoder with overlap-add.
    `time_domain=True`: receives the raw waveform and returns separated
    waveforms. The reference deep-supervises every block's decode during
    training; here the final block decodes (single-loss variant)."""

    input_dim: int = 0            # unused (time-domain; kept for registry)
    num_spk: int = 2
    enc_dim: int = 128
    kernel_size: int = 8
    hidden: int = 64
    num_layers: int = 2
    segment_size: int = 20

    time_domain = True

    @nn.compact
    def __call__(self, speech_mix, speech_lengths, *, deterministic=True):
        # (B, S) or (B, S, 1) -> (B, S)
        x = speech_mix[..., 0] if speech_mix.ndim == 3 else speech_mix
        B, S = x.shape
        K, hop = self.kernel_size, self.kernel_size // 2
        T = max(-(-max(S - K, 0) // hop) + 1, 1)
        Sp = (T - 1) * hop + K
        w = nn.relu(nn.Conv(self.enc_dim, (K,), strides=(hop,),
                            padding="VALID", use_bias=False,
                            name="encoder")(
            jnp.pad(x, ((0, 0), (0, Sp - S)))[..., None]))   # (B, T, N)
        seg, _ = _segment(w, self.segment_size)
        _, n, Kc, D = seg.shape
        h = seg
        for blk in range(self.num_layers):
            intra = h.reshape(B * n, Kc, D)
            intra = _MulCatLayer(self.hidden, name=f"intra{blk}")(intra)
            h = nn.LayerNorm(name=f"norm_i{blk}")(
                h + intra.reshape(B, n, Kc, D))
            inter = h.transpose(0, 2, 1, 3).reshape(B * Kc, n, D)
            inter = _MulCatLayer(self.hidden, name=f"inter{blk}")(inter)
            h = nn.LayerNorm(name=f"norm_o{blk}")(
                h + inter.reshape(B, Kc, n, D).transpose(0, 2, 1, 3))
        h = nn.Dense(self.num_spk * D, name="spk_out")(nn.PReLU()(h))
        h = _merge(h.reshape(B, n, Kc, self.num_spk * D), T)
        h = h.reshape(B, T, self.num_spk, D)
        # decoder (svoice_separator.py Decoder): avg-pool the feature dim
        # into frames of N//kernel, overlap-add at kernel//2
        frame = h.reshape(B, T, self.num_spk, D // K, K).mean(-1)
        frame = frame.transpose(0, 2, 1, 3)     # (B, S', T, N//K)
        Fl = D // K
        step = K // 2
        out_len = (T - 1) * step + Fl
        idx = (jnp.arange(Fl)[None, :] + step * jnp.arange(T)[:, None])
        est = jnp.zeros((B, self.num_spk, out_len)).at[
            :, :, idx.reshape(-1)].add(
            frame.reshape(B, self.num_spk, T * Fl))
        est = jnp.pad(est, ((0, 0), (0, 0), (0, max(0, S - out_len))))
        return [est[:, s, :S] for s in range(self.num_spk)]


class _TAC(nn.Module):
    """Transform-average-concatenate across microphones (Luo et al.
    2020; espnet2/enh/layers/tcndenseunet.py / fasnet.py TAC role):
    per-channel transform, channel mean, concat, project, residual.
    x: (B, C, ..., D)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        h = nn.PReLU()(nn.Dense(self.hidden, name="transform")(x))
        avg = jnp.mean(h, axis=1, keepdims=True)
        avg = nn.PReLU()(nn.Dense(self.hidden, name="average")(avg))
        cat = jnp.concatenate(
            [h, jnp.broadcast_to(avg, h.shape)], axis=-1)
        return x + nn.Dense(D, name="concat_proj")(cat)


class FaSNetSeparator(nn.Module):
    """FaSNet-TAC (Luo et al. 2019/2020; espnet2/enh/separator/
    fasnet_separator.py + enh/layers/fasnet.py): multi-channel
    time-domain filter-and-sum. The mixture is framed (50% overlap)
    with `context` samples on each side; per-frame features = learned
    encoding of the context frame + cosine similarity of every
    channel's context against the reference channel's center frame at
    all 2*context+1 lags (the NCC feature, computed here as one einsum
    over a sliding-window unfold — MXU-shaped, no per-lag loop).
    A dual-path BLSTM with TAC across channels estimates a
    (2*context+1)-tap filter per frame/channel/speaker; filtering is a
    second unfold einsum; overlap-add and channel mean reconstruct the
    separated waveforms. `time_domain=True`; input (B, S) or (B, S, C).
    """

    input_dim: int = 0            # unused (time-domain; kept for registry)
    num_spk: int = 2
    enc_dim: int = 64
    feature_dim: int = 64
    hidden: int = 64
    num_layers: int = 2
    segment_size: int = 24
    window_ms: int = 4
    context_ms: int = 4
    sr: int = 16000

    time_domain = True

    @nn.compact
    def __call__(self, speech_mix, speech_lengths, *, deterministic=True):
        x = speech_mix[..., None] if speech_mix.ndim == 2 else speech_mix
        x = x.transpose(0, 2, 1)                       # (B, C, S)
        B, C, S = x.shape
        win = max(int(self.sr * self.window_ms / 1000), 2)
        ctx = int(self.sr * self.context_ms / 1000)
        hop = win // 2
        # frame grid over [hop left-pad] + signal + [rest + hop right-pad]
        rest = (win - (hop + S % win) % win) % win
        xp = jnp.pad(x, ((0, 0), (0, 0), (hop, rest + hop)))
        Sp = xp.shape[-1]
        L = Sp // hop - 1                              # frames
        xc = jnp.pad(xp, ((0, 0), (0, 0), (ctx, ctx)))
        fidx = hop * jnp.arange(L)[:, None]
        ctx_frames = xc[:, :, fidx + jnp.arange(2 * ctx + win)[None]]
        center = xp[:, :, fidx + jnp.arange(win)[None]]  # (B, C, L, win)
        # learned frame encoding
        enc = nn.Dense(self.enc_dim, use_bias=False, name="encoder")(
            ctx_frames)
        enc = nn.LayerNorm(name="enc_norm")(enc)       # (B, C, L, N)
        # NCC: all-lag cosine similarity vs ref channel's center frame
        n_lag = 2 * ctx + 1
        unfold = ctx_frames[:, :, :, jnp.arange(win)[None, :]
                            + jnp.arange(n_lag)[:, None]]
        # unfold: (B, C, L, n_lag, win); ref center: (B, L, win)
        ref = center[:, 0]
        num = jnp.einsum("bclkw,blw->bclk", unfold, ref)
        den = (jnp.sqrt(jnp.sum(unfold ** 2, -1) + 1e-8)
               * jnp.sqrt(jnp.sum(ref ** 2, -1) + 1e-8)[:, None, :, None])
        cos = num / den                                # (B, C, L, n_lag)
        h = nn.Dense(self.feature_dim, name="bottleneck")(
            jnp.concatenate([enc, cos], axis=-1))      # (B, C, L, D)
        # dual-path over segments with cross-channel TAC per block
        D = self.feature_dim
        seg, _ = _segment(h.reshape(B * C, L, D), self.segment_size)
        _, n, K, _ = seg.shape
        for blk in range(self.num_layers):
            intra = seg.reshape(B * C * n, K, D)
            intra = nn.Dense(D, name=f"intra_proj{blk}")(
                BLSTM(self.hidden, name=f"intra{blk}")(intra))
            seg = nn.LayerNorm(name=f"norm_i{blk}")(
                seg + intra.reshape(B * C, n, K, D))
            inter = seg.transpose(0, 2, 1, 3).reshape(B * C * K, n, D)
            inter = nn.Dense(D, name=f"inter_proj{blk}")(
                BLSTM(self.hidden, name=f"inter{blk}")(inter))
            seg = nn.LayerNorm(name=f"norm_o{blk}")(
                seg + inter.reshape(B * C, K, n, D).transpose(0, 2, 1, 3))
            seg = _TAC(self.hidden, name=f"tac{blk}")(
                seg.reshape(B, C, n, K, D)).reshape(B * C, n, K, D)
        h = _merge(seg, L).reshape(B, C, L, D)
        # gated filter head (reference BF_module output: Tanh * Sigmoid)
        f = (nn.tanh(nn.Dense(self.num_spk * n_lag, name="filt_t")(h))
             * nn.sigmoid(nn.Dense(self.num_spk * n_lag,
                                   name="filt_g")(h)))
        filt = f.reshape(B, C, L, self.num_spk, n_lag)
        # filter-and-sum: correlate each channel's context with its
        # filter -> win-length output frames (win-window unfold einsum)
        unfold_fs = ctx_frames[:, :, :, jnp.arange(n_lag)[None, :]
                               + jnp.arange(win)[:, None]]
        est = jnp.einsum("bclwk,bclsk->bcslw", unfold_fs, filt)
        # overlap-add frames (hop) then strip pads; mean over channels
        oidx = (fidx + jnp.arange(win)[None]).reshape(-1)
        sig = jnp.zeros((B, C, self.num_spk, Sp)).at[:, :, :, oidx].add(
            est.reshape(B, C, self.num_spk, L * win))
        sig = sig[:, :, :, hop:hop + S].mean(axis=1)   # (B, S', S)
        return [sig[:, s] for s in range(self.num_spk)]


class USESSeparator(nn.Module):
    """USES — Unconstrained Speech Enhancement and Separation (Zhang et
    al. 2023; espnet2/enh/separator/uses_separator.py + enh/layers/
    uses.py): complex RI input embedded by a 2-D conv, processed by
    ATF blocks — self-attention over frequency, BLSTM over time —
    with a bank of learned global memory tokens prepended along the
    time axis (the mechanism that carries history across segments in
    the reference's segment-streaming mode; here the tokens attend over
    the full utterance in one pass). Emits per-speaker complex masks.
    Single-channel core (the reference's channel-attention blocks
    collapse at C=1)."""

    input_dim: int
    num_spk: int = 2
    enc_channels: int = 32
    bottleneck: int = 64
    num_blocks: int = 2
    heads: int = 4
    hidden: int = 64
    memory_size: int = 4

    complex_input = True
    output = "complex_mask"

    @nn.compact
    def __call__(self, ri, *, deterministic=True):
        real, imag = ri
        B, T, F = real.shape
        x = jnp.stack([real, imag], -1)                # (B, T, F, 2)
        h = nn.Conv(self.enc_channels, (3, 3), padding="SAME",
                    name="post_encoder")(x)
        D = self.bottleneck
        h = nn.Dense(D, name="bottleneck")(h)          # (B, T, F, D)
        mem = self.param("memory_tokens", nn.initializers.normal(0.02),
                         (self.memory_size, D))
        for blk in range(self.num_blocks):
            # memory tokens join the time axis (every freq bin sees them)
            m = jnp.broadcast_to(mem[None, :, None, :],
                                 (B, self.memory_size, F, D))
            ht = jnp.concatenate([m, h], axis=1)
            t = ht.transpose(0, 2, 1, 3).reshape(
                B * F, T + self.memory_size, D)
            t = nn.Dense(D, name=f"time_proj{blk}")(
                BLSTM(self.hidden, name=f"time_rnn{blk}")(t))
            ht = nn.LayerNorm(name=f"norm_t{blk}")(
                ht + t.reshape(B, F, T + self.memory_size, D)
                .transpose(0, 2, 1, 3))
            h = ht[:, self.memory_size:]
            f = h.reshape(B * T, F, D)
            z = nn.LayerNorm(name=f"prenorm_f{blk}")(f)
            f = f + nn.SelfAttention(num_heads=self.heads,
                                     deterministic=True,
                                     name=f"freq_att{blk}")(z)
            z = nn.LayerNorm(name=f"prenorm_ff{blk}")(f)
            f = f + nn.Dense(D, name=f"ff2_{blk}")(
                nn.relu(nn.Dense(2 * D, name=f"ff1_{blk}")(z)))
            h = nn.LayerNorm(name=f"norm_f{blk}")(f).reshape(B, T, F, D)
        m = nn.Conv(2 * self.num_spk, (3, 3), padding="SAME",
                    name="mask_out")(h)
        m = m.reshape(B, T, F, self.num_spk, 2)
        return [(m[..., s, 0], m[..., s, 1]) for s in range(self.num_spk)]


class USES2Separator(nn.Module):
    """USES2 (Zhang et al. 2024; espnet2/enh/separator/
    uses2_separator.py): USES with explicit channel modeling — the
    first `num_spatial_blocks` blocks run per-channel (shared weights)
    and fuse channels with TAC (transform-average-concatenate) plus
    cross-channel attention (the reference's 'att_tac' ch_mode);
    channels then collapse to the reference and the remaining blocks
    are the USES ATF stack with global memory tokens ('comp' mode; the
    swin TF variant is not ported). Works at C=1 unchanged."""

    input_dim: int
    num_spk: int = 2
    enc_channels: int = 32
    bottleneck: int = 64
    num_blocks: int = 2
    num_spatial_blocks: int = 1
    heads: int = 4
    hidden: int = 64
    memory_size: int = 4
    ref_channel: int = 0

    complex_input = True
    multichannel_input = True
    output = "complex_mask"

    @nn.compact
    def __call__(self, ri, *, deterministic=True):
        real, imag = ri
        if real.ndim == 3:
            real, imag = real[..., None], imag[..., None]
        B, T, F, C = real.shape
        x = jnp.stack([real, imag], -1)                # (B, T, F, C, 2)
        x = x.transpose(0, 3, 1, 2, 4).reshape(B * C, T, F, 2)
        h = nn.Conv(self.enc_channels, (3, 3), padding="SAME",
                    name="post_encoder")(x)
        D = self.bottleneck
        h = nn.Dense(D, name="bottleneck")(h)          # (B*C, T, F, D)
        mem = self.param("memory_tokens", nn.initializers.normal(0.02),
                         (self.memory_size, D))

        def atf_block(h, blk, n_batch):
            """USES ATF block: BLSTM over time w/ memory tokens, then
            self-attention + FF over frequency (shared w/ USES role)."""
            m = jnp.broadcast_to(mem[None, :, None, :],
                                 (n_batch, self.memory_size, F, D))
            ht = jnp.concatenate([m, h], axis=1)
            t = ht.transpose(0, 2, 1, 3).reshape(
                n_batch * F, T + self.memory_size, D)
            t = nn.Dense(D, name=f"time_proj{blk}")(
                BLSTM(self.hidden, name=f"time_rnn{blk}")(t))
            ht = nn.LayerNorm(name=f"norm_t{blk}")(
                ht + t.reshape(n_batch, F, T + self.memory_size, D)
                .transpose(0, 2, 1, 3))
            h = ht[:, self.memory_size:]
            f = h.reshape(n_batch * T, F, D)
            z = nn.LayerNorm(name=f"prenorm_f{blk}")(f)
            f = f + nn.SelfAttention(num_heads=self.heads,
                                     deterministic=True,
                                     name=f"freq_att{blk}")(z)
            z = nn.LayerNorm(name=f"prenorm_ff{blk}")(f)
            f = f + nn.Dense(D, name=f"ff2_{blk}")(
                nn.relu(nn.Dense(2 * D, name=f"ff1_{blk}")(z)))
            return nn.LayerNorm(name=f"norm_f{blk}")(f).reshape(
                n_batch, T, F, D)

        for blk in range(self.num_blocks):
            if blk < self.num_spatial_blocks and C > 1:
                h = atf_block(h, blk, B * C)
                hc = h.reshape(B, C, T, F, D)
                # TAC: per-channel transform, average, concat back
                z = nn.relu(nn.Dense(D, name=f"tac_tf{blk}")(hc))
                avg = jnp.mean(z, axis=1, keepdims=True)
                z = jnp.concatenate(
                    [z, jnp.broadcast_to(avg, z.shape)], axis=-1)
                hc = hc + nn.LayerNorm(name=f"tac_norm{blk}")(
                    nn.Dense(D, name=f"tac_out{blk}")(nn.relu(z)))
                # cross-channel attention at each (t, f)
                a = hc.transpose(0, 2, 3, 1, 4).reshape(B * T * F, C, D)
                a = nn.SelfAttention(num_heads=self.heads,
                                     deterministic=True,
                                     name=f"ch_att{blk}")(
                    nn.LayerNorm(name=f"ch_norm{blk}")(a))
                hc = hc + a.reshape(B, T, F, C, D).transpose(0, 3, 1, 2, 4)
                h = hc.reshape(B * C, T, F, D)
                if blk == self.num_spatial_blocks - 1:
                    h = hc[:, self.ref_channel]        # collapse (B,T,F,D)
            else:
                if blk == 0 and C > 1:
                    h = h.reshape(B, C, T, F, D)[:, self.ref_channel]
                n_b = h.shape[0]
                h = atf_block(h, blk, n_b)
        if h.shape[0] != B:                            # C==1 fold-out
            h = h.reshape(B, -1, T, F, D)[:, 0]
        m = nn.Conv(2 * self.num_spk, (3, 3), padding="SAME",
                    name="mask_out")(h)
        m = m.reshape(B, T, F, self.num_spk, 2)
        return [(m[..., s, 0], m[..., s, 1]) for s in range(self.num_spk)]


class NeuralBeamformerSeparator(nn.Module):
    """Registry adapter over the MVDR NeuralBeamformer
    (espnet2/enh/separator/neural_beamformer.py role): multichannel
    (B, S, C) wav in -> beamformed single-source wav out, routed
    through the time-domain separator path."""

    input_dim: int = 0           # unused (wav-domain)
    num_spk: int = 1
    n_fft: int = 512
    hop_length: int = 128
    mask_hidden: int = 128
    mask_layers: int = 2
    ref_channel: int = 0

    time_domain = True

    @nn.compact
    def __call__(self, speech_mix, speech_lengths, *, deterministic=True):
        from espnet_tpu.models.enh.beamformer import NeuralBeamformer
        if speech_mix.ndim == 2:
            speech_mix = speech_mix[..., None]
        bf = NeuralBeamformer(n_fft=self.n_fft, hop_length=self.hop_length,
                              mask_hidden=self.mask_hidden,
                              mask_layers=self.mask_layers,
                              ref_channel=self.ref_channel, name="bf")
        wav, _ = bf.enhance(speech_mix, speech_lengths,
                            deterministic=deterministic)
        return [wav]


class _GridBlockV2(nn.Module):
    """One TF-GridNetV2 block: full-band frequency BLSTM, sub-band
    temporal BLSTM, vectorized full-band cross-frame attention. Split
    out as a module so the separator can wrap it in nn.remat — the six
    BLSTM scans per block otherwise pin ~18 GB of bwd activations at
    B=8/T=500 (observed 54 GB for 3 blocks on a 16 GB chip)."""

    emb_dim: int
    hidden: int
    attn_heads: int
    attn_qk_dim: int
    norm_freq: bool

    def _head_norm(self, z, name):
        """(B, T, F, H, E): v2 normalizes per head over (F, E); v3 is
        sampling-frequency-independent — channel axis only."""
        axes = (-3, -1) if self.norm_freq else (-1,)
        return nn.LayerNorm(reduction_axes=axes, name=name)(z)

    @nn.compact
    def __call__(self, h):
        B, T, F, D = h.shape
        z = nn.LayerNorm(
            reduction_axes=(-2, -1) if self.norm_freq else (-1,),
            name="fnorm")(h)
        z = z.reshape(B * T, F, D)
        z = BLSTM(self.hidden, name="freq_blstm")(z)
        z = nn.Dense(D, name="freq_proj")(z)
        h = h + z.reshape(B, T, F, D)
        z = nn.LayerNorm(
            reduction_axes=(-2, -1) if self.norm_freq else (-1,),
            name="tnorm")(h)
        z = z.transpose(0, 2, 1, 3).reshape(B * F, T, D)
        z = BLSTM(self.hidden, name="time_blstm")(z)
        z = nn.Dense(D, name="time_proj")(z)
        h = h + z.reshape(B, F, T, D).transpose(0, 2, 1, 3)
        # vectorized full-band attention: all heads in one projection
        z = nn.LayerNorm(
            reduction_axes=(-2, -1) if self.norm_freq else (-1,),
            name="anorm")(h)
        E, Hh = self.attn_qk_dim, self.attn_heads
        Dv = D // Hh
        q = nn.PReLU()(nn.Dense(Hh * E, name="attnQ")(z)) \
            .reshape(B, T, F, Hh, E)
        k = nn.PReLU()(nn.Dense(Hh * E, name="attnK")(z)) \
            .reshape(B, T, F, Hh, E)
        v = nn.PReLU()(nn.Dense(Hh * Dv, name="attnV")(z)) \
            .reshape(B, T, F, Hh, Dv)
        q = self._head_norm(q, "attnQn")
        k = self._head_norm(k, "attnKn")
        v = self._head_norm(v, "attnVn")
        qf = q.transpose(0, 3, 1, 2, 4).reshape(B, Hh, T, F * E)
        kf = k.transpose(0, 3, 1, 2, 4).reshape(B, Hh, T, F * E)
        vf = v.transpose(0, 3, 1, 2, 4).reshape(B, Hh, T, F * Dv)
        att = jax.nn.softmax(
            jnp.einsum("bhtd,bhsd->bhts", qf, kf)
            / jnp.sqrt(jnp.asarray(F * E, qf.dtype)), axis=-1)
        o = jnp.einsum("bhts,bhsd->bhtd", att, vf)
        o = o.reshape(B, Hh, T, F, Dv).transpose(0, 2, 3, 1, 4) \
            .reshape(B, T, F, D)
        proj = nn.LayerNorm(
            reduction_axes=(-2, -1) if self.norm_freq else (-1,),
            name="attnOn")(
            nn.PReLU()(nn.Dense(D, name="attnO")(o)))
        return h + proj


class TFGridNetV2Separator(nn.Module):
    """TF-GridNetV2 (espnet2/enh/separator/tfgridnetv2_separator.py):
    same grid blocks as TF-GridNet but the cross-frame attention heads
    are VECTORIZED — one Dense computes every head's Q/K/V and one
    einsum attends over all heads — which is also the better MXU
    mapping (one large matmul instead of H small ones). Optional
    multi-mic input (n_imics>1): mic RI planes stack into the embed.
    Blocks run under jax.checkpoint by default (remat=True): bwd
    recomputes each block so peak HBM is one block's activations."""

    input_dim: int               # n_freq
    num_spk: int = 2
    n_imics: int = 1
    num_blocks: int = 3
    emb_dim: int = 32
    hidden: int = 64
    attn_heads: int = 2
    attn_qk_dim: int = 4
    norm_freq: bool = True       # v3 sets False (SFI norms)
    remat: bool = True

    complex_input = True
    multichannel_input = True
    output = "spectrum"

    @nn.compact
    def __call__(self, ri, *, deterministic=True):
        real, imag = ri
        if real.ndim == 3:                      # (B, T, F) single mic
            real, imag = real[..., None], imag[..., None]
        B, T, F, C = real.shape
        x = jnp.concatenate([real, imag], axis=-1)   # (B, T, F, 2C)
        h = nn.Dense(self.emb_dim, name="embed")(x)
        Block = nn.remat(_GridBlockV2) if self.remat else _GridBlockV2
        for blk in range(self.num_blocks):
            h = Block(self.emb_dim, self.hidden, self.attn_heads,
                      self.attn_qk_dim, self.norm_freq,
                      name=f"block{blk}")(h)
        out = nn.Dense(2 * self.num_spk, name="deconv")(h)
        out = out.reshape(B, T, F, self.num_spk, 2)
        return [(out[..., s, 0], out[..., s, 1])
                for s in range(self.num_spk)]


class TFGridNetV3Separator(TFGridNetV2Separator):
    """TF-GridNetV3 (tfgridnetv3_separator.py): V2 with every
    normalization made independent of the frequency extent, so one
    trained model transfers across sampling rates / FFT sizes."""

    norm_freq: bool = False


class _DenseConvStack(nn.Module):
    """Compact DenseNet-style 2-D conv stack over (T, F) used as
    iNeuBe's DNN1/DNN2 (tcndenseunet.py role at reduced depth)."""

    out_channels: int
    hidden: int = 24
    layers: int = 4
    kernel: tuple = (3, 3)

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(self.layers):
            h = jnp.concatenate(feats, axis=-1)
            h = nn.Conv(self.hidden, self.kernel, padding="SAME",
                        name=f"conv{i}")(h)
            h = nn.elu(nn.LayerNorm(name=f"ln{i}")(h))
            feats.append(h)
        return nn.Conv(self.out_channels, (1, 1), name="proj")(
            jnp.concatenate(feats, axis=-1))


def mfmcwf(real, imag, er, ei, n_chunks: int = 3, tik_eps: float = 1e-6):
    """Multi-frame multichannel Wiener filter (ineube_separator.py
    mfmcwf): per (batch, freq), solve (Y Y^H + eps I) w = Y s^* over
    stacked mic/tap context frames; returns the filtered reference
    estimate. Complex algebra in real block form (TPU-friendly batched
    solve on the MXU).

    real/imag: (B, T, F, C) mixture; er/ei: (B, T, F) DNN1 estimate.
    """
    B, T, F, C = real.shape
    taps = 2 * n_chunks + 1
    shifts = [jnp.roll(jnp.stack([real, imag], -1), s, axis=1)
              for s in range(-n_chunks, n_chunks + 1)]
    # (B, T, F, C*taps, 2) stacked context
    y = jnp.concatenate([s.reshape(B, T, F, C, 2) for s in shifts], axis=3)
    yr, yi = y[..., 0], y[..., 1]                   # (B, T, F, N)
    N = C * taps
    # covariance R = sum_t y y^H  (complex, hermitian)
    Rr = (jnp.einsum("btfn,btfm->bfnm", yr, yr)
          + jnp.einsum("btfn,btfm->bfnm", yi, yi))
    Ri = (jnp.einsum("btfn,btfm->bfnm", yi, yr)
          - jnp.einsum("btfn,btfm->bfnm", yr, yi))
    # cross-corr p = sum_t y s^*
    pr = (jnp.einsum("btfn,btf->bfn", yr, er)
          + jnp.einsum("btfn,btf->bfn", yi, ei))
    pi = (jnp.einsum("btfn,btf->bfn", yi, er)
          - jnp.einsum("btfn,btf->bfn", yr, ei))
    eye = jnp.eye(N, dtype=real.dtype) * (
        tik_eps + tik_eps * jnp.trace(Rr, axis1=-2, axis2=-1)
        [..., None, None] / N)
    # real block system [[Rr, -Ri], [Ri, Rr]] [wr; wi] = [pr; pi]
    top = jnp.concatenate([Rr + eye, -Ri], axis=-1)
    bot = jnp.concatenate([Ri, Rr + eye], axis=-1)
    A = jnp.concatenate([top, bot], axis=-2)        # (B, F, 2N, 2N)
    b = jnp.concatenate([pr, pi], axis=-1)[..., None]
    w = jnp.linalg.solve(A, b)[..., 0]              # (B, F, 2N)
    wr, wi = w[..., :N], w[..., N:]
    # filter: s_hat = w^H y
    sr = (jnp.einsum("bfn,btfn->btf", wr, yr)
          + jnp.einsum("bfn,btfn->btf", wi, yi))
    si = (jnp.einsum("bfn,btfn->btf", wr, yi)
          - jnp.einsum("bfn,btfn->btf", wi, yr))
    return sr, si


class INeuBeSeparator(nn.Module):
    """iNeuBe (espnet2/enh/separator/ineube_separator.py): iterative
    neural/beamforming enhancement — DNN1 estimates each source from
    the multi-mic complex spectrum, a multi-frame multichannel Wiener
    filter (mfmcwf) beamforms toward that estimate, and DNN2 refines
    from [mixture, DNN1, mfMCWF]. `output_from` selects the stage."""

    input_dim: int
    num_spk: int = 1
    mic_channels: int = 1
    hidden: int = 24
    layers: int = 4
    n_chunks: int = 3
    tik_eps: float = 1e-6
    output_from: str = "dnn2"    # dnn1 | mfmcwf | dnn2

    complex_input = True
    multichannel_input = True
    output = "spectrum"

    @nn.compact
    def __call__(self, ri, *, deterministic=True):
        real, imag = ri
        if real.ndim == 3:
            real, imag = real[..., None], imag[..., None]
        B, T, F, C = real.shape
        mix = jnp.concatenate([real, imag], axis=-1)    # (B, T, F, 2C)
        d1 = _DenseConvStack(2 * self.num_spk, self.hidden, self.layers,
                             name="dnn1")(mix)
        d1 = d1.reshape(B, T, F, self.num_spk, 2)
        outs = []
        for s in range(self.num_spk):
            er, ei = d1[..., s, 0], d1[..., s, 1]
            if self.output_from == "dnn1":
                outs.append((er, ei))
                continue
            br, bi = mfmcwf(real, imag, er, ei, self.n_chunks,
                            self.tik_eps)
            if self.output_from == "mfmcwf":
                outs.append((br, bi))
                continue
            feats = jnp.concatenate(
                [mix, er[..., None], ei[..., None],
                 br[..., None], bi[..., None]], axis=-1)
            d2 = _DenseConvStack(2, self.hidden, self.layers,
                                 name=f"dnn2_{s}")(feats)
            outs.append((d2[..., 0], d2[..., 1]))
        return outs


SEPARATORS.update({"dprnn": DPRNNSeparator, "tfgridnet": TFGridNetSeparator,
                   "bsrnn": BSRNNSeparator, "dptnet": DPTNetSeparator,
                   "skim": SkiMSeparator, "dc_crn": DC_CRNSeparator,
                   "transformer": TransformerSeparator,
                   "conformer": ConformerSeparator,
                   "dpcl": DPCLSeparator, "dan": DANSeparator,
                   "dccrn": DCCRNSeparator, "dpcl_e2e": DPCLE2ESeparator,
                   "svoice": SVoiceSeparator, "fasnet": FaSNetSeparator,
                   "uses": USESSeparator,
                   "tfgridnetv2": TFGridNetV2Separator,
                   "tfgridnetv3": TFGridNetV3Separator,
                   "ineube": INeuBeSeparator,
                   "uses2": USES2Separator,
                   "neural_beamformer": NeuralBeamformerSeparator})


def _asteroid_stub(**kwargs):
    # offline-clean stub (enh/separator/asteroid_models.py role): fails
    # with the pip name + in-repo alternative instead of a KeyError
    from espnet_tpu.utils.hub import AsteroidModel_Converter
    return AsteroidModel_Converter(**kwargs)


SEPARATORS["asteroid"] = _asteroid_stub
