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


SEPARATORS.update({"dprnn": DPRNNSeparator, "tfgridnet": TFGridNetSeparator,
                   "bsrnn": BSRNNSeparator, "dptnet": DPTNetSeparator,
                   "skim": SkiMSeparator, "dc_crn": DC_CRNSeparator,
                   "transformer": TransformerSeparator,
                   "conformer": ConformerSeparator,
                   "dpcl": DPCLSeparator, "dan": DANSeparator})
