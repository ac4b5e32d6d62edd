"""Speaker verification: ECAPA-style encoder + attentive pooling +
AAM-softmax.

Behavioral contract: espnet2/spk/ — encoders (ECAPA-TDNN family,
espnet2/spk/encoder/ecapa_tdnn_encoder.py), pooling
(chn_attn_stat_pooling.py attentive statistics), loss
(aamsoftmax.py ArcMargin AAM-softmax), projector; spk_trainer +
EER/minDCF scoring (espnet2/utils/eer.py -> utils/eer.py here).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.frontends.default import DefaultFrontend
from espnet_tpu.utils.masks import make_non_pad_mask


class SERes2NetBlock(nn.Module):
    """Lightweight ECAPA block: dilated conv + squeeze-excitation."""

    channels: int
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (1,), name="conv_in")(x)
        h = nn.relu(nn.LayerNorm(name="norm1")(h))
        h = nn.Conv(self.channels, (self.kernel,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    name="dconv")(h)
        h = nn.relu(nn.LayerNorm(name="norm2")(h))
        h = nn.Conv(self.channels, (1,), name="conv_out")(h)
        # squeeze-excitation
        s = jnp.mean(h, axis=1, keepdims=True)
        s = nn.relu(nn.Dense(self.channels // 4, name="se1")(s))
        s = nn.sigmoid(nn.Dense(self.channels, name="se2")(s))
        return x + h * s


class EcapaEncoder(nn.Module):
    channels: int = 512
    num_blocks: int = 3

    @nn.compact
    def __call__(self, feats):
        h = nn.Conv(self.channels, (5,), padding="SAME", name="conv_in")(feats)
        h = nn.relu(nn.LayerNorm(name="norm_in")(h))
        outs = []
        for i in range(self.num_blocks):
            h = SERes2NetBlock(self.channels, dilation=2 ** i,
                               name=f"block{i}")(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)
        return nn.relu(nn.Conv(self.channels, (1,), name="mfa")(h))


class AttnStatPooling(nn.Module):
    """Channel-attentive statistics pooling
    (spk/pooling/chn_attn_stat_pooling.py)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, h, valid_mask):
        # context: concat mean/std stats
        mask = valid_mask[:, :, None]
        n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mu = jnp.sum(h * mask, axis=1, keepdims=True) / n
        sd = jnp.sqrt(jnp.maximum(
            jnp.sum(((h - mu) ** 2) * mask, axis=1, keepdims=True) / n, 1e-7))
        ctx = jnp.concatenate(
            [h, jnp.broadcast_to(mu, h.shape), jnp.broadcast_to(sd, h.shape)],
            axis=-1)
        a = nn.tanh(nn.Conv(self.hidden, (1,), name="attn1")(ctx))
        a = nn.Conv(h.shape[-1], (1,), name="attn2")(a)
        a = jnp.where(mask, a, -1e9)
        w = jax.nn.softmax(a, axis=1)
        mean = jnp.sum(h * w, axis=1)
        std = jnp.sqrt(jnp.maximum(
            jnp.sum((h ** 2) * w, axis=1) - mean ** 2, 1e-7))
        return jnp.concatenate([mean, std], axis=-1)


class AFMS(nn.Module):
    """Alpha feature-map scaling (RawNet2/3;
    espnet2/spk/layers/rawnet_block.py:8): per-channel learned offset
    plus a sigmoid-gated channel reweighting from time-avg features."""

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        C = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.ones, (C,))
        g = nn.sigmoid(nn.Dense(C, name="fc")(jnp.mean(x, axis=1)))
        return (x + alpha[None, None]) * g[:, None, :]


class Bottle2neck(nn.Module):
    """Res2Net bottleneck over time (rawnet_block.py:31): 1x1 expand,
    hierarchical per-scale dilated convs with cumulative adds, 1x1 out,
    residual, optional time max-pool, AFMS gate. LayerNorm replaces
    BatchNorm (batch-size-independent — same stats role, jit-friendly).
    """

    planes: int
    kernel: int = 3
    dilation: int = 1
    scale: int = 8
    pool: int = 0

    @nn.compact
    def __call__(self, x):
        width = self.planes // self.scale
        res = x if x.shape[-1] == self.planes else nn.Conv(
            self.planes, (1,), use_bias=False, name="residual")(x)
        h = nn.LayerNorm(name="bn1")(nn.relu(
            nn.Conv(width * self.scale, (1,), name="conv1")(x)))
        sp = None
        outs = []
        for i in range(self.scale - 1):
            part = h[..., i * width:(i + 1) * width]
            sp = part if sp is None else sp + part
            sp = nn.LayerNorm(name=f"bns{i}")(nn.relu(
                nn.Conv(width, (self.kernel,),
                        kernel_dilation=(self.dilation,), padding="SAME",
                        name=f"convs{i}")(sp)))
            outs.append(sp)
        outs.append(h[..., (self.scale - 1) * width:])
        h = jnp.concatenate(outs, axis=-1)
        h = nn.LayerNorm(name="bn3")(nn.relu(
            nn.Conv(self.planes, (1,), name="conv3")(h)))
        h = h + res
        if self.pool:
            # SAME padding: ceil(T/pool) frames — short utterances never
            # collapse to zero length (which would NaN the AFMS mean)
            h = nn.max_pool(h, (self.pool,), strides=(self.pool,),
                            padding="SAME")
        return AFMS(name="afms")(h)


class RawNet3Encoder(nn.Module):
    """RawNet3 (Jung et al. 2022;
    espnet2/spk/encoder/rawnet3_encoder.py:14): raw waveform -> sinc-
    style strided conv stem -> three Bottle2neck layers with multi-rate
    pooling -> multi-scale concat -> 1x1 output conv. The reference
    pairs this with the asteroid sinc frontend; here the mel-initialized
    sinc filterbank is the stem conv."""

    ndim: int = 256
    model_scale: int = 4
    out_channels: int = 384
    stem_filters: int = 80
    stem_kernel: int = 251
    stem_stride: int = 160

    @nn.compact
    def __call__(self, speech, speech_lengths):
        # (B, S) raw wave -> (B, T, F) sinc-filterbank frames
        from espnet_tpu.nn.preencoder import _mel_init_cutoffs
        K = self.stem_kernel
        cut = self.param(
            "cutoffs", lambda k, s: jnp.asarray(
                _mel_init_cutoffs(self.stem_filters, 16000.0)),
            (self.stem_filters, 2))
        low = jnp.abs(cut[:, 0])
        high = low + jnp.abs(cut[:, 1] - cut[:, 0])
        n = jnp.arange(-(K // 2), K // 2 + 1, dtype=jnp.float32)

        # safe denominator: where() alone leaks NaN through the grad of
        # the untaken branch at n == 0
        n_safe = jnp.where(n == 0, 1.0, n)

        def sinc(f):
            return jnp.where(n == 0, 2.0 * f[:, None],
                             jnp.sin(2.0 * jnp.pi * f[:, None] * n_safe)
                             / (jnp.pi * n_safe))

        filt = (sinc(high) - sinc(low)) * jnp.asarray(
            np.hamming(K).astype(np.float32))[None]
        filt = filt / jnp.maximum(
            jnp.max(jnp.abs(filt), axis=1, keepdims=True), 1e-8)
        x = jax.lax.conv_general_dilated(
            speech[:, :, None], filt.T[:, None, :],
            window_strides=(self.stem_stride,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))
        x = nn.LayerNorm(name="stem_norm")(jnp.log1p(jnp.abs(x)))
        lens = speech_lengths // self.stem_stride
        x1 = Bottle2neck(self.ndim, 3, 2, self.model_scale, pool=5,
                         name="layer1")(x)
        x2 = Bottle2neck(self.ndim, 3, 3, self.model_scale, pool=3,
                         name="layer2")(x1)
        x1p = nn.max_pool(x1, (3,), strides=(3,), padding="SAME")
        T = min(x1p.shape[1], x2.shape[1])
        x3 = Bottle2neck(self.ndim, 3, 4, self.model_scale,
                         name="layer3")(x1p[:, :T] + x2[:, :T])
        h = jnp.concatenate([x1p[:, :T], x2[:, :T], x3[:, :T]], axis=-1)
        h = nn.relu(nn.Conv(self.out_channels, (1,), name="layer4")(h))
        return h, jnp.maximum(lens // 15, 1)


class SKAttention(nn.Module):
    """Selective-kernel attention (SKA-TDNN;
    espnet2/spk/encoder/ska_tdnn_encoder.py:155,195,269): two parallel
    convs of different kernels, softmax gate over the branch axis from
    pooled stats. axis='channel' gates per channel (cwSKA), axis='freq'
    per frequency bin (fwSKA). Input (B, T, F, C)."""

    kernels: tuple = (3, 5)
    axis: str = "channel"
    reduction: int = 4
    min_d: int = 16

    @nn.compact
    def __call__(self, x):
        B, T, F, C = x.shape
        branches = [
            nn.LayerNorm(name=f"bn{i}")(nn.relu(
                nn.Conv(C, (k, k), padding="SAME", name=f"conv{i}")(x)))
            for i, k in enumerate(self.kernels)]
        U = sum(branches)
        if self.axis == "channel":
            S = jnp.mean(U, axis=(1, 2))           # (B, C)
            n_sel = C
        else:
            S = jnp.mean(U, axis=(1, 3))           # (B, F)
            n_sel = F
        D = max(self.min_d, n_sel // self.reduction)
        Z = nn.relu(nn.Dense(D, name="fc")(S))
        ws = [nn.Dense(n_sel, name=f"fcs{i}")(Z)
              for i in range(len(self.kernels))]
        w = jax.nn.softmax(jnp.stack(ws, axis=0), axis=0)  # (K, B, n)
        if self.axis == "channel":
            w = w[:, :, None, None, :]
        else:
            w = w[:, :, None, :, None]
        return sum(wk * bk for wk, bk in zip(w, branches))


class SkaResBlock(nn.Module):
    """SKA-TDNN ResBlock (ska_tdnn_encoder.py:107): 3x3 conv then
    frequency-wise and channel-wise selective-kernel attention."""

    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        res = x
        h = nn.LayerNorm(name="bn1")(nn.relu(
            nn.Conv(self.channels, (3, 3), strides=(1, self.stride),
                    padding="SAME", name="conv1")(x)))
        h = SKAttention(axis="freq", name="skfwse")(h)
        h = SKAttention(axis="channel", name="skcwse")(h)
        if self.stride != 1 or res.shape[-1] != self.channels:
            res = nn.Conv(self.channels, (1, 1),
                          strides=(1, self.stride), name="down")(res)
        return nn.relu(h + res)


class SkaTdnnEncoder(nn.Module):
    """SKA-TDNN (Mun et al. 2022; ska_tdnn_encoder.py): a 2D conv
    front with fw/cw selective-kernel ResBlocks striding over frequency,
    flattened into the ECAPA dilated-block stack."""

    channels: int = 32
    num_res_blocks: int = 2
    tdnn_channels: int = 128
    num_blocks: int = 2

    @nn.compact
    def __call__(self, feats):
        # feats (B, T, F) -> (B, T, F, C)
        h = feats[..., None]
        h = nn.LayerNorm(name="stem_norm")(nn.relu(
            nn.Conv(self.channels, (3, 3), padding="SAME",
                    name="stem")(h)))
        for i in range(self.num_res_blocks):
            h = SkaResBlock(self.channels, stride=2, name=f"res{i}")(h)
        B, T, Fr, C = h.shape
        h = h.reshape(B, T, Fr * C)
        h = nn.relu(nn.LayerNorm(name="norm_in")(
            nn.Conv(self.tdnn_channels, (5,), padding="SAME",
                    name="conv_in")(h)))
        outs = []
        for i in range(self.num_blocks):
            h = SERes2NetBlock(self.tdnn_channels, dilation=2 ** i,
                               name=f"block{i}")(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)
        return nn.relu(nn.Conv(self.tdnn_channels, (1,), name="mfa")(h))


class XVectorEncoder(nn.Module):
    """Classic x-vector TDNN (Snyder et al. 2018;
    espnet2/spk/encoder/xvector_encoder.py): five frame-level TDNN
    layers — kernel/dilation (5,1),(3,2),(3,3),(1,1),(1,1) — widening
    into a large pre-pooling layer. LayerNorm replaces BatchNorm (same
    normalization role, batch-size independent, jit-friendly)."""

    channels: int = 512
    out_channels: int = 1500

    @nn.compact
    def __call__(self, feats):
        h = feats
        for i, (k, d, c) in enumerate(
                [(5, 1, self.channels), (3, 2, self.channels),
                 (3, 3, self.channels), (1, 1, self.channels),
                 (1, 1, self.out_channels)]):
            h = nn.Conv(c, (k,), kernel_dilation=(d,), padding="SAME",
                        name=f"tdnn{i}")(h)
            h = nn.relu(nn.LayerNorm(name=f"norm{i}")(h))
        return h


def aam_softmax_loss(emb, weight, labels, margin=0.2,
                     scale: float = 30.0):
    """ArcFace AAM-softmax (spk/loss/aamsoftmax.py).

    emb: (B, D) embeddings; weight: (n_spk, D) class centers.
    """
    emb_n = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True),
                              1e-9)
    w_n = weight / jnp.maximum(jnp.linalg.norm(weight, axis=1, keepdims=True),
                               1e-9)
    cos = emb_n @ w_n.T  # (B, n_spk)
    theta = jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
    target_cos = jnp.cos(theta + margin)
    onehot = jax.nn.one_hot(labels, weight.shape[0])
    logits = scale * (onehot * target_cos + (1 - onehot) * cos)
    loss = -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1),
                             axis=-1))
    acc = jnp.mean((jnp.argmax(cos, axis=-1) == labels).astype(jnp.float32))
    return loss, acc


SPK_ENCODERS = {"ecapa": EcapaEncoder, "rawnet3": RawNet3Encoder,
                "ska_tdnn": SkaTdnnEncoder, "xvector": XVectorEncoder}


class SpeakerModel(nn.Module):
    n_spk: int
    frontend_conf: dict = None
    encoder_name: str = "ecapa"  # ecapa | rawnet3 | ska_tdnn | xvector
    encoder_conf: dict = None
    embed_dim: int = 192
    aam_margin: float = 0.2
    aam_scale: float = 30.0

    def setup(self):
        fc = dict(self.frontend_conf or {"n_fft": 512, "hop_length": 160,
                                         "n_mels": 80})
        self._frontend = DefaultFrontend(**fc)
        self.encoder = SPK_ENCODERS[self.encoder_name](
            **dict(self.encoder_conf or {}))
        self.pooling = AttnStatPooling()
        self.projector = nn.Dense(self.embed_dim)
        self.aam_weight = self.param(
            "aam_weight", nn.initializers.xavier_uniform(),
            (self.n_spk, self.embed_dim))

    def extract_embedding(self, speech, speech_lengths):
        if self.encoder_name == "rawnet3":
            # raw-waveform path: the sinc stem IS the frontend
            h, flens = self.encoder(speech, speech_lengths)
        else:
            feats, flens = self._frontend(speech, speech_lengths)
            h = self.encoder(feats)
        pooled = self.pooling(h, make_non_pad_mask(flens, h.shape[1]))
        return self.projector(pooled)

    def __call__(self, speech, speech_lengths, spk_labels,
                 spk_labels_lengths=None, margin=None,
                 *, deterministic=True):
        """margin: optional per-batch scalar overriding the static AAM
        margin (fed by the Trainer's batch_extras_fn — the reference's
        epoch margin scheduler, spk_trainer.py role)."""
        emb = self.extract_embedding(speech, speech_lengths)
        labels = spk_labels[:, 0] if spk_labels.ndim > 1 else spk_labels
        m = self.aam_margin if margin is None else jnp.reshape(margin, ())
        loss, acc = aam_softmax_loss(emb, self.aam_weight, labels,
                                     m, self.aam_scale)
        stats = {"loss": loss, "acc": acc}
        if margin is not None:
            stats["margin"] = m
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)
