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


def aam_softmax_loss(emb, weight, labels, margin: float = 0.2,
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


class SpeakerModel(nn.Module):
    n_spk: int
    frontend_conf: dict = None
    encoder_conf: dict = None
    embed_dim: int = 192
    aam_margin: float = 0.2
    aam_scale: float = 30.0

    def setup(self):
        fc = dict(self.frontend_conf or {"n_fft": 512, "hop_length": 160,
                                         "n_mels": 80})
        self._frontend = DefaultFrontend(**fc)
        self.encoder = EcapaEncoder(**dict(self.encoder_conf or {}))
        self.pooling = AttnStatPooling()
        self.projector = nn.Dense(self.embed_dim)
        self.aam_weight = self.param(
            "aam_weight", nn.initializers.xavier_uniform(),
            (self.n_spk, self.embed_dim))

    def extract_embedding(self, speech, speech_lengths):
        feats, flens = self._frontend(speech, speech_lengths)
        h = self.encoder(feats)
        pooled = self.pooling(h, make_non_pad_mask(flens, h.shape[1]))
        return self.projector(pooled)

    def __call__(self, speech, speech_lengths, spk_labels,
                 spk_labels_lengths=None, *, deterministic=True):
        emb = self.extract_embedding(speech, speech_lengths)
        labels = spk_labels[:, 0] if spk_labels.ndim > 1 else spk_labels
        loss, acc = aam_softmax_loss(emb, self.aam_weight, labels,
                                     self.aam_margin, self.aam_scale)
        stats = {"loss": loss, "acc": acc}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)
