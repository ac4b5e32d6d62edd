"""Self-supervised pretraining: HuBERT-style masked prediction.

Behavioral contract: espnet2/hubert/espnet_model.py (+ espnet2/ssl/) —
masked frames are replaced by a learned mask embedding; the encoder
predicts pseudo-labels (k-means cluster ids) at masked (and optionally
unmasked) positions; loss = weighted CE over masked/unmasked sets
(torchaudio-style hubert_pretrain_model behavior).

TPU-first: span masking is computed on device with jax.random per step
(static shapes, boolean combine of random spans), so pretraining is one
fused program like any other task.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.frontends.default import DefaultFrontend, UtteranceMVN
from espnet_tpu.models.asr import ENCODER_CLASSES
from espnet_tpu.utils.masks import make_non_pad_mask


def span_mask(rng, B: int, T: int, lengths, mask_prob: float = 0.08,
              mask_length: int = 10):
    """Sample HuBERT-style span masks: each frame starts a span with
    prob mask_prob; spans extend mask_length frames."""
    starts = jax.random.bernoulli(rng, mask_prob, (B, T))
    # dilate starts into spans via max-pool over a window
    pad = jnp.zeros((B, mask_length - 1), bool)
    ext = jnp.concatenate([pad, starts], axis=1)
    idx = jnp.arange(T)[None, :, None] + jnp.arange(mask_length)[None, None, :]
    spans = jnp.any(ext[:, idx[0]], axis=2)
    valid = make_non_pad_mask(lengths, T)
    return spans & valid


class HubertModel(nn.Module):
    num_classes: int = 100          # k-means clusters
    frontend_conf: dict = None
    encoder: str = "transformer"
    encoder_conf: dict = None
    mask_prob: float = 0.08
    mask_length: int = 10
    masked_weight: float = 1.0
    unmasked_weight: float = 0.0

    def setup(self):
        fc = dict(self.frontend_conf or {"n_fft": 512, "hop_length": 320,
                                         "n_mels": 80})
        self._frontend = DefaultFrontend(**fc)
        self._normalize = UtteranceMVN()
        enc_conf = dict(self.encoder_conf or {})
        enc_conf.setdefault("input_layer", "linear")
        self.encoder_mod = ENCODER_CLASSES[self.encoder](
            input_size=fc.get("n_mels", 80), **enc_conf)
        d = enc_conf.get("output_size", 256)
        self.mask_embed = self.param("mask_embed",
                                     nn.initializers.normal(0.1),
                                     (fc.get("n_mels", 80),))
        self.final_proj = nn.Dense(self.num_classes)

    def encode(self, speech, speech_lengths, *, deterministic=True):
        """Inference-time feature extraction (no masking)."""
        feats, flens = self._frontend(speech, speech_lengths)
        feats, flens = self._normalize(feats, flens)
        return self.encoder_mod(feats, flens, deterministic=deterministic)

    def __call__(self, speech, speech_lengths, text, text_lengths, *,
                 deterministic=True):
        """text = frame-level pseudo-label ids (B, T_lab)."""
        feats, flens = self._frontend(speech, speech_lengths)
        feats, flens = self._normalize(feats, flens)
        B, T, F = feats.shape
        if not deterministic:
            rng = self.make_rng("mask")
        else:
            rng = jax.random.PRNGKey(0)
        mask = span_mask(rng, B, T, flens, self.mask_prob, self.mask_length)
        feats = jnp.where(mask[:, :, None],
                          self.mask_embed[None, None, :], feats)
        enc, olens = self.encoder_mod(feats, flens,
                                      deterministic=deterministic)
        logits = self.final_proj(enc)
        # align labels to encoder frames
        T_enc = logits.shape[1]
        labels = text[:, :T_enc]
        if labels.shape[1] < T_enc:
            labels = jnp.pad(labels, ((0, 0), (0, T_enc - labels.shape[1])))
        # assume no subsampling (linear input layer); mask applies 1:1
        m_enc = mask[:, :T_enc]
        valid = make_non_pad_mask(jnp.minimum(olens, text_lengths), T_enc)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        masked = m_enc & valid
        unmasked = ~m_enc & valid
        loss_m = jnp.sum(jnp.where(masked, nll, 0.0)) / jnp.maximum(
            jnp.sum(masked), 1)
        loss_u = jnp.sum(jnp.where(unmasked, nll, 0.0)) / jnp.maximum(
            jnp.sum(unmasked), 1)
        loss = self.masked_weight * loss_m + self.unmasked_weight * loss_u
        pred = jnp.argmax(logits, axis=-1)
        acc_m = jnp.sum(jnp.where(masked, pred == labels, 0)) / jnp.maximum(
            jnp.sum(masked), 1)
        stats = {"loss": loss, "loss_masked": loss_m,
                 "loss_unmasked": loss_u, "acc_masked": acc_m}
        return loss, stats, jnp.asarray(B, jnp.float32)


class ConvFeatureExtractor(nn.Module):
    """wav2vec2 conv waveform encoder (fairseq ConvFeatureExtractionModel
    role, espnet2 ssl interop surface): strided 1-D conv stack with
    LayerNorm + GELU; static shapes, lengths tracked per layer."""

    layers: tuple = ((64, 10, 5), (64, 3, 2), (64, 3, 2))  # (dim, k, s)

    @nn.compact
    def __call__(self, speech, speech_lengths):
        h = speech[:, :, None]
        lens = speech_lengths
        for i, (dim, k, s) in enumerate(self.layers):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        name=f"conv{i}")(h)
            h = nn.LayerNorm(name=f"ln{i}")(h)
            h = nn.gelu(h)
            lens = jnp.maximum((lens - k) // s + 1, 1)
        return h, lens.astype(jnp.int32)


class GumbelVectorQuantizer(nn.Module):
    """Product quantizer with straight-through Gumbel-softmax
    (fairseq gumbel_vector_quantizer role): G groups x V entries."""

    groups: int = 2
    entries: int = 40
    vq_dim: int = 64

    @nn.compact
    def __call__(self, x, rng, temperature: float = 2.0, *, hard=True):
        B, T, _ = x.shape
        G, V = self.groups, self.entries
        logits = nn.Dense(G * V, name="proj")(x).reshape(B, T, G, V)
        codebook = self.param(
            "codebook", nn.initializers.normal(1.0), (G, V, self.vq_dim // G))
        if hard:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rng, logits.shape, minval=1e-6,
                                   maxval=1.0 - 1e-6)))
            y_soft = jax.nn.softmax((logits + g) / temperature, axis=-1)
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, V, dtype=y_soft.dtype)
            # straight-through: hard forward, soft gradient
            y = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            y = jax.nn.one_hot(jnp.argmax(logits, -1), V,
                               dtype=logits.dtype)
        q = jnp.einsum("btgv,gvd->btgd", y, codebook).reshape(
            B, T, self.vq_dim)
        # codebook usage: mean softmax prob per entry -> perplexity per
        # group (the diversity-loss statistic, wav2vec2 eq. 4)
        avg = jnp.mean(jax.nn.softmax(logits.astype(jnp.float32), -1),
                       axis=(0, 1))  # (G, V)
        perp = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-9), axis=-1))  # (G,)
        return q, perp


class Wav2Vec2Model(nn.Module):
    """wav2vec 2.0 contrastive pretraining (fairseq wav2vec2 /
    espnet2 ssl-frontend training contract): conv features -> span mask
    -> transformer context network; InfoNCE between context outputs and
    the quantized latents of masked positions against K distractors
    drawn from the same utterance, plus codebook-diversity and feature
    L2 penalties.

    TPU-first: masking, distractor sampling, and the Gumbel quantizer
    all run on device with static shapes; accidental-positive
    distractors are excluded by masking their logits, not by resampling
    (no data-dependent shapes)."""

    frontend_conf: dict = None           # ConvFeatureExtractor layers
    encoder: str = "transformer"
    encoder_conf: dict = None
    quantizer_conf: dict = None
    mask_prob: float = 0.065
    mask_length: int = 10
    num_negatives: int = 10
    logit_temp: float = 0.1
    gumbel_temp: float = 2.0
    diversity_weight: float = 0.1
    feature_penalty_weight: float = 10.0

    def setup(self):
        fc = dict(self.frontend_conf or {})
        self.feature_extractor = ConvFeatureExtractor(**fc)
        feat_dim = self.feature_extractor.layers[-1][0]
        enc_conf = dict(self.encoder_conf or {})
        enc_conf.setdefault("input_layer", "linear")
        self.encoder_mod = ENCODER_CLASSES[self.encoder](
            input_size=feat_dim, **enc_conf)
        d = enc_conf.get("output_size", 256)
        qc = dict(self.quantizer_conf or {})
        qc.setdefault("vq_dim", d)
        self.quantizer = GumbelVectorQuantizer(**qc)
        self.vq_dim = qc["vq_dim"]
        self.final_proj = nn.Dense(self.vq_dim)
        self.mask_embed = self.param("mask_embed",
                                     nn.initializers.normal(0.1),
                                     (feat_dim,))

    def encode(self, speech, speech_lengths, *, deterministic=True):
        """Feature extraction for downstream use (no masking)."""
        feats, flens = self.feature_extractor(speech, speech_lengths)
        return self.encoder_mod(feats, flens, deterministic=deterministic)

    def __call__(self, speech, speech_lengths, *, deterministic=True):
        feats, flens = self.feature_extractor(speech, speech_lengths)
        B, T, F = feats.shape
        pen = jnp.mean(feats.astype(jnp.float32) ** 2)
        if not deterministic:
            r_mask, r_neg, r_gum = jax.random.split(
                self.make_rng("mask"), 3)
        else:
            r_mask, r_neg, r_gum = jax.random.split(
                jax.random.PRNGKey(0), 3)
        mask = span_mask(r_mask, B, T, flens, self.mask_prob,
                         self.mask_length)
        # targets quantize the UNMASKED features
        q, perp = self.quantizer(feats, r_gum,
                                 temperature=self.gumbel_temp,
                                 hard=not deterministic)
        masked_feats = jnp.where(mask[:, :, None],
                                 self.mask_embed[None, None, :], feats)
        ctx, olens = self.encoder_mod(masked_feats, flens,
                                      deterministic=deterministic)
        c = self.final_proj(ctx)[:, :T]

        # K distractors per position, uniform over each utterance's
        # valid frames (fairseq sample_negatives); accidental positives
        # are masked out of the softmax below
        K = self.num_negatives
        neg_idx = jax.random.randint(r_neg, (B, T, K), 0, 2 ** 30) % \
            jnp.maximum(flens, 1)[:, None, None]          # (B, T, K)
        negs = jnp.take_along_axis(
            q[:, :, None, :], jnp.broadcast_to(
                neg_idx[..., None], (B, T, K, q.shape[-1])), axis=1)

        def cos(a, b):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
            return jnp.sum(a * b, axis=-1)

        pos = cos(c, q)[..., None]                         # (B, T, 1)
        neg = cos(c[:, :, None, :], negs)                  # (B, T, K)
        is_pos = neg_idx == jnp.arange(T)[None, :, None]
        neg = jnp.where(is_pos, -jnp.inf, neg)
        logits = jnp.concatenate([pos, neg], axis=-1) / self.logit_temp
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -logp[..., 0]                                # (B, T)
        sel = mask & make_non_pad_mask(flens, T)
        n_sel = jnp.maximum(jnp.sum(sel), 1)
        loss_c = jnp.sum(jnp.where(sel, nll, 0.0)) / n_sel
        G, V = self.quantizer.groups, self.quantizer.entries
        loss_d = (G * V - jnp.sum(perp)) / (G * V)
        loss = (loss_c + self.diversity_weight * loss_d
                + self.feature_penalty_weight * pen)
        acc = jnp.sum(jnp.where(sel, jnp.argmax(logits, -1) == 0, 0)) / n_sel
        stats = {"loss": loss, "loss_contrastive": loss_c,
                 "loss_diversity": loss_d, "feature_penalty": pen,
                 "codebook_perplexity": jnp.mean(perp),
                 "acc_contrastive": acc}
        return loss, stats, jnp.asarray(B, jnp.float32)
