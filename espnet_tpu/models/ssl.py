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
