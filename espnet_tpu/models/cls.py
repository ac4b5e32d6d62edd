"""Audio classification / language-ID model.

Behavioral contract: espnet2/cls/espnet_model.py and espnet2/lid/ —
encoder over features + pooled linear classifier; covers the CLS and
LID tasks (multi-class; multi-label via sigmoid flag)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.frontends.default import DefaultFrontend, UtteranceMVN
from espnet_tpu.models.asr import ENCODER_CLASSES
from espnet_tpu.utils.masks import make_non_pad_mask


class ClassificationModel(nn.Module):
    n_classes: int
    frontend_conf: dict = None
    encoder: str = "transformer"
    encoder_conf: dict = None
    multilabel: bool = False

    def setup(self):
        fc = dict(self.frontend_conf or {"n_fft": 512, "hop_length": 128,
                                         "n_mels": 80})
        self._frontend = DefaultFrontend(**fc)
        self._normalize = UtteranceMVN()
        enc_conf = dict(self.encoder_conf or {})
        self.encoder_mod = ENCODER_CLASSES[self.encoder](
            input_size=fc.get("n_mels", 80), **enc_conf)
        self.classifier = nn.Dense(self.n_classes)

    def predict(self, speech, speech_lengths, *, deterministic=True):
        feats, flens = self._frontend(speech, speech_lengths)
        feats, flens = self._normalize(feats, flens)
        enc, olens = self.encoder_mod(feats, flens,
                                      deterministic=deterministic)
        mask = make_non_pad_mask(olens, enc.shape[1])[:, :, None]
        pooled = jnp.sum(jnp.where(mask, enc, 0.0), axis=1) / \
            jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        return self.classifier(pooled)

    def __call__(self, speech, speech_lengths, label, label_lengths=None, *,
                 deterministic=True):
        logits = self.predict(speech, speech_lengths,
                              deterministic=deterministic)
        # single-label rows may arrive length-bucket padded: take col 0
        y = label[:, 0] if (label.ndim > 1 and not self.multilabel) \
            else label
        if self.multilabel:
            logp = jax.nn.log_sigmoid(logits)
            log1mp = jax.nn.log_sigmoid(-logits)
            yf = y.astype(jnp.float32)
            loss = -jnp.mean(yf * logp + (1 - yf) * log1mp)
            acc = jnp.mean(((logits > 0) == (y > 0)).astype(jnp.float32))
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None],
                                                 axis=1)[:, 0])
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}, \
            jnp.asarray(speech.shape[0], jnp.float32)
