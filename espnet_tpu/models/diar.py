"""EEND-style speaker diarization.

Behavioral contract: espnet2/diar/espnet_model.py — encoder over
features -> per-frame per-speaker sigmoid activity; PIT binary
cross-entropy over speaker permutations (attractor decoder variant
deferred). DER-style frame accuracy in stats.
"""

from __future__ import annotations

import itertools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.frontends.default import DefaultFrontend, UtteranceMVN
from espnet_tpu.models.asr import ENCODER_CLASSES
from espnet_tpu.utils.masks import make_non_pad_mask


def pit_bce_loss(logits, labels, valid_mask):
    """logits/labels: (B, T, S) — min BCE over speaker permutations."""
    S = logits.shape[-1]
    perms = list(itertools.permutations(range(S)))
    losses = []
    m = valid_mask[:, :, None]
    n = jnp.maximum(jnp.sum(valid_mask, axis=1), 1)[:, None]
    for p in perms:
        l_p = logits[:, :, list(p)]
        bce = optax_sigmoid_bce(l_p, labels)
        bce = jnp.where(m, bce, 0.0)
        losses.append(jnp.sum(bce, axis=(1, 2)) / (n[:, 0] * S))
    losses = jnp.stack(losses, axis=1)
    best = jnp.argmin(losses, axis=1)
    return jnp.take_along_axis(losses, best[:, None], axis=1)[:, 0], best


def optax_sigmoid_bce(logits, labels):
    logp = jax.nn.log_sigmoid(logits)
    log1mp = jax.nn.log_sigmoid(-logits)
    return -(labels * logp + (1 - labels) * log1mp)


class EncoderDecoderAttractor(nn.Module):
    """EEND-EDA attractor module (espnet2/diar/attractor/rnn_attractors.py):
    LSTM encoder consumes (time-shuffled) frame embeddings; LSTM decoder
    emits one attractor per step from zero inputs; existence probability
    per attractor decides the active speaker count."""

    unit: int = 256

    def setup(self):
        self.enc_rnn = nn.RNN(nn.OptimizedLSTMCell(self.unit),
                              return_carry=True)
        self.dec_cell = nn.OptimizedLSTMCell(self.unit)
        self.existence = nn.Dense(1)

    def __call__(self, emb, lengths, n_attractors: int):
        """emb: (B, T, D), lengths: (B,) -> (attractors (B, A, unit),
        exist_logits (B, A))."""
        B, T, D = emb.shape
        carry, _ = self.enc_rnn(emb, seq_lengths=lengths)
        dec_carry = carry
        zeros = jnp.zeros((B, self.unit))
        atts, exists = [], []
        for _ in range(n_attractors):
            dec_carry, h = self.dec_cell(dec_carry, zeros)
            atts.append(h)
            exists.append(self.existence(h)[:, 0])
        return jnp.stack(atts, axis=1), jnp.stack(exists, axis=1)


class DiarizationModel(nn.Module):
    num_spk: int = 2
    frontend_conf: dict = None
    encoder: str = "transformer"
    encoder_conf: dict = None
    use_attractor: bool = False   # EEND-EDA variant

    def setup(self):
        fc = dict(self.frontend_conf or {"n_fft": 512, "hop_length": 128,
                                         "n_mels": 23})
        self._frontend = DefaultFrontend(**fc)
        self._normalize = UtteranceMVN()
        enc_conf = dict(self.encoder_conf or {})
        enc_conf.setdefault("input_layer", "linear")
        self.encoder_mod = ENCODER_CLASSES[self.encoder](
            input_size=fc.get("n_mels", 23), **enc_conf)
        if self.use_attractor:
            self.attractor = EncoderDecoderAttractor(
                unit=enc_conf.get("output_size", 256))
        else:
            self.output = nn.Dense(self.num_spk)

    def predict(self, speech, speech_lengths, *, deterministic=True):
        feats, flens = self._frontend(speech, speech_lengths)
        feats, flens = self._normalize(feats, flens)
        enc, olens = self.encoder_mod(feats, flens,
                                      deterministic=deterministic)
        if self.use_attractor:
            atts, exist = self.attractor(enc, olens, self.num_spk)
            logits = jnp.einsum("btd,bad->bta", enc, atts)
            return logits, olens
        return self.output(enc), olens  # (B, T', S) logits

    def __call__(self, speech, speech_lengths, spk_labels,
                 spk_labels_lengths=None, *, deterministic=True):
        """spk_labels: (B, T_lab, S) 0/1 frame activity."""
        logits, olens = self.predict(speech, speech_lengths,
                                     deterministic=deterministic)
        T = min(logits.shape[1], spk_labels.shape[1])
        logits, labels = logits[:, :T], spk_labels[:, :T].astype(jnp.float32)
        valid = make_non_pad_mask(jnp.minimum(olens, T), T)
        per_utt, perm = pit_bce_loss(logits, labels, valid)
        loss = jnp.mean(per_utt)
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        acc = jnp.sum(jnp.where(valid[:, :, None], (pred == labels), 0)
                      ) / jnp.maximum(jnp.sum(valid) * labels.shape[-1], 1)
        return loss, {"loss": loss, "frame_acc": acc}, \
            jnp.asarray(speech.shape[0], jnp.float32)
