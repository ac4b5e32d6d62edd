"""TTS2: discrete-unit text-to-speech (FastSpeech2 bones, CE over units).

Behavioral contract: espnet2/tts2/ (1,445 LoC) + tasks/tts2.py — text ->
discrete speech units (SSL k-means / codec codes) with a non-autoregressive
FastSpeech-style model: encoder -> duration predictor -> length
regulator -> decoder -> per-frame softmax over the unit vocabulary,
trained with cross-entropy against extracted unit sequences
(`discrete_speech`, loaded as text_int data) and MSE duration loss.
Waveform synthesis happens by a separate unit vocoder / codec decoder
(bin/tts2_inference.py contract).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.fastspeech2 import (VariancePredictor,
                                               length_regulator)
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.utils.masks import make_non_pad_mask


class FastSpeech2Discrete(nn.Module):
    idim: int                      # text vocab
    odim: int = 512                # unit vocab
    adim: int = 256
    aheads: int = 2
    elayers: int = 4
    eunits: int = 1024
    dlayers: int = 4
    dunits: int = 1024
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 256
    dropout_rate: float = 0.2
    max_frames: int = 2048

    def setup(self):
        self.encoder = TransformerEncoder(
            input_size=self.idim, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.eunits,
            num_blocks=self.elayers, input_layer="embed",
            dropout_rate=self.dropout_rate)
        self.duration_predictor = VariancePredictor(
            self.duration_predictor_layers, self.duration_predictor_chans,
            dropout_rate=self.dropout_rate)
        self.decoder = TransformerEncoder(
            input_size=self.adim, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.dunits,
            num_blocks=self.dlayers, input_layer="linear",
            dropout_rate=self.dropout_rate)
        self.unit_out = nn.Dense(self.odim)

    def _core(self, text, text_lengths, durations, out_len, *,
              deterministic=True):
        hs, _ = self.encoder(text, text_lengths,
                             deterministic=deterministic)
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(hs, tmask,
                                         deterministic=deterministic)
        hs_exp, total = length_regulator(hs, durations, out_len)
        olens = jnp.minimum(total, out_len).astype(jnp.int32)
        h, _ = self.decoder(hs_exp, olens, deterministic=deterministic)
        return self.unit_out(h), d_pred, olens

    def __call__(self, text, text_lengths, discrete_speech,
                 discrete_speech_lengths, durations,
                 durations_lengths=None, *, deterministic=True):
        """-> (loss, stats, weight). discrete_speech: (B, T) unit ids."""
        out_len = discrete_speech.shape[1]
        logits, d_pred, olens = self._core(
            text, text_lengths, durations, out_len,
            deterministic=deterministic)
        fmask = make_non_pad_mask(discrete_speech_lengths, out_len)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = jnp.clip(discrete_speech, 0, self.odim - 1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        n = jnp.maximum(fmask.sum(), 1.0)
        unit_loss = jnp.sum(jnp.where(fmask, ce, 0.0)) / n
        acc = jnp.sum(jnp.where(
            fmask, (jnp.argmax(logits, -1) == tgt).astype(jnp.float32),
            0.0)) / n
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        log_d_tgt = jnp.log(durations.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum(jnp.where(tmask, (d_pred - log_d_tgt) ** 2,
                                     0.0)) / jnp.maximum(tmask.sum(), 1.0)
        loss = unit_loss + dur_loss
        stats = {"loss": loss, "unit_ce": unit_loss,
                 "duration_loss": dur_loss, "unit_acc": acc}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(self, text, text_lengths, *, speed: float = 1.0,
                  out_len: Optional[int] = None):
        """-> (units (B, Tmax) int32, olens)."""
        out_len = out_len or self.max_frames
        hs, _ = self.encoder(text, text_lengths, deterministic=True)
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(hs, tmask, deterministic=True)
        durations = jnp.clip(
            jnp.round((jnp.exp(d_pred) - 1.0) / speed), 0, None
        ).astype(jnp.int32)
        durations = jnp.where(tmask, durations, 0)
        logits, _, olens = self._core(text, text_lengths, durations,
                                      out_len, deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), olens
