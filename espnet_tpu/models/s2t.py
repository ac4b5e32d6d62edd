"""S2T (OWSM-style) multitask model: prev-text-conditioned hybrid.

Behavioral contract: espnet2/s2t/espnet_model.py:25 (ESPnetS2TModel) —
the decoder input is ``[<sop>, text_prev, <sos>, text]`` when a previous
context is available (no ``<na>`` inside text_prev) and ``[<sos>, text]``
otherwise; targets score only ``[text, <eos>]`` (prev/condition positions
are ignore_id, espnet_model.py:421-447). The CTC branch trains on
``text_ctc`` — the plain transcript without the language/task/timestamp
condition tokens that live inside ``text`` (S2TPreprocessor contract).

TPU-first: the ragged per-row concatenation of the reference
(python list loop over utterances) is replaced by one vectorized
index-arithmetic construction over static (B, Lprev + Ltext + 2) shapes —
no host loop, no dynamic shapes, jit-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRModel
from espnet_tpu.ops.losses import (accuracy, ctc_loss, label_smoothing_loss)


def build_conditioned_io(text, text_lengths, text_prev, text_prev_lengths,
                         sos: int, eos: int, sop: int, na: int,
                         ignore_id: int = -1
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vectorized [sop, prev, sos, y] / [sos, y] construction.

    Returns (ys_in (B, M), ys_out (B, M), ys_in_lens (B,)) with
    M = Lprev + Ltext + 2; rows whose prev contains <na> fall back to the
    unconditioned [sos, y] layout (espnet_model.py:430-443 semantics).
    """
    B, Lt = text.shape
    Lp = text_prev.shape[1]
    M = Lp + Lt + 2
    j = jnp.arange(M)[None, :]                       # (1, M)
    lt = text_lengths[:, None]                       # (B, 1)
    pmask = jnp.arange(Lp)[None, :] < text_prev_lengths[:, None]
    avail = ~jnp.any((text_prev == na) & pmask, axis=1)   # (B,)
    lp = jnp.where(avail, text_prev_lengths, 0)[:, None]  # (B, 1)
    start = jnp.where(avail[:, None], lp + 2, 1)          # y starts here

    prev_tok = jnp.take_along_axis(
        text_prev, jnp.clip(j - 1, 0, max(Lp - 1, 0)), axis=1)
    y_in_tok = jnp.take_along_axis(
        text, jnp.clip(j - start, 0, Lt - 1), axis=1)
    ys_in = jnp.where(
        avail[:, None] & (j == 0), sop,
        jnp.where(j == start - 1, sos,
                  jnp.where(avail[:, None] & (j >= 1) & (j <= lp), prev_tok,
                            jnp.where((j >= start) & (j < start + lt),
                                      y_in_tok, eos))))

    y_out_tok = jnp.take_along_axis(
        text, jnp.clip(j - (start - 1), 0, Lt - 1), axis=1)
    ys_out = jnp.where(
        (j >= start - 1) & (j < start - 1 + lt), y_out_tok,
        jnp.where(j == start - 1 + lt, eos, ignore_id))

    ys_in_lens = jnp.where(avail, text_prev_lengths + text_lengths + 2,
                           text_lengths + 1)
    return ys_in.astype(text.dtype), ys_out.astype(text.dtype), \
        ys_in_lens.astype(text_lengths.dtype)


class S2TModel(ASRModel):
    """OWSM-style speech-to-text multitask model (prev-conditioned)."""

    sop: Optional[int] = None   # start-of-prev; default vocab_size - 2
    na: Optional[int] = None    # not-available marker; default vocab_size - 3

    @property
    def sop_id(self):
        return self.vocab_size - 2 if self.sop is None else self.sop

    @property
    def na_id(self):
        return self.vocab_size - 3 if self.na is None else self.na

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 text_prev=None, text_prev_lengths=None,
                 text_ctc=None, text_ctc_lengths=None, *,
                 deterministic=True):
        if text_prev is None:
            # degenerate to plain hybrid ASR behavior
            return super().__call__(speech, speech_lengths, text,
                                    text_lengths,
                                    deterministic=deterministic)
        if text_ctc is None:
            text_ctc, text_ctc_lengths = text, text_lengths
        enc, enc_lens = self.encode(speech, speech_lengths,
                                    deterministic=deterministic)
        stats = {}
        loss_ctc = jnp.asarray(0.0)
        if self.ctc_weight > 0.0:
            ctc_logits = self.ctc(enc, deterministic=deterministic)
            loss_ctc = ctc_loss(ctc_logits, enc_lens, text_ctc,
                                text_ctc_lengths, self.blank_id)
            stats["loss_ctc"] = loss_ctc
        loss_att = jnp.asarray(0.0)
        if self.decoder is not None and self.ctc_weight < 1.0:
            ys_in, ys_out, ys_in_lens = build_conditioned_io(
                text, text_lengths, text_prev, text_prev_lengths,
                self.sos_id, self.eos_id, self.sop_id, self.na_id,
                self.ignore_id)
            logits = self.decoder_mod(enc, enc_lens, ys_in, ys_in_lens,
                                      deterministic=deterministic)
            loss_att = label_smoothing_loss(
                logits, ys_out, self.lsm_weight, self.ignore_id,
                self.length_normalized_loss)
            stats["loss_att"] = loss_att
            stats["acc"] = accuracy(logits, ys_out, self.ignore_id)
        loss = self.ctc_weight * loss_ctc + (1.0 - self.ctc_weight) * loss_att
        stats["loss"] = loss
        weight = jnp.asarray(speech.shape[0], jnp.float32)
        return loss, stats, weight


class S2TCTCModel(S2TModel):
    """OWSM-CTC (espnet2/s2t/espnet_ctc_model.py): encoder-only
    multitask S2T. The language/task prompt (the text_prev stream)
    conditions the ENCODER — a pooled prompt embedding is added to
    every encoder frame (the reference's self-conditioned prompt
    encoder role) — and the objective is pure CTC over the text. No
    attention decoder exists; inference is greedy/prefix CTC."""

    def setup(self):
        super().setup()
        self.prompt_embed = nn.Embed(self.vocab_size,
                                     self.enc_output_size())

    def enc_output_size(self):
        return (self.encoder_conf or {}).get("output_size", 256)

    def encode_conditioned(self, speech, speech_lengths, text_prev,
                           text_prev_lengths, *, deterministic=True):
        enc, enc_lens = self.encode(speech, speech_lengths,
                                    deterministic=deterministic)
        if text_prev is not None:
            L = text_prev.shape[1]
            mask = (jnp.arange(L)[None] < text_prev_lengths[:, None]) \
                & (text_prev != self.na_id) & (text_prev >= 0)
            emb = self.prompt_embed(jnp.maximum(text_prev, 0))
            n = jnp.maximum(jnp.sum(mask, 1, keepdims=True), 1)
            pooled = jnp.sum(jnp.where(mask[..., None], emb, 0.0),
                             axis=1) / n
            enc = enc + pooled[:, None, :]
        return enc, enc_lens

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 text_prev=None, text_prev_lengths=None,
                 text_ctc=None, text_ctc_lengths=None, *,
                 deterministic=True):
        if text_ctc is None:
            text_ctc, text_ctc_lengths = text, text_lengths
        enc, enc_lens = self.encode_conditioned(
            speech, speech_lengths, text_prev, text_prev_lengths,
            deterministic=deterministic)
        ctc_logits = self.ctc(enc, deterministic=deterministic)
        loss = ctc_loss(ctc_logits, enc_lens, text_ctc,
                        text_ctc_lengths, self.blank_id)
        stats = {"loss": loss, "loss_ctc": loss}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)

    def greedy_ctc(self, params, speech, speech_lengths, text_prev=None,
                   text_prev_lengths=None):
        """Greedy CTC ids per utterance (list of python lists)."""
        import numpy as np
        enc, enc_lens = self.apply(
            params, speech, speech_lengths, text_prev,
            text_prev_lengths, method=self.encode_conditioned)
        logits = self.apply(params, enc, method=self.ctc_logits)
        ids = np.asarray(jnp.argmax(logits, axis=-1))
        lens = np.asarray(enc_lens)
        outs = []
        for b in range(ids.shape[0]):
            seq, prev = [], -1
            for t in range(int(lens[b])):
                i = int(ids[b, t])
                if i != prev and i != self.blank_id:
                    seq.append(i)
                prev = i
            outs.append(seq)
        return outs
