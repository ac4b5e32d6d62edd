"""Speech-to-speech translation (discrete-unit pipeline).

Behavioral contract: espnet2/s2st/ (synthesizers over discrete units /
spectra; bin/s2st_inference.py Speech2Speech). Unit-based design: the
translation model is the shared hybrid attention architecture predicting
TARGET-LANGUAGE CODEC UNITS (first-quantizer codes of models/codec.py);
synthesis decodes units back to waveform with the codec decoder — the
discrete-unit S2ST recipe family.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.beam_search import BeamSearchConfig, batch_beam_search
from espnet_tpu.models.asr import ASRModel
from espnet_tpu.models.codec import CodecModel


class UnitTranslationModel(ASRModel):
    """ASRModel whose `text` targets are codec unit ids; vocabulary =
    codebook_size + specials. Inherits training/decoding unchanged."""


class Speech2Speech:
    """Inference pipeline: source speech -> unit beam decode -> codec
    synthesis (Speech2Speech contract of bin/s2st_inference.py)."""

    def __init__(self, translation_model: UnitTranslationModel,
                 translation_params, codec: CodecModel, codec_params,
                 beam_size: int = 5, maxlenratio: float = 0.5,
                 unit_offset: int = 1):
        self.model = translation_model
        self.params = translation_params
        self.codec = codec
        self.codec_params = codec_params
        self.beam_size = beam_size
        self.maxlenratio = maxlenratio
        self.unit_offset = unit_offset  # unit id = token id - offset

    def __call__(self, speech: np.ndarray, speech_lengths=None):
        if speech.ndim == 1:
            speech = speech[None]
        B = speech.shape[0]
        if speech_lengths is None:
            speech_lengths = np.full((B,), speech.shape[1], np.int32)
        enc, enc_lens = self.model.apply(
            self.params, jnp.asarray(speech), jnp.asarray(speech_lengths),
            method=self.model.encode)
        results = batch_beam_search(
            self.model, self.params, enc, enc_lens,
            BeamSearchConfig(beam_size=self.beam_size,
                             ctc_weight=min(self.model.ctc_weight, 0.5),
                             maxlenratio=self.maxlenratio))
        wavs = []
        for hyps in results:
            ids, _ = hyps[0]
            units = np.asarray([i - self.unit_offset for i in ids
                                if i >= self.unit_offset], np.int32)
            if len(units) == 0:
                units = np.zeros((1,), np.int32)
            nq = self.codec.num_quantizers
            codes = np.zeros((1, len(units), nq), np.int32)
            codes[0, :, 0] = np.clip(units, 0, self.codec.codebook_size - 1)
            wav = self.codec.apply(self.codec_params, jnp.asarray(codes),
                                   method=self.codec.decode)
            wavs.append(np.asarray(wav[0]))
        return wavs
