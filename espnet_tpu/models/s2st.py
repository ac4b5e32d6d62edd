"""Speech-to-speech translation: discrete-unit and spectral pipelines.

Behavioral contract: espnet2/s2st/ (synthesizers over discrete units /
spectra; bin/s2st_inference.py Speech2Speech). Two families:

- Unit-based: the translation model is the shared hybrid attention
  architecture predicting TARGET-LANGUAGE CODEC UNITS (first-quantizer
  codes of models/codec.py); synthesis decodes units back to waveform
  with the codec decoder — the discrete-unit S2ST recipe family.
- Spectral (Translatotron): SpectralS2STModel below — direct
  speech-to-spectrogram with auxiliary ASR/ST heads
  (espnet2/s2st/synthesizer/translatotron.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax

import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.beam_search import BeamSearchConfig, batch_beam_search
from espnet_tpu.models.asr import ASRModel
from espnet_tpu.models.codec import CodecModel
from espnet_tpu.utils.masks import make_non_pad_mask


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


class SpectralS2STModel(nn.Module):
    """Translatotron: direct speech-to-spectrogram translation.

    Behavioral contract: espnet2/s2st/espnet_model.py (s2st_type
    'translatotron') + synthesizer/translatotron.py:25 — a speech encoder
    feeds (1) an AR Tacotron2-style spectrogram synthesizer attending over
    encoder states, (2) an auxiliary target-text attention decoder, and
    (3) an auxiliary source-text CTC head; loss = synthesis + asr_weight *
    CTC + st_weight * attention CE.

    TPU-first: both the source log-mel frontend and the target
    feats-extract run inside the jitted step; the AR synthesizer is one
    lax.scan (models/tts/tacotron2.py Tacotron2Decoder).
    """

    src_vocab_size: int = 0          # 0 disables the aux ASR CTC branch
    tgt_vocab_size: int = 0          # 0 disables the aux ST decoder branch
    frontend_conf: Optional[dict] = None
    encoder: str = "conformer"
    encoder_conf: Optional[dict] = None
    synthesizer_conf: Optional[dict] = None
    tgt_feats_conf: Optional[dict] = None   # n_fft/hop_length/n_mels
    asr_weight: float = 0.3
    st_weight: float = 0.3
    lsm_weight: float = 0.1
    ignore_id: int = -1
    blank_id: int = 0

    def setup(self):
        from espnet_tpu.frontends.default import DefaultFrontend
        from espnet_tpu.models.asr import CTCHead, ENCODER_CLASSES
        from espnet_tpu.models.tts.tacotron2 import Tacotron2Decoder
        from espnet_tpu.nn.decoder import TransformerDecoder
        fc = dict(self.frontend_conf or {"n_fft": 512, "hop_length": 128,
                                         "n_mels": 80})
        self._src_frontend = DefaultFrontend(**fc)
        tfc = dict(self.tgt_feats_conf or fc)
        tfc.setdefault("n_mels", 80)
        self._tgt_feats = DefaultFrontend(**tfc)
        self._n_mels_tgt = tfc["n_mels"]
        enc_conf = dict(self.encoder_conf or {})
        self.encoder_mod = ENCODER_CLASSES[self.encoder](
            input_size=fc.get("n_mels", 80), **enc_conf)
        d_model = enc_conf.get("output_size", 256)
        sc = dict(self.synthesizer_conf or {})
        sc.setdefault("odim", self._n_mels_tgt)
        self.synth = Tacotron2Decoder(**sc)
        if self.tgt_vocab_size > 0:
            self.st_decoder = TransformerDecoder(
                self.tgt_vocab_size, encoder_output_size=d_model,
                attention_heads=max(d_model // 64, 2), linear_units=d_model * 4,
                num_blocks=2)
        if self.src_vocab_size > 0:
            self.asr_ctc = CTCHead(self.src_vocab_size)

    def encode(self, src_speech, src_speech_lengths, *, deterministic=True):
        feats, flens = self._src_frontend(src_speech, src_speech_lengths)
        return self.encoder_mod(feats, flens, deterministic=deterministic)

    def __call__(self, src_speech, src_speech_lengths,
                 tgt_speech, tgt_speech_lengths,
                 tgt_text=None, tgt_text_lengths=None,
                 src_text=None, src_text_lengths=None, *,
                 deterministic=True):
        from espnet_tpu.ops.losses import (add_sos_eos, ctc_loss,
                                           label_smoothing_loss)
        from espnet_tpu.utils.masks import make_non_pad_mask
        enc, enc_lens = self.encode(src_speech, src_speech_lengths,
                                    deterministic=deterministic)
        mem_mask = make_non_pad_mask(enc_lens, enc.shape[1])
        tgt_feats, tgt_flens = self._tgt_feats(tgt_speech,
                                               tgt_speech_lengths)
        loss_synth, stats, _ = self.synth(enc, mem_mask, tgt_feats,
                                          tgt_flens,
                                          deterministic=deterministic)
        stats = {f"synth_{k}": v for k, v in stats.items()}
        loss = loss_synth
        if self.tgt_vocab_size > 0 and tgt_text is not None:
            sos = eos = self.tgt_vocab_size - 1
            ys_in, ys_out = add_sos_eos(tgt_text, tgt_text_lengths, sos, eos,
                                        self.ignore_id)
            logits = self.st_decoder(enc, enc_lens, ys_in,
                                     tgt_text_lengths + 1,
                                     deterministic=deterministic)
            loss_st = label_smoothing_loss(logits, ys_out, self.lsm_weight,
                                           self.ignore_id)
            stats["loss_st"] = loss_st
            loss = loss + self.st_weight * loss_st
        if self.src_vocab_size > 0 and src_text is not None:
            logits = self.asr_ctc(enc, deterministic=deterministic)
            loss_asr = ctc_loss(logits, enc_lens, src_text,
                                src_text_lengths, self.blank_id)
            stats["loss_asr_ctc"] = loss_asr
            loss = loss + self.asr_weight * loss_asr
        stats["loss"] = loss
        return loss, stats, jnp.asarray(src_speech.shape[0], jnp.float32)

    def inference(self, src_speech, src_speech_lengths, *,
                  threshold: float = 0.5, max_frames: Optional[int] = None):
        """Source speech -> target log-mel spectrogram (+ lengths);
        vocoding (HiFiGAN / griffin-lim) happens outside, as in
        bin/s2st_inference.py."""
        from espnet_tpu.utils.masks import make_non_pad_mask
        enc, enc_lens = self.encode(src_speech, src_speech_lengths)
        mem_mask = make_non_pad_mask(enc_lens, enc.shape[1])
        return self.synth.inference(enc, mem_mask, threshold=threshold,
                                    max_frames=max_frames)


class GaussianUpsampling(nn.Module):
    """Differentiable duration-based upsampling
    (s2st/synthesizer/translatotron2.py:148): frame t soft-attends to
    token i with weight exp(-(t - c_i)^2 / 2sigma_i^2) where c_i is the
    token's duration-midpoint — one einsum, no gather loops."""

    @nn.compact
    def __call__(self, hs, durations, out_len: int):
        """hs (B, L, D), durations (B, L) int -> (B, out_len, D)."""
        d = durations.astype(jnp.float32)
        ends = jnp.cumsum(d, axis=1)
        centers = ends - d / 2.0
        sigma = jnp.maximum(d / 2.0, 0.5)
        t = jnp.arange(out_len, dtype=jnp.float32)[None, :, None]
        logits = -((t - centers[:, None, :]) ** 2) \
            / (2.0 * sigma[:, None, :] ** 2)
        logits = jnp.where((d > 0)[:, None, :], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1)          # (B, T, L)
        return jnp.einsum("btl,bld->btd", w, hs)


class Translatotron2Synthesizer(nn.Module):
    """Translatotron2 synthesizer (translatotron2.py:20, Jia et al.
    2022): NON-autoregressive — duration predictor over the (phoneme)
    decoder states, Gaussian upsampling, BLSTM synthesizer stack, linear
    mel head (+5-conv postnet). Replaces translatotron's AR attention
    decoder; removes the attention failure modes."""

    odim: int = 80
    layers: int = 2
    units: int = 256
    duration_chans: int = 256

    @nn.compact
    def __call__(self, hs, h_lengths, durations, out_len: int, *,
                 deterministic=True):
        """hs (B, L, D) decoder states; durations (B, L) target frames
        per token. -> (mel_before, mel_after, d_pred, olens)."""
        from espnet_tpu.models.tts.fastspeech2 import (Postnet,
                                                       VariancePredictor)
        from espnet_tpu.models.enh.separators import BLSTM
        tmask = make_non_pad_mask(h_lengths, hs.shape[1])
        d_pred = VariancePredictor(2, self.duration_chans,
                                   name="duration_predictor")(
            hs, tmask, deterministic=deterministic)
        up = GaussianUpsampling(name="upsample")(
            hs, jnp.where(tmask, durations, 0), out_len)
        h = up
        for i in range(self.layers):
            h = BLSTM(self.units, name=f"blstm{i}")(h)
            h = nn.Dense(up.shape[-1], name=f"proj{i}")(h)
        before = nn.Dense(self.odim, name="feat_out")(h)
        after = before + Postnet(self.odim, name="postnet")(
            before, deterministic=deterministic)
        olens = jnp.sum(jnp.where(tmask, durations, 0), axis=1)
        return before, after, d_pred, jnp.minimum(olens, out_len)


class Translatotron2Model(nn.Module):
    """Direct S2ST with a two-step decoder (espnet2/s2st/espnet_model.py
    s2st_type 'translatotron2'): speech encoder -> target-phoneme
    attention decoder (teacher-forced linguistic states) -> NAR
    Translatotron2Synthesizer over those states -> target mel. Loss =
    mel L1 (+postnet) + duration MSE + target-text CE."""

    tgt_vocab_size: int
    frontend_conf: Optional[dict] = None
    encoder: str = "conformer"
    encoder_conf: Optional[dict] = None
    synthesizer_conf: Optional[dict] = None
    tgt_feats_conf: Optional[dict] = None
    st_weight: float = 0.3
    lsm_weight: float = 0.1
    ignore_id: int = -1

    def setup(self):
        from espnet_tpu.frontends.default import DefaultFrontend
        from espnet_tpu.models.asr import ENCODER_CLASSES
        from espnet_tpu.nn.decoder import TransformerDecoder
        fc = dict(self.frontend_conf or {"n_fft": 512, "hop_length": 128,
                                         "n_mels": 80})
        self._src_frontend = DefaultFrontend(**fc)
        tfc = dict(self.tgt_feats_conf or fc)
        tfc.setdefault("n_mels", 80)
        self._tgt_feats = DefaultFrontend(**tfc)
        enc_conf = dict(self.encoder_conf or {})
        self.encoder_mod = ENCODER_CLASSES[self.encoder](
            input_size=fc.get("n_mels", 80), **enc_conf)
        d_model = enc_conf.get("output_size", 256)
        self.decoder_mod = TransformerDecoder(
            self.tgt_vocab_size, encoder_output_size=d_model,
            attention_heads=max(d_model // 64, 2),
            linear_units=d_model * 4, num_blocks=2)
        sc = dict(self.synthesizer_conf or {})
        sc.setdefault("odim", tfc["n_mels"])
        self.synth = Translatotron2Synthesizer(**sc)

    @property
    def sos_id(self):
        return self.tgt_vocab_size - 1

    def __call__(self, src_speech, src_speech_lengths, tgt_speech,
                 tgt_speech_lengths, tgt_text, tgt_text_lengths, *,
                 deterministic=True):
        from espnet_tpu.ops.losses import (accuracy, add_sos_eos,
                                           label_smoothing_loss)
        feats, flens = self._src_frontend(src_speech, src_speech_lengths)
        enc, enc_lens = self.encoder_mod(feats, flens,
                                         deterministic=deterministic)[:2]
        # target-phoneme decoder (teacher-forced); its hidden states are
        # the synthesizer's linguistic input
        ys_in, ys_out = add_sos_eos(tgt_text, tgt_text_lengths,
                                    self.sos_id, self.sos_id,
                                    self.ignore_id)
        logits, dec_states = self.decoder_mod(
            enc, enc_lens, ys_in, tgt_text_lengths + 1,
            deterministic=deterministic, return_hidden=True)
        loss_st = label_smoothing_loss(logits, ys_out, self.lsm_weight,
                                       self.ignore_id)
        # target mel + uniform durations over the L=|text|+1 states
        tmel, tmel_lens = self._tgt_feats(tgt_speech, tgt_speech_lengths)
        L = ys_in.shape[1]
        per_tok = tmel_lens // jnp.maximum(tgt_text_lengths + 1, 1)
        tok_mask = jnp.arange(L)[None, :] < (tgt_text_lengths + 1)[:, None]
        durations = jnp.where(tok_mask, per_tok[:, None], 0)
        before, after, d_pred, olens = self.synth(
            dec_states, tgt_text_lengths + 1, durations, tmel.shape[1],
            deterministic=deterministic)
        fmask = make_non_pad_mask(tmel_lens, tmel.shape[1])[:, :, None]
        n = jnp.maximum(jnp.sum(fmask), 1.0) * tmel.shape[-1]
        l1 = (jnp.sum(jnp.abs(jnp.where(fmask, before - tmel, 0.0)))
              + jnp.sum(jnp.abs(jnp.where(fmask, after - tmel, 0.0)))) / n
        log_d = jnp.log(durations.astype(jnp.float32) + 1.0)
        n_tok = jnp.maximum(jnp.sum(tok_mask), 1.0)
        dur_l = jnp.sum(jnp.where(tok_mask, (d_pred - log_d) ** 2,
                                  0.0)) / n_tok
        loss = l1 + dur_l + self.st_weight * loss_st
        stats = {"loss": loss, "synth_l1": l1, "duration_loss": dur_l,
                 "st_ce": loss_st,
                 "st_acc": accuracy(logits, ys_out, self.ignore_id)}
        return loss, stats, jnp.asarray(src_speech.shape[0], jnp.float32)


class UnityS2STModel(nn.Module):
    """UnitY two-pass direct S2ST (espnet2/s2st/synthesizer/
    unity_synthesizer.py role; Inaguma et al. 2023): speech encoder ->
    FIRST-pass target-TEXT decoder -> SECOND-pass discrete-UNIT decoder
    attending over the first pass's hidden states. Loss = text CE +
    unit CE; units realize as audio through the codec at inference
    (Speech2Speech pipeline)."""

    tgt_vocab_size: int
    unit_vocab_size: int
    frontend_conf: Optional[dict] = None
    encoder: str = "conformer"
    encoder_conf: Optional[dict] = None
    text_decoder_conf: Optional[dict] = None
    unit_decoder_conf: Optional[dict] = None
    text_weight: float = 0.3
    lsm_weight: float = 0.1
    ignore_id: int = -1

    def setup(self):
        from espnet_tpu.frontends.default import DefaultFrontend
        from espnet_tpu.models.asr import ENCODER_CLASSES
        from espnet_tpu.nn.decoder import TransformerDecoder
        fc = dict(self.frontend_conf or {"n_fft": 512, "hop_length": 128,
                                         "n_mels": 80})
        self._src_frontend = DefaultFrontend(**fc)
        enc_conf = dict(self.encoder_conf or {})
        self.encoder_mod = ENCODER_CLASSES[self.encoder](
            input_size=fc.get("n_mels", 80), **enc_conf)
        d_model = enc_conf.get("output_size", 256)
        tdc = dict(self.text_decoder_conf or {})
        tdc.setdefault("encoder_output_size", d_model)
        tdc.setdefault("attention_heads", max(d_model // 64, 2))
        tdc.setdefault("linear_units", d_model * 4)
        tdc.setdefault("num_blocks", 2)
        self.text_decoder = TransformerDecoder(self.tgt_vocab_size, **tdc)
        udc = dict(self.unit_decoder_conf or {})
        udc.setdefault("encoder_output_size", d_model)
        udc.setdefault("attention_heads", max(d_model // 64, 2))
        udc.setdefault("linear_units", d_model * 4)
        udc.setdefault("num_blocks", 2)
        self.unit_decoder = TransformerDecoder(self.unit_vocab_size, **udc)

    @property
    def text_sos(self):
        return self.tgt_vocab_size - 1

    @property
    def unit_sos(self):
        return self.unit_vocab_size - 1

    def __call__(self, src_speech, src_speech_lengths,
                 tgt_text, tgt_text_lengths, units, units_lengths, *,
                 deterministic=True):
        from espnet_tpu.ops.losses import (accuracy, add_sos_eos,
                                           label_smoothing_loss)
        feats, flens = self._src_frontend(src_speech, src_speech_lengths)
        enc, enc_lens = self.encoder_mod(feats, flens,
                                         deterministic=deterministic)[:2]
        ys_in, ys_out = add_sos_eos(tgt_text, tgt_text_lengths,
                                    self.text_sos, self.text_sos,
                                    self.ignore_id)
        t_logits, t_states = self.text_decoder(
            enc, enc_lens, ys_in, tgt_text_lengths + 1,
            deterministic=deterministic, return_hidden=True)
        loss_text = label_smoothing_loss(t_logits, ys_out, self.lsm_weight,
                                         self.ignore_id)
        # second pass: unit decoder attends over first-pass states
        us_in, us_out = add_sos_eos(units, units_lengths, self.unit_sos,
                                    self.unit_sos, self.ignore_id)
        u_logits = self.unit_decoder(
            t_states, tgt_text_lengths + 1, us_in, units_lengths + 1,
            deterministic=deterministic)
        loss_unit = label_smoothing_loss(u_logits, us_out, self.lsm_weight,
                                         self.ignore_id)
        loss = loss_unit + self.text_weight * loss_text
        stats = {"loss": loss, "unit_ce": loss_unit, "text_ce": loss_text,
                 "unit_acc": accuracy(u_logits, us_out, self.ignore_id),
                 "text_acc": accuracy(t_logits, ys_out, self.ignore_id)}
        return loss, stats, jnp.asarray(src_speech.shape[0], jnp.float32)
