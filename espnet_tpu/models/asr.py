"""Hybrid CTC/attention ASR model.

Behavioral contract: espnet2/asr/espnet_model.py:211-380 — encode =
frontend -> specaug -> normalize -> encoder; loss = ctc_weight * CTC +
(1-ctc_weight) * attention CE (label-smoothed) [+ interCTC]; returns
(loss, stats, weight).

TPU-first: the model is a flax module over pre-extracted features OR raw
speech; the frontend (pure function) and SpecAug (rng masking) run inside
the jitted train step. All shapes static; lengths are int32 vectors.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.frontends.default import DefaultFrontend, GlobalMVN, UtteranceMVN
from espnet_tpu.nn.branchformer import BranchformerEncoder, EBranchformerEncoder
from espnet_tpu.nn.conformer import ConformerEncoder
from espnet_tpu.nn.rnn_encoder import RNNEncoder
from espnet_tpu.nn.streaming_encoder import StreamingConformerEncoder
from espnet_tpu.nn.decoder import TransformerDecoder
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.ops.losses import (accuracy, add_sos_eos, ctc_loss,
                                   label_smoothing_loss)
from espnet_tpu.ops.specaug import specaug

ENCODER_CLASSES = {
    "transformer": TransformerEncoder,
    "conformer": ConformerEncoder,
    "branchformer": BranchformerEncoder,
    "e_branchformer": EBranchformerEncoder,
    "streaming_conformer": StreamingConformerEncoder,
    "rnn": RNNEncoder,
    "vgg_rnn": RNNEncoder,
}


def _custom_encoder(**kw):
    from espnet_tpu.nn.custom_encoder import CustomEncoder
    return CustomEncoder(**kw)


# heterogeneous block-DSL encoder (asr_transducer/encoder/building.py)
ENCODER_CLASSES["custom"] = _custom_encoder


def _multiconv_conformer(**kw):
    """Multiconvformer (asr/encoder/multiconvformer_encoder.py:48):
    conformer whose conv module is the multi-kernel CGMLP."""
    kw.setdefault("conv_module_type", "multicgmlp")
    return ConformerEncoder(**kw)


def _longformer(**kw):
    """Longformer-style sparse local attention
    (asr/encoder/longformer_encoder.py role): the transformer encoder
    with a banded attention window (splash kernel past the measured
    crossover on TPU; masked einsum below it)."""
    kw.setdefault("attention_window", 64)
    return TransformerEncoder(**kw)


def _avhubert(**kw):
    from espnet_tpu.nn.avhubert import AVHubertEncoder
    return AVHubertEncoder(**kw)


def _beats_encoder(**kw):
    """BEATs as an ASR encoder (asr/encoder/beats_encoder.py role): the
    SSL model's patch-embedding transformer backbone over fbank
    features, reused from models/beats.py."""
    from espnet_tpu.models.beats import BeatsBackboneEncoder
    return BeatsBackboneEncoder(**kw)


ENCODER_CLASSES["multiconv_conformer"] = _multiconv_conformer
ENCODER_CLASSES["multiconvformer"] = _multiconv_conformer
ENCODER_CLASSES["longformer"] = _longformer
ENCODER_CLASSES["avhubert"] = _avhubert
ENCODER_CLASSES["beats"] = _beats_encoder


class CTCHead(nn.Module):
    """Linear projection to vocab for CTC (espnet2/asr/ctc.py ctc_lo)."""

    vocab_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, h, *, deterministic=True):
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.vocab_size, name="ctc_lo")(h)


class ASRModel(nn.Module):
    """CTC/attention hybrid. config mirrors the reference YAML keys."""

    vocab_size: int
    token_list: tuple = ()
    frontend: str = "default"                # default | wav2vec2 (SSL)
    frontend_conf: Optional[dict] = None      # None -> features are input
    specaug_conf: Optional[dict] = None
    normalize: Optional[str] = None           # "global_mvn"|"utterance_mvn"|None
    normalize_stats: Any = None               # GlobalMVN instance
    encoder: str = "transformer"
    encoder_conf: dict = None
    preencoder: Optional[str] = None          # "linear" | "sinc"
    preencoder_conf: dict = None
    postencoder: Optional[str] = None         # "length_adaptor"
    postencoder_conf: dict = None
    decoder: Optional[str] = "transformer"
    decoder_conf: dict = None
    ctc_weight: float = 0.5
    ctc_conf: dict = None   # {"ctc_type": "builtin"|"brctc", risk_* opts}
    interctc_weight: float = 0.0
    lsm_weight: float = 0.0
    length_normalized_loss: bool = False
    ignore_id: int = -1
    blank_id: int = 0
    sos: Optional[int] = None   # default vocab_size - 1
    eos: Optional[int] = None

    def setup(self):
        enc_conf = dict(self.encoder_conf or {})
        if self.frontend_conf is None:
            input_size = enc_conf.pop("input_size", 80)
        elif self.frontend == "wav2vec2":
            input_size = (self.frontend_conf or {}).get("hidden_size", 768)
        elif self.frontend == "whisper":
            input_size = (self.frontend_conf or {}).get("d_model", 384)
        elif self.frontend == "hugging_face":
            input_size = ((self.frontend_conf or {}).get("hf_config")
                          or {}).get("hidden_size", 128)
        elif self.frontend == "sliding_window":
            fc = self.frontend_conf or {}
            input_size = fc.get("win_length", 400) * fc.get("channels", 1)
        elif self.frontend == "fused":
            fc = self.frontend_conf or {}
            input_size = (fc.get("proj_dim", 100)
                          * max(len(fc.get("frontends", ())), 1))
        else:
            input_size = (self.frontend_conf or {}).get("n_mels", 80)
        if self.preencoder == "linear":
            input_size = (self.preencoder_conf or {}).get("output_size",
                                                          input_size)
        elif self.preencoder == "sinc":
            input_size = (self.preencoder_conf or {}).get("out_channels",
                                                          256)
        enc_cls = ENCODER_CLASSES[self.encoder]
        if self.interctc_weight > 0 and "interctc_layer_idx" not in enc_conf:
            n = enc_conf.get("num_blocks", 6)
            enc_conf["interctc_layer_idx"] = (max(n // 2, 1),)
        self.encoder_mod = enc_cls(input_size=input_size, **enc_conf)
        if self.ctc_weight > 0.0:
            self.ctc = CTCHead(self.vocab_size)
        if self.decoder is not None and self.ctc_weight < 1.0:
            d_conf = dict(self.decoder_conf or {})
            d_conf.setdefault("encoder_output_size",
                              enc_conf.get("output_size", 256))
            if self.decoder == "rnn":
                from espnet_tpu.nn.rnn_decoder import RNNDecoder
                self.decoder_mod = RNNDecoder(self.vocab_size, **d_conf)
            elif self.decoder == "s4":
                from espnet_tpu.nn.s4_decoder import S4Decoder
                self.decoder_mod = S4Decoder(self.vocab_size, **d_conf)
            elif self.decoder == "hugging_face":
                from espnet_tpu.nn.hf_decoder import HuggingFaceDecoder
                self.decoder_mod = HuggingFaceDecoder(self.vocab_size,
                                                      **d_conf)
            else:
                self.decoder_mod = TransformerDecoder(self.vocab_size,
                                                      **d_conf)
        if self.frontend_conf is None:
            self._frontend = None
        elif self.frontend == "wav2vec2":
            # pretrained-SSL feature frontend (s3prl.py role); weights
            # land via frontends.ssl_frontend.convert_wav2vec2_torch
            from espnet_tpu.frontends.ssl_frontend import Wav2Vec2Frontend
            self._frontend = Wav2Vec2Frontend(**self.frontend_conf)
        elif self.frontend == "whisper":
            # whisper-encoder feature frontend (frontend/whisper.py role);
            # weights land via frontends.whisper.convert_whisper_torch
            from espnet_tpu.frontends.whisper import WhisperFrontend
            self._frontend = WhisperFrontend(**self.frontend_conf)
        elif self.frontend == "hugging_face":
            # HF flax speech encoder as frontend (frontend/huggingface.py
            # role); local-dir weights or config-built random init
            from espnet_tpu.frontends.hf_frontend import HuggingFaceFrontend
            self._frontend = HuggingFaceFrontend(**self.frontend_conf)
        elif self.frontend == "s3prl":
            # offline-clean stub: fails with the pip name + alternative
            from espnet_tpu.utils.hub import S3prlFrontend
            self._frontend = S3prlFrontend(**self.frontend_conf)
        elif self.frontend == "sliding_window":
            # raw-audio framing (asr/frontend/windowing.py role)
            from espnet_tpu.frontends.fused import SlidingWindowFrontend
            self._frontend = SlidingWindowFrontend(**self.frontend_conf)
        elif self.frontend == "fused":
            # multi-frontend learned fusion (asr/frontend/fused.py role)
            from espnet_tpu.frontends.fused import FusedFrontends
            conf = dict(self.frontend_conf)
            conf["frontends"] = tuple(conf.get("frontends", ()))
            self._frontend = FusedFrontends(**conf)
        else:
            self._frontend = DefaultFrontend(**self.frontend_conf)
        if self.preencoder == "linear":
            from espnet_tpu.nn.preencoder import LinearProjection
            self._preencoder = LinearProjection(**dict(
                self.preencoder_conf or {}))
        elif self.preencoder == "sinc":
            from espnet_tpu.nn.preencoder import LightweightSincConvs
            self._preencoder = LightweightSincConvs(**dict(
                self.preencoder_conf or {}))
        else:
            self._preencoder = None
        if self.postencoder == "length_adaptor":
            from espnet_tpu.nn.preencoder import LengthAdaptor
            self._postencoder = LengthAdaptor(**dict(
                self.postencoder_conf or {}))
        else:
            self._postencoder = None
        if self.normalize == "utterance_mvn":
            self._normalize = UtteranceMVN()
        elif self.normalize == "global_mvn":
            self._normalize = self.normalize_stats
        else:
            self._normalize = None

    @property
    def sos_id(self):
        return self.vocab_size - 1 if self.sos is None else self.sos

    @property
    def eos_id(self):
        return self.vocab_size - 1 if self.eos is None else self.eos

    def encode(self, speech, speech_lengths, *, deterministic=True,
               return_intermediates=False, video=None,
               video_lengths=None):
        """frontend -> specaug -> normalize -> encoder
        (espnet_model.py:380 order). `video` feeds the audio-visual
        encoder (avhubert_encoder.py role) as a second modality."""
        if self._frontend is not None:
            feats, feat_lens = self._frontend(speech, speech_lengths)
        else:
            feats, feat_lens = speech, speech_lengths
        if self.specaug_conf is not None and not deterministic:
            rng = self.make_rng("specaug")
            feats = specaug(rng, feats, feat_lens, **self.specaug_conf)
        if self._normalize is not None:
            feats, feat_lens = self._normalize(feats, feat_lens)
        if self._preencoder is not None:
            feats, feat_lens = self._preencoder(
                feats, feat_lens, deterministic=deterministic)
        enc_kw = {}
        if self.encoder == "avhubert":
            enc_kw = {"video": video, "video_lengths": video_lengths}
        out = self.encoder_mod(feats, feat_lens, deterministic=deterministic,
                               return_intermediates=return_intermediates,
                               **enc_kw)
        if self._postencoder is not None:
            if return_intermediates and len(out) == 3:
                enc, enc_lens, inters = out
                # intermediates are PRE-adaptor (full time resolution):
                # they must keep the pre-postencoder lengths or the
                # intermediate CTC masks away valid frames (ADVICE r2)
                pre_lens = enc_lens
                enc, enc_lens = self._postencoder(
                    enc, enc_lens, deterministic=deterministic)
                return enc, enc_lens, inters, pre_lens
            enc, enc_lens = out
            return self._postencoder(enc, enc_lens,
                                     deterministic=deterministic)
        if return_intermediates and len(out) == 3:
            enc, enc_lens, inters = out
            return enc, enc_lens, inters, enc_lens
        return out

    def __call__(self, speech, speech_lengths, text, text_lengths, *,
                 video=None, video_lengths=None, deterministic=True):
        """Returns (loss, stats_dict, batch_size_weight)."""
        use_inter = self.interctc_weight > 0.0
        enc_out = self.encode(speech, speech_lengths,
                              deterministic=deterministic,
                              return_intermediates=use_inter,
                              video=video, video_lengths=video_lengths)
        if use_inter:
            enc, enc_lens, inters, inter_lens = enc_out
        else:
            enc, enc_lens = enc_out
            inters, inter_lens = [], None
        return self.compute_losses(enc, enc_lens, text, text_lengths,
                                   inters=inters, inter_lens=inter_lens,
                                   deterministic=deterministic)

    def compute_losses(self, enc, enc_lens, text, text_lengths, *,
                       inters=(), inter_lens=None, deterministic=True):
        """CTC/attention loss mix over an encoded memory (shared by SLU
        and other ASR-family subclasses that reshape the memory)."""
        stats = {}
        loss_ctc = jnp.asarray(0.0)
        if self.ctc_weight > 0.0:
            ctc_logits = self.ctc(enc, deterministic=deterministic)
            cc = dict(self.ctc_conf or {})
            if cc.get("ctc_type") == "brctc":
                from espnet_tpu.ops.brctc import brctc_loss
                loss_ctc = brctc_loss(
                    ctc_logits, enc_lens, text, text_lengths, self.blank_id,
                    risk_strategy=cc.get("risk_strategy", "exp"),
                    group_strategy=cc.get("group_strategy", "end"),
                    risk_factor=cc.get("risk_factor", 0.0))
            else:
                loss_ctc = ctc_loss(ctc_logits, enc_lens, text, text_lengths,
                                    self.blank_id)
            stats["loss_ctc"] = loss_ctc
            if self.interctc_weight > 0.0 and inters:
                inter_losses = []
                for _, h in inters:
                    il = ctc_loss(self.ctc(h, deterministic=deterministic),
                                  inter_lens, text, text_lengths,
                                  self.blank_id)
                    inter_losses.append(il)
                loss_inter = jnp.mean(jnp.stack(inter_losses))
                stats["loss_interctc"] = loss_inter
                loss_ctc = ((1 - self.interctc_weight) * loss_ctc
                            + self.interctc_weight * loss_inter)
        loss_att = jnp.asarray(0.0)
        if self.decoder is not None and self.ctc_weight < 1.0:
            ys_in, ys_out = add_sos_eos(text, text_lengths, self.sos_id,
                                        self.eos_id, self.ignore_id)
            logits = self.decoder_mod(enc, enc_lens, ys_in, text_lengths + 1,
                                      deterministic=deterministic)
            loss_att = label_smoothing_loss(
                logits, ys_out, self.lsm_weight, self.ignore_id,
                self.length_normalized_loss)
            stats["loss_att"] = loss_att
            stats["acc"] = accuracy(logits, ys_out, self.ignore_id)
        loss = self.ctc_weight * loss_ctc + (1.0 - self.ctc_weight) * loss_att
        stats["loss"] = loss
        weight = jnp.asarray(enc.shape[0], jnp.float32)
        return loss, stats, weight

    def ctc_logits(self, enc):
        return self.ctc(enc, deterministic=True)

    def nll(self, enc, enc_lens, text, text_lengths):
        """Per-utterance attention-decoder negative log-likelihood of
        given label sequences (espnet_model.py:469 nll / :507
        batchify_nll contract; used for n-best rescoring)."""
        ys_in, ys_out = add_sos_eos(text, text_lengths, self.sos_id,
                                    self.eos_id, self.ignore_id)
        logits = self.decoder_mod(enc, enc_lens, ys_in, text_lengths + 1,
                                  deterministic=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = jnp.where(ys_out == self.ignore_id, 0, ys_out)
        tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        mask = (ys_out != self.ignore_id).astype(tok_lp.dtype)
        return -(tok_lp * mask).sum(axis=-1)

    # -- decoder delegation for the on-device beam search ------------
    def decoder_init_state(self, memory, memory_lens, batch, maxlen):
        return self.decoder_mod.init_state(memory, memory_lens, batch, maxlen)

    def decoder_score_step(self, token, step, state):
        return self.decoder_mod.score_step(token, step, state)
