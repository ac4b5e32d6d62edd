"""Streaming speech recognition API.

Behavioral contract: espnet2/bin/asr_inference_streaming.py:37-337 —
`Speech2TextStreaming(...)` consumes audio in chunks:
`results = s2t(chunk, is_final=False)`; internal state covers the
incremental frontend (buffered samples), block-synchronous encoder
state, and the running CTC decode; `is_final=True` flushes.

TPU-first: every chunk triggers exactly one jitted `stream_step` +
greedy-CTC update with fixed shapes, so streaming latency is one device
dispatch per chunk.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.mel import log_mel
from espnet_tpu.ops.stft import stft_power
from espnet_tpu.tasks.asr import ASRTask
from espnet_tpu.text.tokenizer import TokenIDConverter, build_tokenizer

logger = logging.getLogger(__name__)


class Speech2TextStreaming:
    def __init__(self, asr_train_config=None, asr_model_file=None,
                 **kwargs):
        self.model, self.params, self.cfg = ASRTask.build_model_from_file(
            asr_train_config, asr_model_file)
        if self.cfg.get("encoder") != "streaming_conformer":
            raise ValueError(
                "streaming inference requires encoder: streaming_conformer")
        token_list = list(self.model.token_list)
        self.converter = TokenIDConverter(token_list)
        self.tokenizer = build_tokenizer(self.cfg.get("token_type", "char"))
        fc = self.cfg.get("frontend_conf") or {}
        self.n_fft = fc.get("n_fft", 512)
        self.hop = fc.get("hop_length", 128)
        self.n_mels = fc.get("n_mels", 80)
        self.fs = fc.get("fs", 16000)
        ec = self.cfg.get("encoder_conf") or {}
        self.chunk_size = ec.get("chunk_size", 16)
        rate = {"conv2d": 4, "conv2d2": 2, "conv2d6": 6, "conv2d8": 8}.get(
            ec.get("input_layer", "conv2d"), 1)
        self.rate = rate
        # valid-conv receptive-field arithmetic: producing chunk_size
        # encoder frames needs a window of rate*chunk + extra feature
        # frames, advancing rate*chunk per chunk (overlap = extra) so the
        # chunked subsampling matches the full-utterance conv exactly
        extra = {1: 0, 2: 5, 4: 3, 6: 5, 8: 7}[rate]
        self.feat_window = rate * self.chunk_size + extra
        self.feat_advance = rate * self.chunk_size
        self._stream_step = jax.jit(
            lambda p, f, st: self.model.apply(
                p, f, st, method=lambda m, f_, st_:
                m.encoder_mod.stream_step(f_, st_)))
        self._ctc = jax.jit(lambda p, enc: jax.nn.log_softmax(
            self.model.apply(p, enc, method=self.model.ctc_logits), axis=-1))
        self.reset()

    def reset(self):
        # prepend n_fft//2 zeros to mimic training-time center padding
        self._samples = np.zeros((self.n_fft // 2,), np.float32)
        self._feats = np.zeros((0, self.n_mels), np.float32)
        self._enc_state = None
        self._hyp: List[int] = []
        self._prev_tok = -1

    def _extract_feats(self, is_final: bool):
        """Consume buffered samples into mel frames (center=False
        incremental STFT: frame i covers [i*hop, i*hop + n_fft))."""
        S = len(self._samples)
        n_frames = (S - self.n_fft) // self.hop + 1 if S >= self.n_fft else 0
        if n_frames <= 0:
            return
        p, _ = stft_power(jnp.asarray(self._samples[None]), None,
                          n_fft=self.n_fft, hop_length=self.hop,
                          center=False)
        feats = log_mel(p, fs=self.fs, n_fft=self.n_fft, n_mels=self.n_mels)
        self._feats = np.concatenate(
            [self._feats, np.asarray(feats[0, :n_frames])], axis=0)
        consumed = n_frames * self.hop
        self._samples = self._samples[consumed:]

    def __call__(self, speech: np.ndarray, is_final: bool = False):
        """Feed a chunk; returns current n-best [(text, tokens, ids)]."""
        self._samples = np.concatenate(
            [self._samples, np.asarray(speech, np.float32)])
        if is_final:
            self._samples = np.concatenate(
                [self._samples, np.zeros((self.n_fft // 2,), np.float32)])
        self._extract_feats(is_final)
        while len(self._feats) >= self.feat_window or (
                is_final and len(self._feats) > (self.feat_window
                                                 - self.feat_advance)):
            take = min(self.feat_window, len(self._feats))
            chunk = self._feats[:take]
            self._feats = self._feats[self.feat_advance:]  # keep overlap
            if take < self.feat_window:
                chunk = np.pad(chunk,
                               ((0, self.feat_window - take), (0, 0)))
            if self._enc_state is None:
                self._enc_state = self.model.apply(
                    self.params, 1,
                    method=lambda m, b: m.encoder_mod.init_stream_state(b))
            enc, self._enc_state = self._stream_step(
                self.params, jnp.asarray(chunk[None]), self._enc_state)
            logp = np.asarray(self._ctc(self.params, enc))[0]
            for t in range(logp.shape[0]):
                tok = int(np.argmax(logp[t]))
                if tok != self.model.blank_id and tok != self._prev_tok:
                    self._hyp.append(tok)
                self._prev_tok = tok
        toks = self.converter.ids2tokens(self._hyp)
        text = self.tokenizer.tokens2text(toks)
        results = [(text, toks, list(self._hyp))]
        if is_final:
            self.reset()
        return results
