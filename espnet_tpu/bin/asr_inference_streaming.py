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
        from espnet_tpu.frontends.streaming import (StreamingFeatureExtractor,
                                                    subsample_window)
        self.fe = StreamingFeatureExtractor(
            n_fft=fc.get("n_fft", 512), hop_length=fc.get("hop_length", 128),
            n_mels=fc.get("n_mels", 80), fs=fc.get("fs", 16000))
        ec = self.cfg.get("encoder_conf") or {}
        self.chunk_size = ec.get("chunk_size", 16)
        rate = {"conv2d": 4, "conv2d2": 2, "conv2d6": 6, "conv2d8": 8}.get(
            ec.get("input_layer", "conv2d"), 1)
        self.rate = rate
        self.feat_window, self.feat_advance = subsample_window(
            rate, self.chunk_size)
        self._stream_step = jax.jit(
            lambda p, f, st: self.model.apply(
                p, f, st, method=lambda m, f_, st_:
                m.encoder_mod.stream_step(f_, st_)))
        self._ctc = jax.jit(lambda p, enc: jax.nn.log_softmax(
            self.model.apply(p, enc, method=self.model.ctc_logits), axis=-1))
        self.reset()

    def reset(self):
        self.fe.reset()
        self._enc_state = None
        self._hyp: List[int] = []
        self._prev_tok = -1

    def __call__(self, speech: np.ndarray, is_final: bool = False):
        """Feed a chunk; returns current n-best [(text, tokens, ids)]."""
        self.fe.push(speech, is_final=is_final)
        for chunk in self.fe.pop_windows(self.feat_window,
                                         self.feat_advance,
                                         is_final=is_final):
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
