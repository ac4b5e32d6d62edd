"""Streaming speech recognition API.

Behavioral contract: espnet2/bin/asr_inference_streaming.py:37-337 —
`Speech2TextStreaming(...)` consumes audio in chunks:
`results = s2t(chunk, is_final=False)`; internal state covers the
incremental frontend (buffered samples), block-synchronous encoder
state, and the running decode; `is_final=True` flushes.

Two decode modes:

- ``search_type="greedy"`` (lowest latency): every chunk triggers one
  jitted `stream_step` + greedy-CTC update with fixed shapes, so
  streaming latency is one device dispatch per chunk.
- ``search_type="beam"``: block-synchronous HYBRID beam search
  (espnet2/legacy/nets/batch_beam_search_online_sim.py semantics /
  bin/asr_inference_streaming.py:205-337): at each block boundary the
  full label-sync CTC/attention beam search re-runs over the encoder
  frames accumulated so far (the encoder itself stays incremental —
  chunks are computed once and buffered). Because the whole search is a
  single on-device while_loop, re-decoding a growing prefix is cheap on
  TPU; encoder lengths are padded to geometric buckets so only a few
  programs ever compile. `is_final=True` produces exactly the offline
  hybrid decode of the streaming encoder states.
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
                 search_type: str = "greedy", beam_size: int = 10,
                 ctc_weight: float = 0.3, nbest: int = 1,
                 decode_interval: int = 1, **kwargs):
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
        self.search_type = search_type
        self.nbest = nbest
        self.decode_interval = max(int(decode_interval), 1)
        if search_type == "beam":
            from espnet_tpu.decode.beam_search import BeamSearchConfig
            self.bs_config = BeamSearchConfig(
                beam_size=beam_size, ctc_weight=ctc_weight, nbest=nbest)
        elif search_type != "greedy":
            raise ValueError(f"unknown search_type: {search_type}")
        # feature normalization must match training: GlobalMVN is
        # elementwise per frame -> exactly streamable; utterance_mvn is
        # inherently non-causal and is skipped here (train streaming
        # configs with normalize: global_mvn)
        mvn = None
        if self.cfg.get("normalize") == "global_mvn":
            mvn = getattr(self.model, "normalize_stats", None)
        self._mvn = mvn

        def _norm(f):
            if mvn is None:
                return f
            out, _ = mvn(f, jnp.full((f.shape[0],), f.shape[1], jnp.int32))
            return out

        self._norm = _norm
        self._stream_step = jax.jit(
            lambda p, f, st: self.model.apply(
                p, _norm(f), st, method=lambda m, f_, st_:
                m.encoder_mod.stream_step(f_, st_)))
        self._ctc = jax.jit(lambda p, enc: jax.nn.log_softmax(
            self.model.apply(p, enc, method=self.model.ctc_logits), axis=-1))

        # greedy path: ONE dispatch per window — encoder step + CTC
        # argmax fused, only the (T,) token ids come back to the host
        def _fused(p, f, st):
            enc, new_st = self.model.apply(
                p, _norm(f), st, method=lambda m, f_, st_:
                m.encoder_mod.stream_step(f_, st_))
            logits = self.model.apply(p, enc, method=self.model.ctc_logits)
            return jnp.argmax(logits, axis=-1), new_st

        self._stream_step_ctc = jax.jit(_fused)
        self.reset()

    def reset(self):
        self.fe.reset()
        self._enc_state = None
        self._hyp: List[int] = []
        self._prev_tok = -1
        self._enc_chunks: List[np.ndarray] = []
        self._blocks_since_decode = 0
        self._last_results: List[Tuple[str, List[str], List[int]]] = []

    # -- internals ----------------------------------------------------

    def _encode_pending(self, is_final: bool) -> int:
        """Run stream_step over every complete feature window buffered in
        the frontend; buffer encoder chunks (zero-padded tails of final
        windows trimmed). Returns #new blocks."""
        from espnet_tpu.frontends.streaming import subsampled_valid_len
        n_new = 0
        while True:
            popped = self.fe.pop_one_window(self.feat_window,
                                            self.feat_advance,
                                            is_final=is_final,
                                            with_valid=True)
            if popped is None:
                return n_new
            chunk, n_valid = popped
            if self._enc_state is None:
                self._enc_state = self.model.apply(
                    self.params, 1,
                    method=lambda m, b: m.encoder_mod.init_stream_state(b))
            enc, self._enc_state = self._stream_step(
                self.params, jnp.asarray(chunk[None]), self._enc_state)
            out_valid = subsampled_valid_len(self.rate, n_valid)
            self._enc_chunks.append(np.asarray(enc[0])[:out_valid])
            n_new += 1

    def _beam_decode(self) -> List[Tuple[str, List[str], List[int]]]:
        """Block-synchronous hybrid beam search over all encoder frames
        accumulated so far (one on-device program)."""
        from espnet_tpu.data.batching import bucket_length
        from espnet_tpu.decode.beam_search import batch_beam_search
        enc = np.concatenate(self._enc_chunks, axis=0)  # (T, D)
        T = enc.shape[0]
        Tb = bucket_length(T, base=self.chunk_size * 4, growth=1.4)
        pad = np.zeros((Tb, enc.shape[1]), enc.dtype)
        pad[:T] = enc
        nb = batch_beam_search(
            self.model, self.params, jnp.asarray(pad[None]),
            jnp.asarray([T], jnp.int32), self.bs_config)[0]
        results = []
        for ids, score in nb:
            toks = self.converter.ids2tokens(ids)
            results.append((self.tokenizer.tokens2text(toks), toks,
                            list(ids)))
        return results

    # -- public API ----------------------------------------------------

    def _greedy_fused_update(self, is_final: bool):
        """One fused dispatch per window: stream_step + CTC argmax.

        The zero-padded tail of the final window must NOT be decoded
        (it argmaxes to garbage tokens) — valid output frames follow the
        valid-conv arithmetic of the subsampling stack."""
        from espnet_tpu.frontends.streaming import subsampled_valid_len
        while True:
            popped = self.fe.pop_one_window(self.feat_window,
                                            self.feat_advance,
                                            is_final=is_final,
                                            with_valid=True)
            if popped is None:
                return
            chunk, n_valid = popped
            if self._enc_state is None:
                self._enc_state = self.model.apply(
                    self.params, 1,
                    method=lambda m, b: m.encoder_mod.init_stream_state(b))
            ids, self._enc_state = self._stream_step_ctc(
                self.params, jnp.asarray(chunk[None]), self._enc_state)
            out_valid = subsampled_valid_len(self.rate, n_valid)
            for tok in np.asarray(ids)[0].tolist()[:out_valid]:
                if tok != self.model.blank_id and tok != self._prev_tok:
                    self._hyp.append(tok)
                self._prev_tok = tok

    def __call__(self, speech: np.ndarray, is_final: bool = False):
        """Feed a chunk; returns current n-best [(text, tokens, ids)]."""
        self.fe.push(speech, is_final=is_final)
        if self.search_type == "greedy":
            self._greedy_fused_update(is_final)
            toks = self.converter.ids2tokens(self._hyp)
            text = self.tokenizer.tokens2text(toks)
            results = [(text, toks, list(self._hyp))]
        else:
            n_new = self._encode_pending(is_final)
            self._blocks_since_decode += n_new
            due = (self._blocks_since_decode >= self.decode_interval
                   or (is_final and self._enc_chunks))
            if self._enc_chunks and due:
                self._last_results = self._beam_decode()
                self._blocks_since_decode = 0
            results = list(self._last_results)
        if is_final:
            self.reset()
        return results


class StreamingSessionPool:
    """Batched concurrent streaming sessions over ONE on-device program.

    Behavioral contract: the reference runs one Speech2TextStreaming per
    stream (batch=1, bin/asr_inference_streaming.py); serving wants many
    concurrent streams on one chip. Here up to `max_sessions` sessions
    share a single jitted batched `stream_step`: every round processes at
    most one feature window per session, idle sessions ride along with
    their state frozen by a mask-merge (no recompile, no per-session
    program).
    """

    def __init__(self, s2t: "Speech2TextStreaming", max_sessions: int = 8):
        from espnet_tpu.frontends.streaming import StreamingFeatureExtractor
        self.s2t = s2t
        self.B = max_sessions
        model, params = s2t.model, s2t.params
        self._batch_step = jax.jit(
            lambda p, f, st: model.apply(
                p, s2t._norm(f), st, method=lambda m, f_, st_:
                m.encoder_mod.stream_step(f_, st_)))
        self._state = model.apply(
            params, self.B,
            method=lambda m, b: m.encoder_mod.init_stream_state(b))
        fc = s2t.cfg.get("frontend_conf") or {}
        self._fe_conf = dict(
            n_fft=fc.get("n_fft", 512), hop_length=fc.get("hop_length", 128),
            n_mels=fc.get("n_mels", 80), fs=fc.get("fs", 16000))
        self._fe_cls = StreamingFeatureExtractor
        self._fes = [None] * self.B
        self._hyps = [[] for _ in range(self.B)]
        self._prev = [-1] * self.B
        self._final = [False] * self.B

    def open(self) -> int:
        for i in range(self.B):
            if self._fes[i] is None:
                self._fes[i] = self._fe_cls(**self._fe_conf)
                self._hyps[i] = []
                self._prev[i] = -1
                self._final[i] = False
                self._reset_state_row(i)
                return i
        raise RuntimeError("session pool full")

    def close(self, sid: int):
        self._fes[sid] = None

    def _reset_state_row(self, sid: int):
        st = self._state
        self._state = type(st)(
            ctx=st.ctx.at[:, sid].set(0.0),
            conv_tail=st.conv_tail.at[:, sid].set(0.0),
            frame_offset=st.frame_offset.at[sid].set(0))

    def push(self, sid: int, speech: np.ndarray, is_final: bool = False):
        """Feed audio into session `sid`; runs pending windows for ALL
        sessions in lockstep batches. Returns sid's (text, tokens, ids)."""
        self._fes[sid].push(np.asarray(speech, np.float32),
                            is_final=is_final)
        self._final[sid] = is_final
        self._drain()
        toks = self.s2t.converter.ids2tokens(self._hyps[sid])
        text = self.s2t.tokenizer.tokens2text(toks)
        out = (text, toks, list(self._hyps[sid]))
        if is_final:
            self.close(sid)
        return out

    def _drain(self):
        """Process at most one window per session per round, batched."""
        W, A = self.s2t.feat_window, self.s2t.feat_advance
        n_mels = self._fe_conf["n_mels"]
        while True:
            feats = np.zeros((self.B, W, n_mels), np.float32)
            active = np.zeros((self.B,), bool)
            valid_out = [0] * self.B
            for i, fe in enumerate(self._fes):
                if fe is None:
                    continue
                popped = fe.pop_one_window(W, A, is_final=self._final[i],
                                           with_valid=True)
                if popped is not None:
                    from espnet_tpu.frontends.streaming import \
                        subsampled_valid_len
                    feats[i], n_valid = popped
                    valid_out[i] = subsampled_valid_len(self.s2t.rate,
                                                        n_valid)
                    active[i] = True
            if not active.any():
                return
            old = self._state
            enc, new = self._batch_step(
                self.s2t.params, jnp.asarray(feats), self._state)
            m = jnp.asarray(active)
            # idle sessions keep their state frozen (batch axis differs
            # per field: ctx/conv_tail are (layers, B, ...), offset (B,))
            self._state = type(old)(
                ctx=jnp.where(m[None, :, None, None], new.ctx, old.ctx),
                conv_tail=jnp.where(m[None, :, None, None],
                                    new.conv_tail, old.conv_tail),
                frame_offset=jnp.where(m, new.frame_offset,
                                       old.frame_offset))
            logp = np.asarray(jax.nn.log_softmax(self.s2t.model.apply(
                self.s2t.params, enc, method=self.s2t.model.ctc_logits),
                axis=-1))
            for i in np.where(active)[0]:
                for t in range(min(logp.shape[1], valid_out[i])):
                    tok = int(np.argmax(logp[i, t]))
                    if tok != self.s2t.model.blank_id \
                            and tok != self._prev[i]:
                        self._hyps[i].append(tok)
                    self._prev[i] = tok
