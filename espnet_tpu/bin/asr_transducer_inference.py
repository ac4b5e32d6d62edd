"""Transducer Speech2Text API + batch decode CLI
(contract: espnet2/bin/asr_transducer_inference.py)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.transducer_search import (TransducerSearchConfig,
                                                 decode_transducer)
from espnet_tpu.tasks.asr_transducer import ASRTransducerTask
from espnet_tpu.text.tokenizer import TokenIDConverter, build_tokenizer
from espnet_tpu.utils.config import parse_cli_overrides

logger = logging.getLogger(__name__)


class Speech2TextTransducer:
    def __init__(self, train_config=None, model_file=None,
                 beam_size: int = 5, search_type: str = "default",
                 nbest: int = 1, score_norm: bool = True):
        self.model, self.params, self.cfg = \
            ASRTransducerTask.build_model_from_file(train_config, model_file)
        self.converter = TokenIDConverter(self.cfg["token_list"]) \
            if isinstance(self.cfg.get("token_list"), str) else \
            TokenIDConverter(list(self.model.token_list))
        self.tokenizer = build_tokenizer(self.cfg.get("token_type", "char"))
        self.config = TransducerSearchConfig(
            beam_size=beam_size, search_type=search_type, nbest=nbest,
            score_norm=score_norm)
        self._encode = jax.jit(lambda p, s, sl: self.model.apply(
            p, s, sl, method=self.model.encode))

    def __call__(self, speech: np.ndarray, speech_lengths=None):
        if speech.ndim == 1:
            speech = speech[None]
        B = speech.shape[0]
        if speech_lengths is None:
            speech_lengths = np.full((B,), speech.shape[1], np.int32)
        enc, enc_lens = self._encode(self.params, jnp.asarray(speech),
                                     jnp.asarray(speech_lengths))
        results = decode_transducer(self.model, self.params, enc, enc_lens,
                                    self.config)
        out = []
        for hyps in results:
            nbest = []
            for ids, score in hyps:
                toks = self.converter.ids2tokens(ids)
                nbest.append((self.tokenizer.tokens2text(toks), toks, ids,
                              score))
            out.append(nbest)
        return out

    @staticmethod
    def from_pretrained(model_tag=None, **kwargs):
        if model_tag is not None:
            d = Path(model_tag)
            kwargs.setdefault("train_config", d / "config.yaml")
            kwargs.setdefault("model_file", d / "model")
        return Speech2TextTransducer(**kwargs)


class Speech2TextTransducerStreaming:
    """Streaming transducer recognition
    (espnet2/bin/asr_inference_streaming.py session semantics +
    beam_search_transducer_streaming.py): feed chunks with
    `s2t(chunk, is_final=...)`; the chunked-causal encoder state,
    prediction-network state and running hypothesis persist across
    chunks, one jitted dispatch per chunk."""

    def __init__(self, train_config=None, model_file=None,
                 max_sym_exp: int = 3, umax: int = 512):
        self.model, self.params, self.cfg = \
            ASRTransducerTask.build_model_from_file(train_config, model_file)
        if self.cfg.get("encoder") != "streaming_conformer":
            raise ValueError("streaming transducer requires "
                             "encoder: streaming_conformer")
        from espnet_tpu.tasks.asr import read_token_list
        self.converter = TokenIDConverter(
            read_token_list(self.cfg["token_list"]))
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
        self.window, self.advance = subsample_window(rate, self.chunk_size)
        self.max_sym_exp = max_sym_exp
        self.umax = umax
        from espnet_tpu.decode.transducer_search import (greedy_stream_init,
                                                         greedy_stream_step)
        self._enc_step = jax.jit(
            lambda p, f, st: self.model.apply(
                p, f, st, method=lambda m, f_, st_:
                m.encoder_mod.stream_step(f_, st_)))
        self._dec_step = jax.jit(
            lambda p, enc, lens, st: greedy_stream_step(
                self.model, p, enc, lens, st,
                max_sym_exp=self.max_sym_exp))
        self._init_state = lambda: greedy_stream_init(
            self.model, self.params, 1, self.umax)
        self.reset()

    def reset(self):
        self.fe.reset()
        self._enc_state = None
        self._dec_state = None

    def __call__(self, speech: np.ndarray, is_final: bool = False):
        self.fe.push(speech, is_final=is_final)
        for chunk in self.fe.pop_windows(self.window, self.advance,
                                         is_final=is_final):
            if self._enc_state is None:
                self._enc_state = self.model.apply(
                    self.params, 1,
                    method=lambda m, b: m.encoder_mod.init_stream_state(b))
                self._dec_state = self._init_state()
            enc, self._enc_state = self._enc_step(
                self.params, jnp.asarray(chunk[None]), self._enc_state)
            lens = jnp.asarray([enc.shape[1]], jnp.int32)
            self._dec_state = self._dec_step(self.params, enc, lens,
                                             self._dec_state)
        if self._dec_state is None:
            ids = []
        else:
            n = int(self._dec_state.n_tok[0])
            ids = np.asarray(self._dec_state.tokens[0, :n]).tolist()
        toks = self.converter.ids2tokens(ids)
        results = [(self.tokenizer.tokens2text(toks), toks, ids)]
        if is_final:
            self.reset()
        return results


def inference(output_dir, data_path_and_name_and_type, train_config,
              model_file, batch_size: int = 1, **kw):
    from espnet_tpu.data.batching import common_collate_fn
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.data.fileio import DatadirWriter
    from espnet_tpu.tasks.abs_task import parse_triples
    s2t = Speech2TextTransducer(train_config=train_config,
                                model_file=model_file, **kw)
    ds = ESPnetDataset(parse_triples(data_path_and_name_and_type))
    keys = ds.keys()
    with DatadirWriter(output_dir) as writer:
        for i in range(0, len(keys), batch_size):
            samples = [ds[k] for k in keys[i:i + batch_size]]
            uids, batch = common_collate_fn(samples)
            results = s2t(batch["speech"], batch["speech_lengths"])
            for uid, nbest in zip(uids, results):
                for n, (text, toks, ids, score) in enumerate(nbest, 1):
                    w = writer[f"{n}best_recog"]
                    w["text"][uid] = text
                    w["token"][uid] = " ".join(toks)
                    w["token_int"][uid] = " ".join(map(str, ids))
                    w["score"][uid] = str(score)
    logger.info("decoded %d utterances -> %s", len(keys), output_dir)


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**args)


if __name__ == "__main__":
    main()
