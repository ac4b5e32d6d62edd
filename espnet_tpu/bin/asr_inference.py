"""Speech2Text inference API + batch decode CLI.

Behavioral contract: espnet2/bin/asr_inference.py — `Speech2Text`
(:73) built from (train_config, model_file), `__call__` returns
[(text, tokens, token_ints, score)] n-best (:492); `inference()` writer
loop emits Kaldi-style maps text/token/token_int/score per nbest
(:839-905) via DatadirWriter.

TPU-first: decoding is batched and fully on device — greedy CTC is one
XLA program over the padded batch; beam search (espnet_tpu/decode/
beam_search.py) is a single lax.while_loop per batch.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.data.batching import common_collate_fn
from espnet_tpu.data.dataset import ESPnetDataset
from espnet_tpu.data.fileio import DatadirWriter
from espnet_tpu.decode.ctc_greedy import ctc_greedy_decode
from espnet_tpu.tasks.asr import ASRTask, read_token_list
from espnet_tpu.text.tokenizer import TokenIDConverter, build_tokenizer
from espnet_tpu.utils.config import load_yaml, parse_cli_overrides

logger = logging.getLogger(__name__)


class Speech2Text:
    def __init__(self,
                 asr_train_config=None,
                 asr_model_file=None,
                 ctc_weight: float = 0.5,
                 beam_size: int = 10,
                 penalty: float = 0.0,
                 maxlenratio: float = 0.0,
                 minlenratio: float = 0.0,
                 nbest: int = 1,
                 lm_train_config=None,
                 lm_file=None,
                 lm_weight: float = 1.0,
                 ngram_file=None,
                 ngram_weight: float = 0.9,
                 time_sync: bool = False,
                 device=None):
        self.model, self.params, self.cfg = ASRTask.build_model_from_file(
            asr_train_config, asr_model_file)
        token_list = list(self.model.token_list)
        self.converter = TokenIDConverter(token_list)
        self.tokenizer = build_tokenizer(
            self.cfg.get("token_type", "char"),
            bpemodel=self.cfg.get("bpemodel"))
        self.beam_size = beam_size
        self.ctc_weight = ctc_weight
        self.penalty = penalty
        self.maxlenratio = maxlenratio
        self.minlenratio = minlenratio
        self.nbest = nbest
        self.time_sync = time_sync
        self._timesync_bs = None
        self.lm = None
        self.lm_params = None
        self.lm_weight = lm_weight
        if lm_train_config is not None and lm_file is not None:
            from espnet_tpu.tasks.lm import LMTask
            self.lm, self.lm_params, _ = LMTask.build_model_from_file(
                lm_train_config, lm_file)
        self.ngram = None
        self.ngram_params = None
        self.ngram_weight = ngram_weight
        if ngram_file is not None:
            from espnet_tpu.decode.ngram import NgramScorer
            self.ngram, self.ngram_params = NgramScorer.from_file(
                ngram_file, token_list)
        self._encode = jax.jit(
            lambda p, s, sl: self.model.apply(
                p, s, sl, deterministic=True, method=self.model.encode))
        self._ctc_logits = jax.jit(
            lambda p, enc: self.model.apply(p, enc,
                                            method=self.model.ctc_logits))
        self._beam = None

    # -- single/batch decode ----------------------------------------
    def __call__(self, speech: np.ndarray, speech_lengths=None
                 ) -> List[List[Tuple]]:
        """speech: (S,) or (B, S) -> per-utterance n-best list of
        (text, tokens, token_ints, score)."""
        if speech.ndim == 1:
            speech = speech[None]
        B = speech.shape[0]
        if speech_lengths is None:
            speech_lengths = np.full((B,), speech.shape[1], np.int32)
        enc, enc_lens = self._encode(self.params, jnp.asarray(speech),
                                     jnp.asarray(speech_lengths))
        use_beam = (self.model.decoder is not None
                    and self.model.ctc_weight < 1.0 and self.beam_size > 1
                    and self.ctc_weight < 1.0)
        if use_beam and self.time_sync:
            results = self._timesync_decode(enc, enc_lens)
        elif use_beam:
            results = self._beam_decode(enc, enc_lens)
        else:
            results = self._greedy_decode(enc, enc_lens)
        return results

    def _greedy_decode(self, enc, enc_lens):
        logits = self._ctc_logits(self.params, enc)
        tokens, n_tok = ctc_greedy_decode(logits, enc_lens,
                                          self.model.blank_id)
        tokens, n_tok = np.asarray(tokens), np.asarray(n_tok)
        out = []
        for b in range(tokens.shape[0]):
            ids = tokens[b, :n_tok[b]].tolist()
            toks = self.converter.ids2tokens(ids)
            text = self.tokenizer.tokens2text(toks)
            out.append([(text, toks, ids, 0.0)])
        return out

    def _timesync_decode(self, enc, enc_lens):
        # frame-synchronous CTC prefix search + attention rescoring
        # (beam_search_timesync.py contract)
        if self._timesync_bs is None:
            from espnet_tpu.decode.timesync import BeamSearchTimeSync
            self._timesync_bs = BeamSearchTimeSync(
                self.model, self.params, beam_size=self.beam_size,
                ctc_weight=self.ctc_weight)
        out = []
        for hyps in self._timesync_bs(enc, enc_lens, nbest=self.nbest):
            nbest = []
            for ids, score in hyps:
                toks = self.converter.ids2tokens(ids)
                nbest.append((self.tokenizer.tokens2text(toks), toks, ids,
                              float(score)))
            out.append(nbest)
        return out

    def _beam_decode(self, enc, enc_lens):
        from espnet_tpu.decode.beam_search import BeamSearchConfig, batch_beam_search
        results = batch_beam_search(
            model=self.model, params=self.params, enc=enc, enc_lens=enc_lens,
            config=BeamSearchConfig(
                beam_size=self.beam_size, ctc_weight=self.ctc_weight,
                length_bonus=self.penalty, maxlenratio=self.maxlenratio,
                minlenratio=self.minlenratio, nbest=self.nbest,
                lm_weight=self.lm_weight,
                ngram_weight=self.ngram_weight),
            lm=self.lm, lm_params=self.lm_params,
            ngram=self.ngram, ngram_params=self.ngram_params)
        out = []
        for hyps in results:  # per utterance: list of (ids, score)
            nbest = []
            for ids, score in hyps[:self.nbest]:
                toks = self.converter.ids2tokens(ids)
                text = self.tokenizer.tokens2text(toks)
                nbest.append((text, toks, ids, float(score)))
            out.append(nbest)
        return out

    @staticmethod
    def from_pretrained(model_tag=None, **kwargs):
        """Load from a packed model dir (pack.py contract): dir with
        config.yaml + model checkpoint."""
        if model_tag is not None:
            from espnet_tpu.utils.hub import resolve_model_tag
            d = resolve_model_tag(model_tag)
            kwargs.setdefault("asr_train_config", d / "config.yaml")
            kwargs.setdefault("asr_model_file", d / "model")
        return Speech2Text(**kwargs)


def inference(output_dir: str,
              data_path_and_name_and_type,
              asr_train_config, asr_model_file,
              batch_size: int = 1, nbest: int = 1,
              job_id: int = 0, num_jobs: int = 1, **kwargs):
    """Batch decode -> Kaldi-style output maps (asr_inference.py:839).

    job_id/num_jobs shard the key list for embarrassingly-parallel
    decode (the recipe layer's `_nj` split, asr.sh:1589-1616)."""
    s2t = Speech2Text(asr_train_config=asr_train_config,
                      asr_model_file=asr_model_file, nbest=nbest, **kwargs)
    from espnet_tpu.tasks.abs_task import parse_triples
    ds = ESPnetDataset(parse_triples(data_path_and_name_and_type),
                       preprocess=None)
    keys = ds.keys()
    if num_jobs > 1:
        from espnet_tpu.parallel.launch import shard_keys
        keys = shard_keys(keys, job_id, num_jobs)
    if batch_size > 1:
        # sort by audio length: batches pad to similar sizes and the
        # bucketed shapes keep recompiles bounded (SURVEY.md §7)
        keys = sorted(keys, key=lambda k: len(ds[k][1]["speech"]))
    import json
    import time as _time
    fs = s2t.cfg.get("frontend_conf", {}).get("fs", 16000) \
        if isinstance(s2t.cfg.get("frontend_conf"), dict) else 16000
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    stats_f = open(Path(output_dir) / "decode_stats.jsonl", "w",
                   encoding="utf-8")
    with DatadirWriter(output_dir) as writer:
        for i in range(0, len(keys), batch_size):
            kbatch = keys[i:i + batch_size]
            samples = [ds[k] for k in kbatch]
            uids, batch = common_collate_fn(samples)
            speech = batch["speech"]
            lens = batch["speech_lengths"]
            nb = speech.shape[0]
            if batch_size > 1:
                # pad batch AND length to buckets: the whole decode
                # program compiles once per bucket, not per batch
                from espnet_tpu.data.batching import bucket_length
                Lb = bucket_length(speech.shape[1], base=4096, growth=1.3)
                speech = np.pad(speech, ((0, batch_size - nb),
                                         (0, Lb - speech.shape[1])))
                lens = np.pad(lens, (0, batch_size - nb),
                              constant_values=max(int(lens.min()), 1))
            t0 = _time.perf_counter()
            results = s2t(speech, lens)[:nb]
            wall = _time.perf_counter() - t0
            audio_secs = float(batch["speech_lengths"].sum()) / fs
            # per-run RTF record (pyscripts/utils/calculate_rtf.py
            # contract; asr_inference.py:69-70 logging markers)
            logger.info("speech length: %.3fs, decode time: %.3fs",
                        audio_secs, wall)
            stats_f.write(json.dumps(
                {"n_utts": nb, "audio_secs": audio_secs,
                 "decode_secs": wall}) + "\n")
            for uid, nbest_hyps in zip(uids, results):
                for n, (text, toks, ids, score) in enumerate(nbest_hyps, 1):
                    w = writer[f"{n}best_recog"]
                    w["text"][uid] = text
                    w["token"][uid] = " ".join(toks)
                    w["token_int"][uid] = " ".join(map(str, ids))
                    w["score"][uid] = str(score)
    stats_f.close()
    logger.info("decoded %d utterances -> %s", len(keys), output_dir)


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**args)


if __name__ == "__main__":
    main()
