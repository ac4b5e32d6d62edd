"""WFST lattice decoding CLI (contract: espnet2/bin/asr_inference_k2.py
k2Speech2Text): decode a trained CTC model's posteriors against a
compiled CTC-topo o lexicon o n-gram graph (decode/wfst.py) and emit
word sequences."""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.wfst import DecodingGraph, wfst_decode
from espnet_tpu.tasks.asr import ASRTask
from espnet_tpu.text.tokenizer import TokenIDConverter


def build_lexicon(words: Sequence[str], token_list: Sequence[str],
                  word_sep: Optional[str] = "<space>"
                  ) -> Tuple[Dict[str, List[int]], Optional[int]]:
    """Char-level lexicon: each word spells as its token ids
    (lexicon-from-tokens role of k2's prepare_lang)."""
    conv = TokenIDConverter(list(token_list))
    lex = {}
    for w in words:
        ids = conv.tokens2ids(list(w))
        if all(i > 0 for i in ids):  # drop words with OOV chars (unk=?)
            lex[w] = ids
    sep = None
    if word_sep and word_sep in token_list:
        sep = list(token_list).index(word_sep)
    return lex, sep


class k2Speech2Text:
    """CTC + HLG decoding; `words` come from a word list or ARPA."""

    def __init__(self, asr_train_config=None, asr_model_file=None,
                 word_list=None, arpa_path=None, lm_weight: float = 1.0,
                 search_beam: Optional[float] = None, nbest: int = 1,
                 rescore_arpa: Optional[str] = None,
                 rescore_lm_weight: float = 0.5):
        """search_beam/nbest/rescore_*: score-delta lattice beam, n-best
        path sampling, and word-LM rescoring of the n-best
        (espnet2/fst/lm_rescore.py:81,168 + asr_inference_k2.py
        search_beam_size role)."""
        self.model, self.params, self.cfg = ASRTask.build_model_from_file(
            asr_train_config, asr_model_file)
        token_list = list(self.model.token_list)
        if word_list is not None:
            words = [w for w in Path(word_list).read_text(
                encoding="utf-8").split() if w]
        elif arpa_path is not None:
            from espnet_tpu.decode.wfst import read_arpa_words
            uni, _, _ = read_arpa_words(arpa_path)
            words = [w for w in uni if not w.startswith("<")]
        else:
            raise ValueError("need word_list or arpa_path")
        lex, sep = build_lexicon(words, token_list)
        self.words = sorted(lex)
        self.graph = DecodingGraph.build(
            lex, blank_id=self.model.blank_id, arpa_path=arpa_path,
            word_sep=sep, lm_weight=lm_weight)
        self.search_beam = search_beam
        self.nbest = int(nbest)
        self.rescore_lm_weight = rescore_lm_weight
        self._rescore_fn = None
        if rescore_arpa is not None:
            from espnet_tpu.decode.wfst import _backoff_logp, \
                read_arpa_full
            grams = read_arpa_full(rescore_arpa)

            def lm_fn(word_ids):
                hist: tuple = ("<s>",)
                total = 0.0
                for wi in word_ids:
                    w = self.words[wi]
                    total += _backoff_logp(grams, hist, w)
                    hist = (hist + (w,))[-(max(grams) - 1):] \
                        if max(grams) > 1 else ()
                total += _backoff_logp(grams, hist, "</s>")
                return total

            self._rescore_fn = lm_fn

    def __call__(self, speech: np.ndarray) -> List[Tuple[str, list]]:
        if speech.ndim == 1:
            speech = speech[None]
        lens = jnp.asarray([speech.shape[1]], jnp.int32)
        enc, enc_lens = self.model.apply(self.params, jnp.asarray(speech),
                                         lens, method=self.model.encode)
        logp = jax.nn.log_softmax(self.model.apply(
            self.params, enc, method=self.model.ctc_logits), axis=-1)
        L = int(np.asarray(enc_lens)[0])
        if self.nbest > 1 or self._rescore_fn is not None:
            from espnet_tpu.decode.wfst import lm_rescore, wfst_nbest
            hyps = wfst_nbest(self.graph, np.asarray(logp[0]),
                              k=max(self.nbest, 8), length=L,
                              beam=self.search_beam)
            if self._rescore_fn is not None:
                hyps = lm_rescore(hyps, self._rescore_fn,
                                  self.rescore_lm_weight)
            return [(" ".join(self.words[i] for i in ids), ids)
                    for ids, _ in hyps[:self.nbest]]
        ids = wfst_decode(self.graph, np.asarray(logp[0]), L,
                          beam=self.search_beam)
        words = [self.words[i] for i in ids]
        return [(" ".join(words), ids)]


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    k2Speech2Text(**kw)


if __name__ == "__main__":
    main()
