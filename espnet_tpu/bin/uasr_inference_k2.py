"""UASR WFST decoding (contract: espnet2/bin/uasr_inference_k2.py —
the GAN generator's frame-level phone posteriors decoded through a
lexicon(+LM) WFST instead of duplicate-collapse greedy; reuses the
in-repo k2 replacement decode/wfst.py)."""

from __future__ import annotations

import sys
from pathlib import Path
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.bin.asr_inference_k2 import build_lexicon
from espnet_tpu.decode.wfst import DecodingGraph, wfst_decode
from espnet_tpu.tasks.uasr import UASRTask


class k2Speech2Phones:
    def __init__(self, train_config=None, model_file=None,
                 word_list=None, arpa_path=None, lm_weight: float = 1.0):
        from espnet_tpu.bin.uasr_inference import Speech2Phones
        inner = Speech2Phones(train_config=train_config,
                              model_file=model_file)
        self.model, self.params = inner.model, inner.params
        self.phones = inner.phones
        if word_list is not None:
            words = [w for w in Path(word_list).read_text(
                encoding="utf-8").split() if w]
        elif arpa_path is not None:
            from espnet_tpu.decode.wfst import read_arpa_words
            uni, _, _ = read_arpa_words(arpa_path)
            words = [w for w in uni if not w.startswith("<")]
        else:
            raise ValueError("need word_list or arpa_path")
        # UASR emits phones; lexicon maps words -> phone-id chains
        lex, sep = build_lexicon(words, list(self.phones))
        self.words = sorted(lex)
        # the generator has no blank: use the silence/pad phone id 0
        self.graph = DecodingGraph.build(
            lex, blank_id=0, arpa_path=arpa_path, word_sep=sep,
            lm_weight=lm_weight)

    def __call__(self, feats: np.ndarray) -> List[Tuple[str, list]]:
        if feats.ndim == 2:
            feats = feats[None]
        logits = self.model.generator.apply(
            self.params["generator"], jnp.asarray(feats))
        logp = jax.nn.log_softmax(logits, axis=-1)
        ids = wfst_decode(self.graph, np.asarray(logp[0]))
        return [(" ".join(self.words[i] for i in ids), ids)]


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    k2Speech2Phones(**kw)


if __name__ == "__main__":
    main()
