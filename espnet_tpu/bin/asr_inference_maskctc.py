"""Mask-CTC non-autoregressive inference (contract:
espnet2/bin/asr_inference_maskctc.py): greedy-CTC seeds + iterative
mask-predict refinement (models/maskctc.py maskctc_decode)."""

from __future__ import annotations

import sys
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.asr import ASRTask
from espnet_tpu.text.tokenizer import TokenIDConverter, build_tokenizer


class Speech2TextMaskCTC:
    """partially_ar=True switches the refinement from parallel iterative
    mask-predict to the autoregressive span beam
    (beam_search_partially_AR.py role, models/maskctc.py
    partially_ar_decode)."""

    def __init__(self, asr_train_config=None, asr_model_file=None,
                 n_iterations: int = 10, threshold_probability: float = 0.99,
                 partially_ar: bool = False, beam_size: int = 5):
        self.model, self.params, self.cfg = ASRTask.build_model_from_file(
            asr_train_config, asr_model_file)
        self.converter = TokenIDConverter(list(self.model.token_list))
        self.tokenizer = build_tokenizer(self.cfg.get("token_type", "char"))
        self.n_iterations = n_iterations
        self.threshold = threshold_probability
        self.partially_ar = partially_ar
        self.beam_size = beam_size

    def __call__(self, speech: np.ndarray) -> List[Tuple[str, list, list]]:
        if speech.ndim == 1:
            speech = speech[None]
        lens = jnp.asarray([speech.shape[1]], jnp.int32)
        enc, enc_lens = self.model.apply(self.params, jnp.asarray(speech),
                                         lens, method=self.model.encode)
        if self.partially_ar:
            ids, n_tok = self.model.apply(
                self.params, enc, enc_lens, beam_size=self.beam_size,
                threshold=self.threshold,
                method=self.model.partially_ar_decode)
        else:
            ids, n_tok = self.model.apply(
                self.params, enc, enc_lens, n_iterations=self.n_iterations,
                threshold=self.threshold, method=self.model.maskctc_decode)
        ids = np.asarray(ids)[0, :int(np.asarray(n_tok)[0])].tolist()
        toks = self.converter.ids2tokens(ids)
        return [(self.tokenizer.tokens2text(toks), toks, ids)]


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    Speech2TextMaskCTC(**kw)


if __name__ == "__main__":
    main()
