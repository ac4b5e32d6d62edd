"""OWSM-CTC inference (contract: espnet2/bin/s2t_inference_ctc.py —
prompt-conditioned greedy/prefix CTC decoding of the encoder-only S2T
model)."""

from __future__ import annotations

import sys
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.misc import S2TCTCTask


class Speech2TextCTC:
    def __init__(self, s2t_train_config=None, s2t_model_file=None,
                 lang_sym: Optional[str] = None,
                 task_sym: Optional[str] = None):
        self.model, self.params, self.cfg = \
            S2TCTCTask.build_model_from_file(s2t_train_config,
                                             s2t_model_file)
        self.token_list = list(self.model.token_list)
        prompt = [t for t in (lang_sym, task_sym)
                  if t is not None and t in self.token_list]
        self.prompt_ids = np.asarray(
            [[self.token_list.index(t) for t in prompt]] or [[]],
            np.int32).reshape(1, -1)

    def __call__(self, speech: np.ndarray,
                 speech_lengths=None) -> List[Tuple[str, list]]:
        if speech.ndim == 1:
            speech = speech[None]
        B = speech.shape[0]
        if speech_lengths is None:
            speech_lengths = np.full((B,), speech.shape[1], np.int32)
        tp = None
        tpl = None
        if self.prompt_ids.shape[1]:
            tp = jnp.asarray(np.repeat(self.prompt_ids, B, axis=0))
            tpl = jnp.full((B,), self.prompt_ids.shape[1], jnp.int32)
        seqs = self.model.greedy_ctc(
            self.params, jnp.asarray(speech),
            jnp.asarray(speech_lengths, jnp.int32), tp, tpl)
        out = []
        for ids in seqs:
            toks = [self.token_list[i] for i in ids]
            out.append(("".join(" " if t == "<space>" else t
                                for t in toks), ids))
        return out


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    Speech2TextCTC(**kw)


if __name__ == "__main__":
    main()
