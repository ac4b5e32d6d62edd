"""Spoken language identification with an OWSM-style S2T model
(contract: espnet2/bin/s2t_inference_language.py): score every <lang_*>
token at the first decoder position and return the top-k."""

from __future__ import annotations

import sys
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.asr import ASRTask


class Speech2Language:
    def __init__(self, s2t_train_config=None, s2t_model_file=None,
                 nbest: int = 3):
        self.model, self.params, self.cfg = ASRTask.build_model_from_file(
            s2t_train_config, s2t_model_file)
        token_list = list(self.model.token_list)
        self.lang_ids = [i for i, t in enumerate(token_list)
                         if t.startswith("<lang") or
                         (t.startswith("<") and t.endswith(">")
                          and len(t) == 5 and t[1:4].isalpha())]
        self.lang_syms = [token_list[i] for i in self.lang_ids]
        if not self.lang_ids:
            raise ValueError("token list has no <lang_*>/<xxx> symbols")
        self.nbest = nbest

        def first_step_logp(params, speech, speech_lengths):
            enc, enc_lens = self.model.apply(params, speech, speech_lengths,
                                             method=self.model.encode)
            state = self.model.apply(params, enc, enc_lens, 1, 4,
                                     method=self.model.decoder_init_state)
            sos = jnp.asarray([self.model.sos_id], jnp.int32)
            logp, _ = self.model.apply(params, sos, 0, state,
                                       method=self.model.decoder_score_step)
            return logp[0]

        self._first = jax.jit(first_step_logp)

    def __call__(self, speech: np.ndarray) -> List[Tuple[str, float]]:
        if speech.ndim == 1:
            speech = speech[None]
        lens = jnp.asarray([speech.shape[1]], jnp.int32)
        logp = np.asarray(self._first(self.params, jnp.asarray(speech),
                                      lens))
        lp = logp[self.lang_ids]
        probs = np.exp(lp - lp.max())
        probs = probs / probs.sum()
        order = np.argsort(-probs)[:self.nbest]
        return [(self.lang_syms[i], float(probs[i])) for i in order]


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    Speech2Language(**kw)


if __name__ == "__main__":
    main()
