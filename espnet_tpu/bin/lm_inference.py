"""LM text generation (contract: espnet2/bin/lm_inference.py) —
greedy / temperature sampling with the cached score_step."""

from __future__ import annotations

import logging
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.lm import LMTask
from espnet_tpu.text.tokenizer import TokenIDConverter, build_tokenizer
from espnet_tpu.utils.config import parse_cli_overrides

logger = logging.getLogger(__name__)


class TextGenerate:
    def __init__(self, train_config=None, model_file=None,
                 maxlen: int = 100, temperature: float = 1.0,
                 sampling: bool = False, seed: int = 0):
        self.model, self.params, self.cfg = LMTask.build_model_from_file(
            train_config, model_file)
        token_list = None
        if self.cfg.get("token_list"):
            self.converter = TokenIDConverter(self.cfg["token_list"])
            self.tokenizer = build_tokenizer(
                self.cfg.get("token_type", "char"))
        else:
            self.converter = None
        self.maxlen = maxlen
        self.temperature = temperature
        self.sampling = sampling
        self.rng = jax.random.PRNGKey(seed)

    def __call__(self, prefix: Optional[str] = None) -> str:
        sos = self.model.sos_eos
        ids: List[int] = []
        if prefix and self.converter is not None:
            toks = self.tokenizer.text2tokens(prefix)
            ids = self.converter.tokens2ids(toks)
        state = self.model.apply(self.params, 1, self.maxlen + 2,
                                 method=self.model.init_carry)
        tok = jnp.asarray([sos])
        out_ids = []
        for step in range(self.maxlen):
            logp, state = self.model.apply(self.params, tok, step, state,
                                           method=self.model.score_step)
            if step < len(ids):  # teacher-force the prefix
                nxt = ids[step]
            elif self.sampling:
                self.rng, k = jax.random.split(self.rng)
                nxt = int(jax.random.categorical(
                    k, logp[0] / self.temperature))
            else:
                nxt = int(jnp.argmax(logp[0]))
            if nxt == sos and step >= len(ids):  # eos
                break
            out_ids.append(nxt)
            tok = jnp.asarray([nxt])
        if self.converter is not None:
            toks = self.converter.ids2tokens(out_ids)
            return self.tokenizer.tokens2text(toks)
        return " ".join(map(str, out_ids))


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    prefix = args.pop("prefix", None)
    n = int(args.pop("num_samples", 1))
    gen = TextGenerate(**args)
    for _ in range(n):
        print(gen(prefix))


if __name__ == "__main__":
    main()
