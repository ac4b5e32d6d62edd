"""Perplexity computation (contract: espnet2/bin/lm_calc_perplexity.py)."""

from __future__ import annotations

import logging
import sys

import jax
import numpy as np

from espnet_tpu.data.batching import common_collate_fn
from espnet_tpu.data.dataset import ESPnetDataset
from espnet_tpu.tasks.abs_task import parse_triples
from espnet_tpu.tasks.lm import LMTask
from espnet_tpu.utils.config import parse_cli_overrides

logger = logging.getLogger(__name__)


def calc_perplexity(train_config, model_file, data_path_and_name_and_type,
                    batch_size: int = 8, output_dir=None):
    model, params, cfg = LMTask.build_model_from_file(train_config, model_file)
    pre = LMTask.build_preprocess_fn(cfg, train=False)
    ds = ESPnetDataset(parse_triples(data_path_and_name_and_type),
                       preprocess=pre)

    @jax.jit
    def nll_fn(params, text, text_lengths):
        nll, t_valid, _, _ = model.apply(params, text, text_lengths,
                                         method=model.nll)
        return nll.sum(), t_valid.sum()

    total_nll, total_tok = 0.0, 0
    keys = ds.keys()
    for i in range(0, len(keys), batch_size):
        samples = [ds[k] for k in keys[i:i + batch_size]]
        _, batch = common_collate_fn(samples)
        s, n = nll_fn(params, batch["text"], batch["text_lengths"])
        total_nll += float(s)
        total_tok += int(n)
    ppl = float(np.exp(total_nll / max(total_tok, 1)))
    logger.info("perplexity: %.3f over %d tokens", ppl, total_tok)
    if output_dir is not None:
        from pathlib import Path
        p = Path(output_dir)
        p.mkdir(parents=True, exist_ok=True)
        (p / "ppl").write_text(f"{ppl}\n")
    return ppl


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    calc_perplexity(**args)


if __name__ == "__main__":
    main()
