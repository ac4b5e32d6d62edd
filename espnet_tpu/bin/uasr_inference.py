"""UASR inference (contract: espnet2/bin/uasr_inference.py): generator
phone predictions with consecutive-duplicate collapse."""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.uasr import UASRTask


class Speech2Phones:
    def __init__(self, train_config=None, model_file=None):
        from pathlib import Path

        from espnet_tpu.tasks.asr import read_token_list
        from espnet_tpu.train.checkpoint import load_checkpoint
        from espnet_tpu.utils.config import load_yaml
        self.cfg = load_yaml(train_config)
        self.model = UASRTask.build_model(self.cfg)
        if model_file is None:
            exp = Path(train_config).parent
            # GANTrainer layout: best -> rolling checkpoint -> legacy final
            for cand in ("valid.loss.best", "checkpoint", "final"):
                if (exp / cand).exists():
                    model_file = exp / cand
                    break
        self.params, _, _ = load_checkpoint(model_file)
        self.phones = read_token_list(self.cfg["token_list"])

    def __call__(self, feats: np.ndarray):
        if feats.ndim == 2:
            feats = feats[None]
        ids = np.asarray(self.model.predict(self.params,
                                            jnp.asarray(feats)))[0]
        out = [int(i) for j, i in enumerate(ids)
               if j == 0 or i != ids[j - 1]]
        return [self.phones[i] for i in out], out


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    Speech2Phones(**kw)


if __name__ == "__main__":
    main()
