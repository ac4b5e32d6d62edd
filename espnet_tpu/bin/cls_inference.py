"""Audio classification / LID inference
(contract: espnet2/bin/{cls,lid}_inference.py)."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.spk import ClassificationTask
from espnet_tpu.utils.config import parse_cli_overrides


class ClassifySpeech:
    def __init__(self, train_config=None, model_file=None, task=None):
        task = task or ClassificationTask
        self.model, self.params, self.cfg = task.build_model_from_file(
            train_config, model_file)
        self._predict = jax.jit(lambda p, s, sl: self.model.apply(
            p, s, sl, method=self.model.predict))

    def __call__(self, speech: np.ndarray):
        """-> (predicted class ids (B,), probabilities (B, n_classes))."""
        if speech.ndim == 1:
            speech = speech[None]
        B, S = speech.shape
        logits = self._predict(self.params, jnp.asarray(speech),
                               jnp.full((B,), S, jnp.int32))
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        return probs.argmax(axis=-1), probs


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.data.fileio import DatadirWriter
    from espnet_tpu.tasks.abs_task import parse_triples
    out = args.pop("output_dir")
    data = args.pop("data_path_and_name_and_type")
    c = ClassifySpeech(train_config=args.pop("train_config"),
                       model_file=args.pop("model_file"))
    ds = ESPnetDataset(parse_triples(data))
    with DatadirWriter(out) as w:
        for k in ds.keys():
            _, dat = ds[k]
            pred, probs = c(dat["speech"])
            w["prediction"][k] = str(int(pred[0]))
            w["score"][k] = str(float(probs[0, pred[0]]))


if __name__ == "__main__":
    main()
