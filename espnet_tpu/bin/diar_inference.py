"""DiarizeSpeech API (contract: espnet2/bin/diar_inference.py)."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.spk import DiarizationTask
from espnet_tpu.utils.config import parse_cli_overrides


class DiarizeSpeech:
    def __init__(self, train_config=None, model_file=None,
                 threshold: float = 0.5):
        self.model, self.params, self.cfg = \
            DiarizationTask.build_model_from_file(train_config, model_file)
        self.threshold = threshold
        self._predict = jax.jit(lambda p, s, sl: self.model.apply(
            p, s, sl, method=self.model.predict))

    def __call__(self, speech: np.ndarray, fs=None):
        """(S,) or (B, S) -> per-utterance (T', num_spk) 0/1 activity."""
        if speech.ndim == 1:
            speech = speech[None]
        B, S = speech.shape
        logits, olens = self._predict(self.params, jnp.asarray(speech),
                                      jnp.full((B,), S, jnp.int32))
        probs = np.asarray(jax.nn.sigmoid(logits))
        olens = np.asarray(olens)
        return [(probs[b, :olens[b]] > self.threshold).astype(np.int32)
                for b in range(B)]


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    from pathlib import Path
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.tasks.abs_task import parse_triples
    out = Path(args.pop("output_dir"))
    data = args.pop("data_path_and_name_and_type")
    d = DiarizeSpeech(train_config=args.pop("train_config"),
                      model_file=args.pop("model_file"), **args)
    ds = ESPnetDataset(parse_triples(data))
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "diarize.rttm", "w") as f:
        for k in ds.keys():
            _, dat = ds[k]
            act = d(dat["speech"])[0]
            for spk in range(act.shape[1]):
                on = None
                for t, a in enumerate(act[:, spk]):
                    if a and on is None:
                        on = t
                    elif not a and on is not None:
                        f.write(f"SPEAKER {k} 1 {on} {t - on} <NA> <NA> "
                                f"spk{spk} <NA> <NA>\n")
                        on = None
                if on is not None:
                    f.write(f"SPEAKER {k} 1 {on} {len(act) - on} <NA> <NA> "
                            f"spk{spk} <NA> <NA>\n")


if __name__ == "__main__":
    main()
