"""Speaker embedding extraction + verification scoring
(contract: espnet2/bin/spk_inference.py, spk_embed_extract.py)."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.spk import SpeakerTask
from espnet_tpu.utils.config import parse_cli_overrides


class SpeakerEmbedding:
    def __init__(self, train_config=None, model_file=None):
        self.model, self.params, self.cfg = \
            SpeakerTask.build_model_from_file(train_config, model_file)
        self._extract = jax.jit(lambda p, s, sl: self.model.apply(
            p, s, sl, method=self.model.extract_embedding))

    def __call__(self, speech: np.ndarray) -> np.ndarray:
        if speech.ndim == 1:
            speech = speech[None]
        B, S = speech.shape
        emb = self._extract(self.params, jnp.asarray(speech),
                            jnp.full((B,), S, jnp.int32))
        return np.asarray(emb)

    def score(self, speech_a: np.ndarray, speech_b: np.ndarray) -> float:
        """Cosine similarity between two utterances' embeddings."""
        ea, eb = self(speech_a)[0], self(speech_b)[0]
        return float(np.dot(ea, eb) /
                     max(np.linalg.norm(ea) * np.linalg.norm(eb), 1e-9))


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    from pathlib import Path
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.data.fileio import NpyScpWriter
    from espnet_tpu.tasks.abs_task import parse_triples
    out = Path(args.pop("output_dir"))
    data = args.pop("data_path_and_name_and_type")
    se = SpeakerEmbedding(train_config=args.pop("train_config"),
                          model_file=args.pop("model_file"))
    ds = ESPnetDataset(parse_triples(data))
    with NpyScpWriter(out / "embed", out / "embed.scp") as w:
        for k in ds.keys():
            _, dat = ds[k]
            w[k] = se(dat["speech"])[0]


if __name__ == "__main__":
    main()
