"""Target-speaker extraction inference (contract:
espnet2/bin/enh_tse_inference.py): extract the enrolled speaker's voice
from a mixture."""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.enh import EnhTSETask


class ExtractSpeech:
    def __init__(self, train_config=None, model_file=None):
        self.model, self.params, self.cfg = EnhTSETask.build_model_from_file(
            train_config, model_file)

    def __call__(self, speech_mix: np.ndarray, enroll: np.ndarray
                 ) -> np.ndarray:
        if speech_mix.ndim == 1:
            speech_mix = speech_mix[None]
        if enroll.ndim == 1:
            enroll = enroll[None]
        est = self.model.apply(
            self.params, jnp.asarray(speech_mix),
            jnp.asarray([speech_mix.shape[1]], jnp.int32),
            jnp.asarray(enroll),
            jnp.asarray([enroll.shape[1]], jnp.int32),
            method=self.model.extract)
        return np.asarray(est)


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    ExtractSpeech(**kw)


if __name__ == "__main__":
    main()
