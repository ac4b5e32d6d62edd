"""Neural-codec inference (contract: espnet2/bin/gan_codec_inference.py):
encode waveforms to RVQ codes and decode codes back to audio."""

from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.ssl import CodecTask


class CodecCoder:
    def __init__(self, train_config=None, model_file=None):
        self.model, self.params, self.cfg = CodecTask.build_model_from_file(
            train_config, model_file)

    def encode(self, wav: np.ndarray) -> np.ndarray:
        if wav.ndim == 1:
            wav = wav[None]
        S = (wav.shape[1] // self.model.hop) * self.model.hop
        codes = self.model.apply(self.params, jnp.asarray(wav[:, :S]),
                                 method=self.model.encode)
        return np.asarray(codes)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        return np.asarray(self.model.apply(
            self.params, jnp.asarray(codes), method=self.model.decode))


def inference(output_dir, wav_scp, train_config=None, model_file=None):
    from espnet_tpu.data.fileio import SoundScpReader, write_wav
    out = Path(output_dir)
    (out / "codes").mkdir(parents=True, exist_ok=True)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    coder = CodecCoder(train_config, model_file)
    reader = SoundScpReader(wav_scp)
    fs = coder.cfg.get("fs", 16000)
    for k in reader.keys():
        _, wav = reader[k]
        codes = coder.encode(np.asarray(wav, np.float32))
        np.save(out / "codes" / f"{k}.npy", codes[0])
        recon = coder.decode(codes)[0]
        write_wav(out / "wav" / f"{k}.wav", fs, recon)
    return out


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**kw)


if __name__ == "__main__":
    main()
