"""Precompute log-mel fbank features (contract:
espnet2/bin/compute_fbank_feats.py / kaldi compute-fbank-feats): wav.scp
-> per-utt .npy + feats.scp consumable by the npy loader type."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.frontends.default import DefaultFrontend


def compute(output_dir, wav_scp, n_fft: int = 512, hop_length: int = 128,
            n_mels: int = 80, fs: int = 16000):
    from espnet_tpu.data.batching import bucket_length
    from espnet_tpu.data.fileio import SoundScpReader
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    fe = DefaultFrontend(n_fft=int(n_fft), hop_length=int(hop_length),
                         n_mels=int(n_mels), fs=int(fs))
    jfe = jax.jit(lambda s, l: fe(s, l))
    reader = SoundScpReader(wav_scp)
    with open(out / "feats.scp", "w", encoding="utf-8") as scp:
        for k in reader.keys():
            _, wav = reader[k]
            wav = np.asarray(wav, np.float32)
            n = len(wav)
            L = bucket_length(n, base=1024, growth=1.2)
            feats, flens = jfe(jnp.asarray(np.pad(wav, (0, L - n))[None]),
                               jnp.asarray([n], jnp.int32))
            arr = np.asarray(feats[0, :int(flens[0])])
            np.save(out / f"{k}.npy", arr)
            scp.write(f"{k} {out / f'{k}.npy'}\n")
    return out / "feats.scp"


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    compute(**kw)


if __name__ == "__main__":
    main()
