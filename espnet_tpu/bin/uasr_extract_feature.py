"""Extract SSL features for UASR (contract: espnet2/bin/
uasr_extract_feature.py — dump frame features per utterance for the
wav2vec-U pipeline). The extractor is the in-repo wav2vec2-style
frontend (random-init or converted weights) or the log-mel default;
features land as an npy scp consumable by UASRTask."""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def extract(output_dir, wav_scp, frontend: str = "default",
            frontend_conf=None, batch_size: int = 8,
            fixed_samples: int = 0):
    from espnet_tpu.data.fileio import NpyScpWriter, SoundScpReader
    if frontend == "wav2vec2":
        from espnet_tpu.frontends.ssl_frontend import Wav2Vec2Frontend
        fe = Wav2Vec2Frontend(**dict(frontend_conf or {}))
    elif frontend == "hugging_face":
        from espnet_tpu.frontends.hf_frontend import HuggingFaceFrontend
        fe = HuggingFaceFrontend(**dict(frontend_conf or {}))
    else:
        from espnet_tpu.frontends.default import DefaultFrontend
        fe = DefaultFrontend(**dict(frontend_conf or {"n_fft": 512,
                                                      "hop_length": 160,
                                                      "n_mels": 80}))
    reader = SoundScpReader(wav_scp)
    keys = list(reader.keys())
    out = Path(output_dir)
    params = None
    apply = None
    with NpyScpWriter(out / "feats", out / "feats.scp") as w:
        for i in range(0, len(keys), batch_size):
            chunk = keys[i:i + batch_size]
            wavs, lens = [], []
            S = fixed_samples
            if not S:
                S = max(len(np.atleast_1d(reader[k][1])) for k in chunk)
            for k in chunk:
                _, wav = reader[k]
                wav = np.asarray(wav, np.float32)[:S]
                lens.append(len(wav))
                wavs.append(np.pad(wav, (0, S - len(wav))))
            pad = batch_size - len(chunk)
            if pad:
                wavs += [np.zeros((S,), np.float32)] * pad
                lens += [S] * pad
            speech = jnp.asarray(np.stack(wavs))
            slens = jnp.asarray(lens, jnp.int32)
            if params is None:
                params = fe.init(jax.random.PRNGKey(0), speech, slens)
                apply = jax.jit(lambda p, s, sl: fe.apply(p, s, sl))
            feats, flens = apply(params, speech, slens)
            feats = np.asarray(feats)
            flens = np.asarray(flens)
            for j, k in enumerate(chunk):
                w[k] = feats[j, :int(flens[j])].astype(np.float32)
    return len(keys)


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    n = extract(**kw)
    print(f"extracted {n} utterances")


if __name__ == "__main__":
    main()
