"""beats_tokenizer_train CLI (contract:
espnet2/bin/beats_tokenizer_train.py): fit the k-means acoustic
tokenizer used for BEATs / discrete-unit targets over an npy feature
scp, save centers + per-utt labels (utils/kmeans.py tooling)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from espnet_tpu.utils.kmeans import dump_km_labels, fit_kmeans


def train_tokenizer(output_dir, feats_scp, n_clusters: int = 128,
                    n_iter: int = 20, max_frames: int = 200000):
    from espnet_tpu.data.fileio import read_2columns_text
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    entries = read_2columns_text(feats_scp)
    feats = []
    total = 0
    for k, p in entries.items():
        a = np.load(p)
        feats.append(a)
        total += len(a)
        if total >= max_frames:
            break
    x = np.concatenate(feats)[:max_frames].astype(np.float32)
    centers, _inertia = fit_kmeans(x, int(n_clusters), n_iter=int(n_iter))
    np.save(out / "km_centers.npy", centers)

    def it():
        for k, p in entries.items():
            yield k, np.load(p)

    dump_km_labels(it(), centers, out / "labels")
    return out / "km_centers.npy"


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    train_tokenizer(**kw)


if __name__ == "__main__":
    main()
