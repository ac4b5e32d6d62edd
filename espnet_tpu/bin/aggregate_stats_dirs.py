"""Merge sharded collect-stats outputs
(contract: espnet2/bin/aggregate_stats_dirs.py — sum feats_stats npz
counters and concatenate shape files across nj shards)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from espnet_tpu.utils.config import parse_cli_overrides


def aggregate_stats_dirs(input_dir, output_dir):
    """input_dir: list of shard stat dirs (each with train/ valid/)."""
    if isinstance(input_dir, str):
        input_dir = [input_dir]
    out = Path(output_dir)
    for split in ("train", "valid"):
        shards = [Path(d) / split for d in input_dir
                  if (Path(d) / split).exists()]
        if not shards:
            continue
        (out / split).mkdir(parents=True, exist_ok=True)
        # concatenate every shape file present
        names = {p.name for s in shards for p in s.glob("*_shape")}
        for name in names:
            with open(out / split / name, "w", encoding="utf-8") as f:
                for s in shards:
                    p = s / name
                    if p.exists():
                        f.write(p.read_text(encoding="utf-8"))
        # sum stats npz
        count, ssum, ssq = 0, None, None
        for s in shards:
            p = s / "feats_stats.npz"
            if not p.exists():
                continue
            d = np.load(p)
            count += int(d["count"])
            ssum = d["sum"] if ssum is None else ssum + d["sum"]
            ssq = d["sum_square"] if ssq is None else ssq + d["sum_square"]
        if ssum is not None:
            np.savez(out / split / "feats_stats.npz", count=count, sum=ssum,
                     sum_square=ssq)
    return out


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    aggregate_stats_dirs(**args)


if __name__ == "__main__":
    main()
