"""Enhancement scoring (contract: espnet2/bin/enh_scoring.py — SI-SNR /
SDR / SNR between reference and enhanced scp pairs, permutation-aware)."""

from __future__ import annotations

import sys
from itertools import permutations
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from espnet_tpu.data.fileio import SoundScpReader
from espnet_tpu.models.enh.losses import si_snr_loss, snr_loss
from espnet_tpu.utils.config import parse_cli_overrides


def sdr(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    """Plain SDR (no scaling/projection)."""
    noise = est - ref
    return float(10 * np.log10((np.sum(ref ** 2) + eps)
                               / (np.sum(noise ** 2) + eps)))


def score_pairs(ref_scps, enh_scps, output_dir=None):
    """ref_scps/enh_scps: lists of scp paths (one per speaker).
    Returns dict of mean metrics with best-permutation matching."""
    refs = [SoundScpReader(p) for p in ref_scps]
    enhs = [SoundScpReader(p) for p in enh_scps]
    n_spk = len(refs)
    keys = list(refs[0].keys())
    totals = {"si_snr": 0.0, "sdr": 0.0, "snr": 0.0}
    per_utt = {}
    for k in keys:
        r = [rd[k][1] for rd in refs]
        e = [rd[k][1] for rd in enhs]
        S = min(min(len(x) for x in r), min(len(x) for x in e))
        r = [x[:S] for x in r]
        e = [x[:S] for x in e]
        best = None
        for perm in permutations(range(n_spk)):
            si = np.mean([-float(si_snr_loss(
                jnp.asarray(e[i])[None], jnp.asarray(r[p])[None])[0])
                for i, p in enumerate(perm)])
            if best is None or si > best[0]:
                best = (si, perm)
        si, perm = best
        sd = np.mean([sdr(e[i], r[p]) for i, p in enumerate(perm)])
        sn = np.mean([-float(snr_loss(jnp.asarray(e[i])[None],
                                      jnp.asarray(r[p])[None])[0])
                      for i, p in enumerate(perm)])
        per_utt[k] = {"si_snr": si, "sdr": sd, "snr": sn}
        for m, v in per_utt[k].items():
            totals[m] += v
    means = {m: v / max(len(keys), 1) for m, v in totals.items()}
    if output_dir is not None:
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        for m in totals:
            with open(out / m.upper(), "w") as f:
                for k in keys:
                    f.write(f"{k} {per_utt[k][m]:.4f}\n")
        (out / "RESULTS").write_text(
            "".join(f"{m}: {v:.4f}\n" for m, v in means.items()))
    return means


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    ref = args.pop("ref_scp")
    enh = args.pop("inf_scp", None) or args.pop("enh_scp")
    if isinstance(ref, str):
        ref = [ref]
    if isinstance(enh, str):
        enh = [enh]
    means = score_pairs(ref, enh, args.get("output_dir"))
    print(" ".join(f"{m}={v:.3f}" for m, v in means.items()))


if __name__ == "__main__":
    main()
