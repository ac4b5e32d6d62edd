"""Real-time-factor calculator over decode output dirs.

Behavioral contract: egs2/TEMPLATE/asr1/pyscripts/utils/calculate_rtf.py
(parse per-job decode logs for audio duration + wall time; report
RTF = decode_time / audio_time and latency). Here every inference()
writes a machine-readable `decode_stats.jsonl` (one line per batch:
n_utts, audio_secs, decode_secs), so this tool aggregates those instead
of regex-scraping logs; it accepts one or more decode dirs (nj shards).

Usage: python -m espnet_tpu.bin.calculate_rtf DIR [DIR ...]
       [--exclude_first] (drop each dir's first batch: compile time)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def calculate_rtf(dirs, exclude_first: bool = True) -> dict:
    n_utts = 0
    audio = 0.0
    wall = 0.0
    for d in dirs:
        p = Path(d) / "decode_stats.jsonl"
        if not p.exists():
            raise FileNotFoundError(f"{p} (run inference() first)")
        lines = [json.loads(x) for x in p.read_text().splitlines() if x]
        if exclude_first and len(lines) > 1:
            lines = lines[1:]  # first batch pays XLA compile
        for rec in lines:
            n_utts += rec["n_utts"]
            audio += rec["audio_secs"]
            wall += rec["decode_secs"]
    rtf = wall / audio if audio else float("nan")
    return {"n_utts": n_utts, "audio_secs": round(audio, 3),
            "decode_secs": round(wall, 3), "rtf": round(rtf, 6),
            "inv_rtf": round(1.0 / rtf, 2) if rtf else None,
            "latency_secs_per_utt": round(wall / n_utts, 4)
            if n_utts else None}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--exclude_first", action="store_true", default=True)
    ap.add_argument("--include_first", dest="exclude_first",
                    action="store_false")
    args = ap.parse_args(argv)
    out = calculate_rtf(args.dirs, exclude_first=args.exclude_first)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
