#!/usr/bin/env python3
"""Dispatch-latency profile of the flagship train step.

Separates *device compute time* from *per-dispatch overhead* (through
the axon tunnel the latter is seconds-scale) by sweeping K in the
K-step `lax.scan` train dispatch (train/trainer.py steps_per_dispatch)
and fitting  wall(K) = overhead + K * device_step  by least squares.
Each point is a median over synced dispatches — `block_until_ready`
does not actually wait through the tunnel, so every sample pulls one
scalar to the host (cannot return before the program finishes).

The reference measures RTF with
egs2/TEMPLATE/asr1/pyscripts/utils/calculate_rtf.py; this bin is the
TPU-side analogue for the training path, and its JSON output is the
VERDICT-r2 "profile artifact proving the residual is tunnel dispatch".

Run:  python -m espnet_tpu.bin.profile_dispatch --out docs/PROFILE.json
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def profile(dtype: str = "float32", ks=(1, 2, 4, 8, 16),
            n_rep: int = 3, B: int = 32, S: int = 56000, L: int = 48):
    import jax
    import jax.numpy as jnp
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.train.optim import build_optimizer
    from espnet_tpu.train.trainer import make_train_step
    from espnet_tpu.utils.config import load_yaml

    root = Path(__file__).resolve().parents[2]
    asset = root / "assets" / "synth_asr_flagship"
    cfg = load_yaml(asset / "config.yaml")
    cfg["token_list"] = str(asset / "tokens.txt")
    cfg["stats_file"] = str(asset / "feats_stats.npz")
    model = ASRTask.build_model(cfg)

    tb = {"speech": np.random.RandomState(0).randn(B, S).astype(np.float32)
          * 0.1,
          "speech_lengths": np.full((B,), S, np.int32),
          "text": np.ones((B, L), np.int32),
          "text_lengths": np.full((B,), L, np.int32)}
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        **{k: jnp.asarray(v) for k, v in tb.items()}, deterministic=False)
    tx = build_optimizer("adam", lr=1e-3, grad_clip=5.0)

    def model_apply(p, b, rngs):
        return model.apply(p, **b, deterministic=rngs is None, rngs=rngs)

    # the production mixed-precision path (train_dtype config): fp32
    # master params, bf16 forward/backward with fp32 loss islands —
    # NOT a params-only cast, which leaves every matmul promoted to f32
    base_step = make_train_step(
        model_apply, tx,
        compute_dtype=dtype if dtype in ("bfloat16", "bf16") else None)

    def scan_step(p, opt, bK, rngs):
        def body(carry, xs):
            p, opt = carry
            b, r = xs
            p, opt, stats, w = base_step(p, opt, b, r)
            return (p, opt), (stats, w)
        (p, opt), (stats, ws) = jax.lax.scan(body, (p, opt), (bK, rngs))
        return p, opt, stats, ws

    step = jax.jit(scan_step, donate_argnums=(0, 1))
    opt = tx.init(params)
    # donated buffers die on first dispatch; keep host copies so every
    # K starts from identical state
    params_h = jax.tree_util.tree_map(np.asarray, params)
    opt_h = jax.tree_util.tree_map(np.asarray, opt)
    flops = None
    points = []
    for K in ks:
        tbK = {k: np.stack([v] * K) for k, v in tb.items()}
        rngs = jax.random.split(jax.random.PRNGKey(0), K)
        import jax.numpy as _jnp
        p = jax.tree_util.tree_map(_jnp.asarray, params_h)
        o = jax.tree_util.tree_map(_jnp.asarray, opt_h)
        p, o, stats, _ = step(p, o, tbK, rngs)       # compile + warm
        np.asarray(stats["loss"])                    # hard sync
        if flops is None:
            try:
                an = step.lower(p, o, tbK, rngs).compile().cost_analysis()
                if isinstance(an, list):
                    an = an[0]
                # cost_analysis reports the scan body once -> per step
                flops = float(an.get("flops", 0.0)) or None
            except Exception:
                pass
        samples = []
        for i in range(n_rep):
            t0 = time.perf_counter()
            p, o, stats, _ = step(p, o, tbK,
                                  jax.random.split(jax.random.PRNGKey(i), K))
            np.asarray(stats["loss"])                # hard sync
            samples.append(time.perf_counter() - t0)
        points.append((K, float(np.median(samples))))
        del p, o

    karr = np.asarray([k for k, _ in points], np.float64)
    tarr = np.asarray([t for _, t in points], np.float64)
    slope, intercept = np.polyfit(karr, tarr, 1)
    peak = 197e12  # v5e bf16 peak (f32 matmuls run as bf16 MXU passes)
    return {
        "dtype": dtype,
        "batch": B, "samples": S, "label_len": L,
        "points": [{"K": int(k), "wall_s": round(t, 4)}
                   for k, t in points],
        "device_step_s": round(float(slope), 4),
        "dispatch_overhead_s": round(float(intercept), 4),
        "flops_per_step": flops,
        "device_mfu": (round(flops / float(slope) / peak, 4)
                       if flops and slope > 0 else None),
        "wall_mfu_at_k1": (round(flops / float(tarr[0]) / peak, 4)
                           if flops else None),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--dtypes", nargs="+",
                    default=["float32", "bfloat16"])
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    args = ap.parse_args()
    out = {"profiles": [profile(d, ks=tuple(args.ks))
                        for d in args.dtypes]}
    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        Path(args.out).write_text(text + "\n")


if __name__ == "__main__":
    main()
