#!/usr/bin/env python3
"""Per-component device-time ablation of the flagship train step.

profile_dispatch.py separates dispatch overhead from device step time;
this bin answers the next question — WHERE the device time goes — by
timing jitted sub-programs of the same flagship config (K-step scan to
amortize dispatch, hard sync by pulling a scalar):

- full_step      : fwd + bwd + adam update (the production step)
- fwd_loss       : forward loss only, train mode (dropout + specaug RNG)
- fwd_loss_det   : forward loss only, deterministic (no RNG traffic)
- encode         : frontend -> specaug -> mvn -> encoder (deterministic)
- frontend       : stft + logmel + global-mvn only
- each of the above in fp32 and in the production mixed-precision bf16
  path (fp32 master params, bf16 compute — train/trainer.py:46).

Differences localize cost: full-fwd = bwd+optimizer; fwd-encode =
decoder+ctc losses; encode-frontend = encoder stack; fwd - fwd_det =
dropout/specaug RNG. The reference has no analogue (torch profiler fills
this role); on TPU through the axon tunnel an on-device ablation is the
honest way to attribute time.

Run: python -m espnet_tpu.bin.profile_ablate --out docs/ABLATE_r04.json
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def _hard_sync(tree):
    import jax
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
        break


def _time_scan(fn, args, K: int, n_rep: int = 3):
    """Median wall time per inner step of jit(scan(fn)) over K steps.

    fn(carry, *args) must USE the carry (perturb an input by
    carry * 1e-20): a loop-invariant body gets hoisted out of the scan
    by XLA and the measurement collapses to dispatch-floor/K (this bug
    produced the fake sub-metrics in ABLATE_r04)."""
    import jax

    def scanned(*a):
        def body(carry, _):
            out = fn(carry, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.ravel()[0].astype(np.float32), None
        tot, _ = jax.lax.scan(body, np.float32(0.0), None, length=K)
        return tot

    jfn = jax.jit(scanned)
    out = jfn(*args)
    _hard_sync(out)  # compile + warm
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = jfn(*args)
        _hard_sync(out)
        ts.append(time.perf_counter() - t0)
    flops = None
    try:
        an = jfn.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        flops = float(an.get("flops", 0.0)) or None
    except Exception:
        pass
    return float(np.median(ts)) / K, flops


LARGE_CFG = {
    # the reference's production LibriSpeech conformer (egs2/librispeech/
    # asr1/conf/tuning/train_asr_conformer10_hop_length160.yaml): 512-d /
    # 8h / 2048-FF / 12L encoder + 6L decoder, 5k BPE. MFU on the tiny
    # 256-d flagship is VPU-floor-bound; this is the production scale.
    "token_list": [f"<tok{i}>" for i in range(5000)],
    "frontend": "default",
    "frontend_conf": {"n_fft": 512, "hop_length": 160, "n_mels": 80},
    "specaug": "specaug",
    "specaug_conf": {},
    "normalize": "utterance_mvn",
    "encoder": "conformer",
    "encoder_conf": {"output_size": 512, "attention_heads": 8,
                     "linear_units": 2048, "num_blocks": 12},
    "decoder": "transformer",
    "decoder_conf": {"attention_heads": 8, "linear_units": 2048,
                     "num_blocks": 6},
    "model_conf": {"ctc_weight": 0.3},
}


def profile(dtype: str, K: int = 8, B: int = 32, S: int = 56000,
            L: int = 48, scale: str = "flagship", rng_impl: str = "rbg"):
    import jax
    import jax.numpy as jnp

    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.train.optim import build_optimizer
    from espnet_tpu.train.trainer import make_train_step
    from espnet_tpu.utils.config import load_yaml

    root = Path(__file__).resolve().parents[2]
    if scale == "large":
        cfg = dict(LARGE_CFG)
    else:
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
    init_rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": init_rng, "dropout": init_rng},
        **{k: jnp.asarray(v) for k, v in tb.items()}, deterministic=False)
    # production trainer keys (train/trainer.py rng_impl: rbg on TPU —
    # threefry random bits were 34% of the small-model step)
    rng = jax.random.key(0, impl=rng_impl)
    tx = build_optimizer("adam", lr=1e-3, grad_clip=5.0, flatten=True)
    opt = tx.init(params)
    batch = {k: jnp.asarray(v) for k, v in tb.items()}
    bf16 = dtype in ("bfloat16", "bf16")
    cdt = jnp.bfloat16 if bf16 else None

    def cast(tree):
        if cdt is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def model_apply(p, b, rngs):
        return model.apply(p, **b, deterministic=rngs is None, rngs=rngs)

    base_step = make_train_step(model_apply, tx,
                                compute_dtype=dtype if bf16 else None)
    out = {}

    # full step: reuse the K-scan form of trainer.steps_per_dispatch
    def full(p, o, b, r):
        def body(carry, _):
            p, o = carry
            p, o, stats, w = base_step(p, o, b, r)
            return (p, o), stats["loss"]
        (_, _), losses = jax.lax.scan(body, (p, o), None, length=K)
        return losses.sum()

    jfull = jax.jit(full)
    res = jfull(params, opt, batch, rng)
    _hard_sync(res)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = jfull(params, opt, batch, rng)
        _hard_sync(res)
        ts.append(time.perf_counter() - t0)
    full_flops = None
    try:
        an = jfull.lower(params, opt, batch, rng).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        full_flops = float(an.get("flops", 0.0)) or None
    except Exception:
        pass
    out["full_step"] = {"s": float(np.median(ts)) / K, "flops": full_flops}

    rngs = {"dropout": rng, "specaug": jax.random.fold_in(rng, 1)}

    def _perturb(b, c):
        bb = dict(b)
        bb["speech"] = bb["speech"] + c.astype(bb["speech"].dtype) * 1e-20
        return bb

    def fwd(c, p, b):
        loss, stats, w = model.apply(cast(p), **_perturb(cast(b), c),
                                     deterministic=False, rngs=rngs)
        return loss.astype(jnp.float32)

    def fwd_det(c, p, b):
        loss, stats, w = model.apply(cast(p), **_perturb(cast(b), c),
                                     deterministic=True)
        return loss.astype(jnp.float32)

    def encode(c, p, b):
        s = b["speech"].astype(cdt or jnp.float32) + c * 1e-20
        enc, el = model.apply(cast(p), s, b["speech_lengths"],
                              deterministic=True, method=model.encode)
        return enc

    from espnet_tpu.frontends.default import DefaultFrontend
    fe = DefaultFrontend(**(cfg.get("frontend_conf") or {}))

    def frontend(c, p, b):
        feats, fl = fe(b["speech"].astype(cdt or jnp.float32) + c * 1e-20,
                       b["speech_lengths"])
        return feats

    for name, fn, args in [
            ("fwd_loss", fwd, (params, batch)),
            ("fwd_loss_det", fwd_det, (params, batch)),
            ("encode", encode, (params, batch)),
            ("frontend", frontend, (params, batch))]:
        s, fl = _time_scan(fn, args, K)
        out[name] = {"s": s, "flops": fl}

    peak = 197e12
    for v in out.values():
        v["s"] = round(v["s"], 5)
        if v.get("flops"):
            v["mfu"] = round(v["flops"] / v["s"] / peak, 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--scale", default="flagship",
                    choices=["flagship", "large"])
    ap.add_argument("--rng", default="rbg",
                    choices=["rbg", "threefry2x32"])
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    res = {d: profile(d, K=args.k, B=args.batch, scale=args.scale,
                      rng_impl=args.rng) for d in args.dtypes}
    text = json.dumps(res, indent=1)
    print(text)
    if args.out:
        Path(args.out).write_text(text + "\n")


if __name__ == "__main__":
    main()
