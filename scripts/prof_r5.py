#!/usr/bin/env python3
"""Round-5 MFU attack: fine-grained ablation of the flagship train step.

Times (real chip, K-step scan, hard sync):
  fwd_det        forward loss, deterministic
  fwd_rng        forward loss with dropout+specaug rngs
  grad           value_and_grad only (fwd+bwd), train mode
  grad_det       value_and_grad, deterministic model (no dropout)
  step           full production step (grad + adam + skip)
  grad_feats     grad with frontend bypassed (precomputed log-mel feats)
  grad_noctc     grad with ctc_weight effectively 0 path cost (att only)
  grad_noatt     grad with ctc only
  frontend       frontend forward alone
Run: python scripts/prof_r5.py [--dtype bf16] [--batch 32]
"""
import argparse
import json
import time
from pathlib import Path

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--dtype", default="bf16")
p.add_argument("--batch", type=int, default=32)
p.add_argument("--rbg", action="store_true", help="use rbg PRNG impl")
p.add_argument("--K", type=int, default=8)
p.add_argument("--only", default="")
args = p.parse_args()

if args.rbg:
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

import jax
import jax.numpy as jnp

from espnet_tpu.tasks.asr import ASRTask
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import make_train_step
from espnet_tpu.utils.config import load_yaml

PEAK = 197e12  # v5e bf16 peak

root = Path(__file__).resolve().parents[1]
asset = root / "assets" / "synth_asr_flagship"
cfg = load_yaml(asset / "config.yaml")
cfg["token_list"] = str(asset / "tokens.txt")
cfg["stats_file"] = str(asset / "feats_stats.npz")
model = ASRTask.build_model(cfg)

B, S, L = args.batch, 56000, 48
tb = {"speech": np.random.RandomState(0).randn(B, S).astype(np.float32) * 0.1,
      "speech_lengths": np.full((B,), S, np.int32),
      "text": np.ones((B, L), np.int32),
      "text_lengths": np.full((B,), L, np.int32)}
rng = jax.random.PRNGKey(0)
params = model.init({"params": rng, "dropout": rng},
                    **{k: jnp.asarray(v) for k, v in tb.items()},
                    deterministic=False)
n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"n_params={n_params/1e6:.2f}M")
tx = build_optimizer("adam", lr=1e-3, grad_clip=5.0)
opt = tx.init(params)
batch = {k: jnp.asarray(v) for k, v in tb.items()}

bf16 = args.dtype in ("bf16", "bfloat16")
cdt = jnp.bfloat16 if bf16 else None


def cast(tree):
    if cdt is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(cdt)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def model_apply(pp, b, rngs):
    return model.apply(pp, **b, deterministic=rngs is None, rngs=rngs)


def timeit(name, fn, *a, K=args.K):
    def scanned(*aa):
        def body(carry, _):
            out = fn(*aa)
            # consume EVERY leaf so XLA cannot DCE any of the program
            acc = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                if hasattr(leaf, "ravel"):
                    acc = acc + jnp.sum(leaf).astype(jnp.float32)
            return carry + acc, None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return tot
    jfn = jax.jit(scanned)
    t0 = time.perf_counter()
    out = jfn(*a); np.asarray(out)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(*a); np.asarray(out)
        ts.append(time.perf_counter() - t0)
    per = float(np.median(ts)) / K
    flops = None
    try:
        an = jfn.lower(*a).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        flops = float(an.get("flops", 0.0)) / K
    except Exception:
        pass
    mfu = (flops / per / PEAK) if flops else 0.0
    print(f"{name:14s} {per*1e3:8.3f} ms  {flops/1e9 if flops else 0:9.1f} GF  mfu={mfu:.3f}  (compile {compile_s:.1f}s)")
    return per


def rngs_for(r):
    ks = jax.random.split(r, 2)
    return {"dropout": ks[0], "specaug": ks[1]}


only = set(args.only.split(",")) if args.only else None


def want(n):
    return only is None or n in only


bc = cast(batch)
pc = cast(params)

if want("fwd_det"):
    timeit("fwd_det", lambda p: model_apply(cast(p), bc, None)[0], params)
if want("fwd_rng"):
    timeit("fwd_rng", lambda p, r: model_apply(cast(p), bc, rngs_for(r))[0], params, rng)

def loss_fn_rng(p, r):
    loss, (st, w) = model_apply(cast(p), bc, rngs_for(r))[0], (None, None)
    return loss.astype(jnp.float32)

if want("grad"):
    g = jax.grad(lambda p, r: model_apply(cast(p), bc, rngs_for(r))[0].astype(jnp.float32))
    timeit("grad", g, params, rng)
if want("grad_det"):
    gd = jax.grad(lambda p: model_apply(cast(p), bc, None)[0].astype(jnp.float32))
    timeit("grad_det", gd, params)
if want("step"):
    step = make_train_step(model_apply, tx, compute_dtype=args.dtype if bf16 else None)
    timeit("step", lambda p, o, b, r: step(p, o, b, r)[0], params, opt, batch, rng)

# frontend forward alone + grad with precomputed feats
if want("frontend") or want("grad_feats"):
    def frontend_only(p, s, sl):
        def fe(m, s, sl):
            return m._frontend(s, sl)
        return model.apply(p, s.astype(jnp.float32), sl, method=fe)
    if want("frontend"):
        timeit("frontend", lambda p, s, sl: frontend_only(p, s, sl)[0],
               params, bc["speech"], batch["speech_lengths"])
print("done")
