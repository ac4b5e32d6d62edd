#!/usr/bin/env python3
"""Localize train-step backward cost on the flagship config.

Times jitted fwd vs value_and_grad for isolated pieces of the loss:
 - full loss (ctc+att)
 - att-only loss, ctc-only loss
 - encoder-only (sum of encoder output)
 - subsample-only
 - full step at B=32 vs B=128
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

root = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(root))


def timeit(fn, args, K=8, reps=3):
    import jax

    def scanned(*a):
        def body(carry, _):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + leaf.ravel()[0].astype(np.float32), None
        tot, _ = jax.lax.scan(body, np.float32(0.0), None, length=K)
        return tot

    jfn = jax.jit(scanned)
    out = jfn(*args)
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jfn(*args)
        np.asarray(out)
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


def main():
    import jax
    import jax.numpy as jnp

    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.utils.config import load_yaml

    asset = root / "assets" / "synth_asr_flagship"
    cfg = load_yaml(asset / "config.yaml")
    cfg["token_list"] = str(asset / "tokens.txt")
    cfg["stats_file"] = str(asset / "feats_stats.npz")
    model = ASRTask.build_model(cfg)

    B, S, L = 32, 56000, 48
    tb = {"speech": np.random.RandomState(0).randn(B, S).astype(np.float32)
          * 0.1,
          "speech_lengths": np.full((B,), S, np.int32),
          "text": np.ones((B, L), np.int32),
          "text_lengths": np.full((B,), L, np.int32)}
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        **{k: jnp.asarray(v) for k, v in tb.items()}, deterministic=False)
    batch = {k: jnp.asarray(v) for k, v in tb.items()}
    out = {}

    def report(name, fwd_fn, args):
        t_f, fl_f = timeit(fwd_fn, args)
        grad_fn = jax.grad(fwd_fn)
        t_g, fl_g = timeit(grad_fn, args)
        out[name] = {
            "fwd_ms": round(t_f * 1e3, 2), "grad_ms": round(t_g * 1e3, 2),
            "ratio": round(t_g / max(t_f, 1e-9), 2),
            "fwd_gflop": round((fl_f or 0) / 1e9, 1),
            "grad_gflop": round((fl_g or 0) / 1e9, 1)}
        print(name, out[name], flush=True)

    # full loss (deterministic to remove RNG noise)
    def full_loss(p):
        loss, stats, w = model.apply(p, **batch, deterministic=True)
        return loss.astype(jnp.float32)
    report("full_loss", full_loss, (params,))

    # encoder only
    def enc_only(p):
        enc, el = model.apply(p, batch["speech"], batch["speech_lengths"],
                              deterministic=True, method=model.encode)
        return jnp.sum(enc.astype(jnp.float32))
    report("encoder_only", enc_only, (params,))

    # losses on a FROZEN (precomputed) encoder output: isolates
    # decoder-attn and ctc backward cost
    enc, el = jax.jit(lambda p: model.apply(
        p, batch["speech"], batch["speech_lengths"], deterministic=True,
        method=model.encode))(params)
    enc = jax.block_until_ready(enc)

    from espnet_tpu.ops.losses import ctc_loss

    def ctc_only(p):
        logits = model.apply(p, enc, deterministic=True,
                             method=model.ctc_logits)
        return ctc_loss(logits, el, batch["text"], batch["text_lengths"])

    try:
        report("ctc_only(frozen_enc)", ctc_only, (params,))
    except Exception as e:
        print("ctc_only failed:", e)

    def losses_frozen(p):
        loss, stats, w = model.apply(
            p, enc, el, batch["text"], batch["text_lengths"],
            deterministic=True, method=model.compute_losses)
        return loss.astype(jnp.float32)

    try:
        report("losses_frozen_enc", losses_frozen, (params,))
    except Exception as e:
        print("losses_frozen failed:", e)

    # frontend inside the grad closure vs precomputed features?
    # encoder-only already covers it; also time B=128 full loss
    B2 = 128
    tb2 = {"speech": np.random.RandomState(1).randn(B2, S).astype(
        np.float32) * 0.1,
        "speech_lengths": np.full((B2,), S, np.int32),
        "text": np.ones((B2, L), np.int32),
        "text_lengths": np.full((B2,), L, np.int32)}
    batch2 = {k: jnp.asarray(v) for k, v in tb2.items()}

    def full_loss_b128(p):
        loss, stats, w = model.apply(p, **batch2, deterministic=True)
        return loss.astype(jnp.float32)
    report("full_loss_B128", full_loss_b128, (params,))

    (root / "docs" / "DIAG_BWD.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
