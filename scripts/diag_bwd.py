#!/usr/bin/env python3
"""Localize train-step backward cost on the flagship config (honest).

Unlike profile_ablate's original scan (whose body had no loop-carried
data dependence, letting XLA hoist the whole computation out of the
K-step loop), every measurement here threads the previous iteration's
output into the next iteration's INPUT, so K real executions happen.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

root = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(root))

K = 8


def timeit(fn, params, batch, reps=3, flops=False):
    """fn(params, batch)->pytree; times K chained executions."""
    import jax
    import jax.numpy as jnp

    def scanned(p, b):
        def body(c, _):
            bb = dict(b)
            bb["speech"] = bb["speech"] + c  # loop-carried dependence
            out = fn(p, bb)
            # depend on EVERY output leaf or XLA dead-code-eliminates
            # the rest of the computation (e.g. all but one grad leaf)
            tot = sum(leaf.ravel()[0].astype(jnp.float32)
                      for leaf in jax.tree_util.tree_leaves(out))
            return (tot * 1e-24).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return tot

    jfn = jax.jit(scanned)
    out = jfn(params, batch)
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jfn(params, batch)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    fl = None
    if flops:
        try:
            an = jfn.lower(params, batch).compile().cost_analysis()
            if isinstance(an, list):
                an = an[0]
            # cost_analysis reports the scan body once (verified in
            # bench.py: identical flops at K=1 and K=8) — already per-step
            fl = (float(an.get("flops", 0.0)) or None)
        except Exception:
            pass
    return float(np.median(ts)) / K, fl


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.utils.config import load_yaml

    asset = root / "assets" / "synth_asr_flagship"
    cfg = load_yaml(asset / "config.yaml")
    cfg["token_list"] = str(asset / "tokens.txt")
    cfg["stats_file"] = str(asset / "feats_stats.npz")
    model = ASRTask.build_model(cfg)

    S, L = 56000, 48

    def make_batch(B, seed=0):
        tb = {"speech": np.random.RandomState(seed).randn(B, S).astype(
            np.float32) * 0.1,
            "speech_lengths": np.full((B,), S, np.int32),
            "text": np.ones((B, L), np.int32),
            "text_lengths": np.full((B,), L, np.int32)}
        return {k: jnp.asarray(v) for k, v in tb.items()}

    batch = make_batch(32)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, **batch,
                        deterministic=False)
    out = {}

    def show(name, t, fl=None):
        d = {"ms": round(t * 1e3, 2)}
        if fl:
            d["gflop"] = round(fl / 1e9, 1)
            d["mfu"] = round(fl / t / 197e12, 3)
        out[name] = d
        print(name, d, flush=True)

    def full_loss(p, b):
        loss, stats, w = model.apply(p, **b, deterministic=True)
        return loss.astype(jnp.float32)

    t, fl = timeit(full_loss, params, batch, flops=True)
    show("fwd_loss", t, fl)

    t, fl = timeit(jax.grad(full_loss), params, batch, flops=True)
    show("grad_loss", t, fl)

    def enc_only(p, b):
        enc, el = model.apply(p, b["speech"], b["speech_lengths"],
                              deterministic=True, method=model.encode)
        return jnp.sum(enc.astype(jnp.float32))

    t, _ = timeit(enc_only, params, batch)
    show("enc_fwd", t)
    t, _ = timeit(jax.grad(enc_only), params, batch)
    show("enc_grad", t)

    # frozen-encoder losses: grad cost of decoder + ctc heads alone
    enc, el = jax.jit(lambda p, b: model.apply(
        p, b["speech"], b["speech_lengths"], deterministic=True,
        method=model.encode))(params, batch)
    np.asarray(el)

    def losses_frozen(p, b):
        # re-inject dependence through enc (speech key carries the chain)
        e = enc + b["speech"][0, 0] * 1e-24
        loss, stats, w = model.apply(
            p, e, el, b["text"], b["text_lengths"],
            deterministic=True, method=model.compute_losses)
        return loss.astype(jnp.float32)

    t, _ = timeit(jax.grad(losses_frozen), params, batch)
    show("losses_grad(frozen_enc)", t)

    from espnet_tpu.ops.losses import ctc_loss

    def ctc_only(p, b):
        e = enc + b["speech"][0, 0] * 1e-24
        logits = model.apply(p, e, method=model.ctc_logits)
        return ctc_loss(logits, el, b["text"], b["text_lengths"])

    t, _ = timeit(jax.grad(ctc_only), params, batch)
    show("ctc_grad(frozen_enc)", t)

    def frontend_only(p, b):
        from espnet_tpu.frontends.default import DefaultFrontend
        fe = DefaultFrontend(**(cfg.get("frontend_conf") or {}))
        feats, fl_ = fe(b["speech"], b["speech_lengths"])
        return jnp.sum(feats)

    t, _ = timeit(frontend_only, params, batch)
    show("frontend_fwd", t)

    # production full step (fwd+bwd+adam), B=32 and B=128
    from espnet_tpu.train.trainer import make_train_step
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))

    def model_apply(p, b, rngs):
        return model.apply(p, **b, deterministic=rngs is None, rngs=rngs)

    step = make_train_step(model_apply, tx)

    for B in (32, 128):
        b = make_batch(B)
        opt = jax.jit(tx.init)(params)

        def full(p, o, bb, r):
            def body(carry, _):
                p, o = carry
                p, o, stats, w = step(p, o, bb, r)
                return (p, o), stats["loss"]
            (_, _), losses = jax.lax.scan(body, (p, o), None, length=K)
            return losses.sum()

        jfull = jax.jit(full)
        res = jfull(params, opt, b, rng)
        np.asarray(res)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = jfull(params, opt, b, rng)
            np.asarray(res)
            ts.append(time.perf_counter() - t0)
        fl = None
        try:
            an = jfull.lower(params, opt, b, rng).compile().cost_analysis()
            if isinstance(an, list):
                an = an[0]
            fl = float(an.get("flops", 0.0)) or None
        except Exception:
            pass
        show(f"full_step_B{B}", float(np.median(ts)) / K, fl)

    (root / "docs" / "DIAG_BWD.json").write_text(json.dumps(out, indent=1))
    print("saved docs/DIAG_BWD.json")


if __name__ == "__main__":
    main()
