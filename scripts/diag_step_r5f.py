#!/usr/bin/env python3
"""Split the full_step - grad_loss gap (7.5 ms of a 19 ms step in
DIAG_BWD r5): dropout/specaug rng work vs optimizer update vs the
non-finite guard where-passes. Also re-times ctc_grad after the
scan-unroll change. Carry-dependent bodies as in diag_bwd.py."""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

root = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(root))

K = 8


def timeit(fn, *args, reps=3):
    import jax
    import jax.numpy as jnp

    def scanned(*a):
        def body(c, _):
            aa = list(a)
            aa[-1] = jax.tree_util.tree_map(
                lambda x: (x + c).astype(x.dtype)
                if hasattr(x, "dtype") and x.dtype in (jnp.float32,)
                else x, aa[-1])
            out = fn(*aa)
            tot = sum(leaf.ravel()[0].astype(jnp.float32)
                      for leaf in jax.tree_util.tree_leaves(out)
                      if hasattr(leaf, "ravel") and leaf.size)
            return (tot * 1e-24).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return tot

    jfn = jax.jit(scanned)
    np.asarray(jfn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)) / K


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

    B, S, L = 32, 56000, 48
    tb = {"speech": np.random.RandomState(0).randn(B, S).astype(
        np.float32) * 0.1,
        "speech_lengths": np.full((B,), S, np.int32),
        "text": np.ones((B, L), np.int32),
        "text_lengths": np.full((B,), L, np.int32)}
    batch = {k: jnp.asarray(v) for k, v in tb.items()}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, **batch,
                        deterministic=False)
    rbg = jax.random.key(0, impl="rbg")
    rngs = {"dropout": rbg, "specaug": jax.random.split(rbg, 2)[1]}
    out = {}

    def show(name, t):
        out[name] = round(t * 1e3, 2)
        print(f"{name}: {t * 1e3:.2f} ms", flush=True)

    def loss_det(p, b):
        loss, _, _ = model.apply(p, **b, deterministic=True)
        return loss.astype(jnp.float32)

    def loss_rng(p, b):
        loss, _, _ = model.apply(p, **b, deterministic=False, rngs=rngs)
        return loss.astype(jnp.float32)

    show("grad_det", timeit(lambda p, b: jax.grad(loss_det)(p, b),
                            params, batch))
    show("grad_rng", timeit(lambda p, b: jax.grad(loss_rng)(p, b),
                            params, batch))

    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(1e-3))
    opt0 = tx.init(params)

    def grad_adam(p, b):
        g = jax.grad(loss_det)(p, b)
        upd, opt = tx.update(g, opt0, p)
        return optax.apply_updates(p, upd)

    show("grad_det_adam", timeit(grad_adam, params, batch))

    def grad_adam_guard(p, b):
        g = jax.grad(loss_det)(p, b)
        gnorm = optax.global_norm(g)
        ok = jnp.isfinite(gnorm)
        g = jax.tree_util.tree_map(
            lambda x: jnp.where(ok, x, jnp.zeros_like(x)), g)
        upd, opt = tx.update(g, opt0, p)
        newp = optax.apply_updates(p, upd)
        newp = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), newp, p)
        opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), opt, opt0)
        return newp

    show("grad_det_adam_guard", timeit(grad_adam_guard, params, batch))

    # ctc grad after the unroll change (compare DIAG_BWD ctc_grad 4.82)
    from espnet_tpu.ops.losses import ctc_loss
    enc, el = jax.jit(lambda p, b: model.apply(
        p, b["speech"], b["speech_lengths"], deterministic=True,
        method=model.encode))(params, batch)
    np.asarray(el)
    Tn = int(enc.shape[1])

    def ctc_only(p, b):
        e = enc + b["speech"][0, 0] * 1e-24
        lo = model.apply(p, e, method=model.ctc_logits) \
            if hasattr(model, "ctc_logits") else None
        if lo is None:
            # fall back: project via the model's ctc head params
            loss, _, _ = model.apply(
                p, e, el, b["text"], b["text_lengths"],
                deterministic=True, method=model.compute_losses)
            return loss.astype(jnp.float32)
        return jnp.sum(lo)

    show("losses_grad_frozen", timeit(
        lambda p, b: jax.grad(ctc_only)(p, b), params, batch))

    (root / "docs" / "DIAG_STEP_R5F.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
