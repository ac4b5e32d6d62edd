#!/usr/bin/env python3
"""Round-5d probe: bf16-vs-f32 value_and_grad, batch scaling, and
dispatch-overhead decomposition for the bench train segment.

Carry-dependent scan bodies throughout (see diag_step_r5c.py header).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

K = 32
OUT = {}


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def time_scan(name, fn, args, k=K, reps=4):
    def scanned(*a):
        def body(carry, _):
            out = fn(carry, *a)
            return out.astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return tot
    jfn = jax.jit(scanned)
    _sync(jfn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(jfn(*args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.min(ts)) / k * 1000
    OUT[name] = round(ms, 3)
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
    import optax

    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.train.optim import build_optimizer
    from espnet_tpu.train.trainer import make_train_step
    from espnet_tpu.utils.config import load_yaml

    asset = ROOT / "assets" / "synth_asr_flagship"
    cfg = load_yaml(asset / "config.yaml")
    cfg["token_list"] = str(asset / "tokens.txt")
    cfg["stats_file"] = str(asset / "feats_stats.npz")
    model = ASRTask.build_model(cfg)

    S, L = 56000, 48

    def make_batch(B):
        tb = {"speech":
              np.random.RandomState(0).randn(B, S).astype(np.float32) * 0.1,
              "speech_lengths": np.full((B,), S, np.int32),
              "text": np.ones((B, L), np.int32),
              "text_lengths": np.full((B,), L, np.int32)}
        return {k: jnp.asarray(v) for k, v in tb.items()}

    batch32 = make_batch(32)
    batch64 = make_batch(64)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, **batch32,
                        deterministic=False)
    rngs = {"dropout": rng, "specaug": jax.random.fold_in(rng, 1)}

    def mk_loss(cdt):
        def cast(t):
            if cdt is None:
                return t
            return jax.tree_util.tree_map(
                lambda x: x.astype(cdt)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

        def loss_at(c, p, b):
            bb = dict(cast(b))
            bb["speech"] = bb["speech"] + (c * 1e-20).astype(bb["speech"].dtype)
            loss, stats, w = model.apply(cast(p), **bb, deterministic=False,
                                         rngs=rngs)
            return loss.astype(jnp.float32)
        return loss_at

    for tag, cdt, b in (("vg_f32_B32", None, batch32),
                        ("vg_bf16_B32", jnp.bfloat16, batch32),
                        ("vg_f32_B64", None, batch64),
                        ("vg_bf16_B64", jnp.bfloat16, batch64)):
        la = mk_loss(cdt)

        def vg_at(c, p, bb, _la=la):
            loss, g = jax.value_and_grad(lambda pp: _la(c, pp, bb))(p)
            return loss + optax.global_norm(g)

        time_scan(tag, vg_at, (params, b), k=8)

    # --- full train step dispatch-overhead decomposition --------------
    tx = build_optimizer("adam", lr=1e-3, grad_clip=5.0)

    def model_apply(p, b, r):
        return model.apply(p, **b, deterministic=r is None, rngs=r)

    for tag, cdt, B in (("step_f32_B32", None, 32),
                        ("step_bf16_B32", "bfloat16", 32),
                        ("step_bf16_B64", "bfloat16", 64)):
        base_step = make_train_step(model_apply, tx, compute_dtype=cdt)
        b1 = make_batch(B)
        for Kd in (8, 32):
            def scan_step(p, opt, bK, rr):
                def body(carry, xs):
                    p, opt = carry
                    bb, r = xs
                    p, opt, stats, w = base_step(p, opt, bb, r)
                    return (p, opt), stats["loss"]
                (p, opt), losses = jax.lax.scan(body, (p, opt), (bK, rr))
                return p, opt, losses
            step = jax.jit(scan_step, donate_argnums=(0, 1))
            bK = {k: jnp.asarray(np.stack([np.asarray(v)] * Kd))
                  for k, v in b1.items()}
            opt = tx.init(params)
            p = params
            rr = jax.random.split(jax.random.PRNGKey(0), Kd)
            p, opt, losses = step(p, opt, bK, rr)
            _sync(losses)
            n_disp = 3
            t0 = time.perf_counter()
            for i in range(n_disp):
                p, opt, losses = step(
                    p, opt, bK, jax.random.split(jax.random.PRNGKey(i), Kd))
            _sync(losses)
            ms = (time.perf_counter() - t0) / (n_disp * Kd) * 1000
            OUT[f"{tag}_K{Kd}"] = round(ms, 3)
            print(f"{tag}_K{Kd}: {ms:.3f} ms/step", flush=True)
            del step, p, opt, bK

    Path("/tmp/diag_step_r5d.json").write_text(json.dumps(OUT, indent=1))
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
