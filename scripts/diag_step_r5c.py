#!/usr/bin/env python3
"""Round-3 decomposition: K-scan with CARRY-DEPENDENT bodies.

The r5/r5b probes (and profile_ablate's sub-metrics) scanned a loop-
invariant body — XLA hoists the whole computation out of the scan and
the measurement collapses to tunnel-floor/K. Here every iteration
perturbs its input by carry * 1e-20 (dynamically unknowable, numerically
nil), so the body must re-execute K times on device.
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
B, S, L = 32, 56000, 48
OUT = {}


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def time_scan(name, fn, args, k=K, reps=4):
    """fn(carry_scalar, *args) -> scalar; carry threads dependence."""
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
    from espnet_tpu.utils.config import load_yaml

    asset = ROOT / "assets" / "synth_asr_flagship"
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
    params = model.init({"params": rng, "dropout": rng},
                        **{k: jnp.asarray(v) for k, v in tb.items()},
                        deterministic=False)
    batch = {k: jnp.asarray(v) for k, v in tb.items()}
    rngs = {"dropout": rng, "specaug": jax.random.fold_in(rng, 1)}

    def loss_at(c, p, b):
        bb = dict(b)
        bb["speech"] = b["speech"] + c * 1e-20
        loss, stats, w = model.apply(p, **bb, deterministic=False,
                                     rngs=rngs)
        return loss.astype(jnp.float32)

    time_scan("fwd", loss_at, (params, batch))

    def vg_at(c, p, b):
        loss, g = jax.value_and_grad(
            lambda pp: loss_at(c, pp, b))(p)
        return loss + optax.global_norm(g)

    time_scan("vg", vg_at, (params, batch))

    tx = build_optimizer("adam", lr=1e-3, grad_clip=5.0)
    opt = tx.init(params)
    _, grads0 = jax.jit(jax.value_and_grad(
        lambda pp: loss_at(jnp.float32(0), pp, batch)))(params)

    def adam_tree(c, p, o, g):
        g = jax.tree_util.tree_map(lambda x: x + c * 1e-20, g)
        updates, new_o = tx.update(g, o, p)
        new_p = optax.apply_updates(p, updates)
        return jax.tree_util.tree_leaves(new_p)[0].ravel()[0]

    time_scan("adam_tree", adam_tree, (params, opt, grads0))

    leaves = jax.tree_util.tree_leaves(params)
    flat_p = jnp.concatenate([l.ravel() for l in leaves])
    flat_g = jnp.concatenate(
        [l.ravel() for l in jax.tree_util.tree_leaves(grads0)])
    ftx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    fopt = ftx.init(flat_p)

    def adam_flat(c, p, o, g):
        g = g + c * 1e-20
        updates, new_o = ftx.update(g, o, p)
        return optax.apply_updates(p, updates)[0]

    time_scan("adam_flat", adam_flat, (flat_p, fopt, flat_g))

    from espnet_tpu.frontends.default import DefaultFrontend
    fe = DefaultFrontend(**(cfg.get("frontend_conf") or {}))

    def fe_at(c, s, sl):
        feats, _ = fe(s + c * 1e-20, sl)
        return feats.ravel()[0]

    time_scan("fe_full", fe_at, (batch["speech"],
                                 batch["speech_lengths"]))

    def enc_at(c, p, b):
        enc, el = model.apply(p, b["speech"] + c * 1e-20,
                              b["speech_lengths"], deterministic=True,
                              method=model.encode)
        return enc.ravel()[0]

    time_scan("encode", enc_at, (params, batch))

    Path("/tmp/diag_step_r5c.json").write_text(json.dumps(OUT, indent=1))
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
