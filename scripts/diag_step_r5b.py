#!/usr/bin/env python3
"""Round-2 decomposition with K=64 scan amortization (the K=8 runs were
dominated by the ~30 ms axon tunnel round trip / dispatch floor).

Also compares per-tensor adam (315 leaves) vs flat-buffer adam (1 leaf)
to quantify small-kernel overhead in the optimizer tail.
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

K = 64
B, S, L = 32, 56000, 48
OUT = {}


def _sync(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
        break


def time_scan(name, fn, args, k=K, reps=4):
    def scanned(*a):
        def body(carry, _):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + leaf.ravel()[0].astype(jnp.float32), None
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

    def loss_fn(p):
        loss, stats, w = model.apply(p, **batch, deterministic=False,
                                     rngs=rngs)
        return loss.astype(jnp.float32)

    time_scan("fwd", loss_fn, (params,), k=32)
    vg = jax.value_and_grad(loss_fn)

    def vg_consume(p):
        loss, g = vg(p)
        # consume every grad leaf so nothing is DCE'd; one fused pass
        return loss + optax.global_norm(g)

    time_scan("vg", vg_consume, (params,), k=32)

    tx = build_optimizer("adam", lr=1e-3, grad_clip=5.0)
    opt = tx.init(params)
    _, grads0 = jax.jit(vg)(params)

    def adam_tree(p, o, g):
        updates, new_o = tx.update(g, o, p)
        new_p = optax.apply_updates(p, updates)
        return jax.tree_util.tree_leaves(new_p)[0]

    time_scan("adam_tree", adam_tree, (params, opt, grads0))

    # flat-buffer adam: one fused elementwise pass over 14.5M params
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    flat_p = jnp.concatenate([l.ravel() for l in leaves])
    flat_g = jnp.concatenate(
        [l.ravel() for l in jax.tree_util.tree_leaves(grads0)])
    ftx = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.adam(1e-3))
    fopt = ftx.init(flat_p)

    def adam_flat(p, o, g):
        updates, new_o = ftx.update(g, o, p)
        return optax.apply_updates(p, updates)

    time_scan("adam_flat", adam_flat, (flat_p, fopt, flat_g))

    # frontend at K=64
    from espnet_tpu.frontends.default import DefaultFrontend
    fe = DefaultFrontend(**(cfg.get("frontend_conf") or {}))
    time_scan("fe_full", lambda s: fe(s, batch["speech_lengths"])[0],
              (batch["speech"],))
    time_scan("noop", lambda s: s[0, 0] + 1.0, (batch["speech"],))

    Path("/tmp/diag_step_r5b.json").write_text(json.dumps(OUT, indent=1))
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
