#!/usr/bin/env python3
"""Round-5e probe: is threefry dropout RNG the VPU sink?

Measures fwd/vg with dropout+specaug (threefry), without (deterministic),
and with the rbg PRNG (TPU hardware RNG; what T5X uses for exactly this
reason). Carry-dependent scan bodies (see diag_step_r5c.py header).
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

OUT = {}


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def time_scan(name, fn, args, k=8, reps=4):
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
    from espnet_tpu.utils.config import load_yaml

    asset = ROOT / "assets" / "synth_asr_flagship"
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
    batch = {k: jnp.asarray(v) for k, v in tb.items()}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, **batch,
                        deterministic=False)

    def run(tag, rngs, det):
        def loss_at(c, p, b):
            bb = dict(b)
            bb["speech"] = b["speech"] + c * 1e-20
            loss, stats, w = model.apply(p, **bb, deterministic=det,
                                         rngs=None if det else rngs)
            return loss.astype(jnp.float32)

        time_scan(f"fwd_{tag}", loss_at, (params, batch))

        def vg_at(c, p, b):
            loss, g = jax.value_and_grad(lambda pp: loss_at(c, pp, b))(p)
            return loss + optax.global_norm(g)

        time_scan(f"vg_{tag}", vg_at, (params, batch))

    tf_rngs = {"dropout": rng, "specaug": jax.random.fold_in(rng, 1)}
    run("det", None, True)
    run("threefry", tf_rngs, False)

    rbg = jax.random.key(0, impl="rbg")
    rbg_rngs = {"dropout": rbg, "specaug": jax.random.fold_in(rbg, 1)}
    run("rbg", rbg_rngs, False)

    Path("/tmp/diag_step_r5e.json").write_text(json.dumps(OUT, indent=1))
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
