#!/usr/bin/env python3
"""Probe: new phase-decomposition STFT cost; Conv2dSubsampling fwd/grad
cost in isolation (it is ~40% of flagship step FLOPs)."""
from __future__ import annotations

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
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                aa[-1])
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

    from espnet_tpu.frontends.default import DefaultFrontend
    from espnet_tpu.nn.subsampling import Conv2dSubsampling

    B, S = 32, 56000
    speech = jnp.asarray(np.random.RandomState(0).randn(B, S)
                         .astype(np.float32) * 0.1)
    lens = jnp.full((B,), S, jnp.int32)
    fe = DefaultFrontend(n_fft=512, hop_length=128, n_mels=80)

    t = timeit(lambda s, l: fe(s, l)[0], speech, lens)
    print(f"frontend_fwd(new stft): {t * 1e3:.2f} ms", flush=True)

    sub = Conv2dSubsampling(odim=256)
    T = 438
    feats = jnp.asarray(np.random.RandomState(1).randn(B, T, 80)
                        .astype(np.float32))
    flens = jnp.full((B,), T, jnp.int32)
    params = sub.init(jax.random.PRNGKey(0), feats, flens)

    def sub_fwd(p, f):
        out, ol = sub.apply(p, f, flens)
        return jnp.sum(out.astype(jnp.float32))

    t = timeit(sub_fwd, params, feats)
    print(f"subsample_fwd: {t * 1e3:.2f} ms", flush=True)
    t = timeit(lambda p, f: jax.grad(sub_fwd)(p, f), params, feats)
    print(f"subsample_grad: {t * 1e3:.2f} ms", flush=True)

    def sub_fwd_bf16(p, f):
        pb = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)
        out, ol = sub.apply(pb, f.astype(jnp.bfloat16), flens)
        return jnp.sum(out.astype(jnp.float32))

    t = timeit(lambda p, f: jax.grad(sub_fwd_bf16)(p, f), params, feats)
    print(f"subsample_grad_bf16: {t * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
