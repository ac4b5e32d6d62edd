#!/usr/bin/env python3
"""Decompose the flagship train step post-r5 fixes: where do the
15.5 ms of non-forward time go?  Measures on-device (K-scan amortized):

  fwd        : loss forward only
  vg         : value_and_grad (fwd + bwd)
  vg_noremat : value_and_grad with jax.checkpoint disabled (if any)
  adam       : optimizer update alone on frozen grads (incl. global
               norm + non-finite skip select, the make_train_step tail)
  full       : the production step (reference point)
  fe_pad     : frontend reflect-pad+reshape only
  fe_dft     : + k shifted DFT matmuls
  fe_full    : + power + logmel + mask (the production frontend)
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

K = 8
B, S, L = 32, 56000, 48
OUT = {}


def _sync(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
        break


def time_scan(name, fn, args, k=K, reps=3):
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
    ms = float(np.median(ts)) / k * 1000
    OUT[name] = round(ms, 3)
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
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
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M in {n_leaves} tensors", flush=True)
    OUT["n_leaves"] = n_leaves

    rngs = {"dropout": rng, "specaug": jax.random.fold_in(rng, 1)}

    def loss_fn(p):
        loss, stats, w = model.apply(p, **batch, deterministic=False,
                                     rngs=rngs)
        return loss.astype(jnp.float32)

    time_scan("fwd", loss_fn, (params,))
    vg = jax.value_and_grad(loss_fn)
    time_scan("vg", lambda p: vg(p)[0], (params,))

    # grads fixed once; time the optimizer tail alone
    import optax
    tx = build_optimizer("adam", lr=1e-3, grad_clip=5.0)
    opt = tx.init(params)
    _, grads0 = jax.jit(vg)(params)

    def opt_tail(p, o, g):
        gnorm = optax.global_norm(g)
        ok = jnp.isfinite(gnorm)
        g = jax.tree_util.tree_map(
            lambda x: jnp.where(ok, x, jnp.zeros_like(x)), g)
        updates, new_o = tx.update(g, o, p)
        new_p = optax.apply_updates(p, updates)
        new_p = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_p, p)
        new_o = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_o, o)
        return new_p, new_o, gnorm

    time_scan("adam_tail", lambda p, o, g: opt_tail(p, o, g)[2],
              (params, opt, grads0))

    def adam_only(p, o, g):
        updates, new_o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), new_o

    time_scan("adam_noskip", lambda p, o, g: adam_only(p, o, g)[0],
              (params, opt, grads0))

    # frontend decomposition
    from espnet_tpu.frontends.default import DefaultFrontend
    from espnet_tpu.ops.mel import log_mel
    from espnet_tpu.ops.stft import _windowed_dft_matrix, stft_segmented
    fe = DefaultFrontend(**(cfg.get("frontend_conf") or {}))
    n_fft, hop = fe.n_fft, fe.hop_length
    speech = batch["speech"]

    def fe_pad(s):
        pad = n_fft // 2
        x = jnp.pad(s, ((0, 0), (pad, pad)), mode="reflect")
        T = 1 + (x.shape[1] - n_fft) // hop
        n_chunks = T + n_fft // hop - 1
        if x.shape[1] < n_chunks * hop:
            x = jnp.pad(x, ((0, 0), (0, n_chunks * hop - x.shape[1])))
        return x[:, :n_chunks * hop].reshape(B, n_chunks, hop)

    time_scan("fe_pad", lambda s: jnp.sum(fe_pad(s)), (speech,))
    time_scan("fe_dft", lambda s: stft_segmented(s, n_fft=n_fft,
                                                 hop_length=hop)[0],
              (speech,))

    def fe_logmel(s):
        r, i = stft_segmented(s, n_fft=n_fft, hop_length=hop)
        return log_mel(r * r + i * i, fs=fe.fs, n_fft=n_fft,
                       n_mels=fe.n_mels)

    time_scan("fe_logmel", fe_logmel, (speech,))
    time_scan("fe_full", lambda s: fe(s, batch["speech_lengths"])[0],
              (speech,))

    Path("/tmp/diag_step_r5.json").write_text(json.dumps(OUT, indent=1))
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
