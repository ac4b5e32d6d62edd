"""WKV recurrence tests vs brute-force reference."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.wkv import wkv, wkv_init_state, wkv_step


def np_wkv_ref(w, u, k, v):
    """Direct O(T^2) formula per the CUDA kernel semantics."""
    T, D = k.shape
    out = np.zeros((T, D))
    for t in range(T):
        num = np.zeros(D)
        den = np.zeros(D)
        for i in range(t):
            e = np.exp(k[i] + w * (t - 1 - i))
            num += e * v[i]
            den += e
        e = np.exp(u + k[t])
        num += e * v[t]
        den += e
        out[t] = num / den
    return out


def test_wkv_matches_bruteforce():
    rng = np.random.RandomState(0)
    B, T, D = 2, 10, 4
    w = -np.exp(rng.randn(D) * 0.5)  # negative decay
    u = rng.randn(D).astype(np.float64)
    k = rng.randn(B, T, D)
    v = rng.randn(B, T, D)
    out = np.asarray(wkv(jnp.asarray(w, jnp.float32),
                         jnp.asarray(u, jnp.float32),
                         jnp.asarray(k, jnp.float32),
                         jnp.asarray(v, jnp.float32)))
    for b in range(B):
        ref = np_wkv_ref(w, u, k[b], v[b])
        np.testing.assert_allclose(out[b], ref, rtol=1e-4, atol=1e-5)


def test_wkv_step_matches_scan():
    rng = np.random.RandomState(1)
    B, T, D = 1, 6, 3
    w = jnp.asarray(-np.exp(rng.randn(D)), jnp.float32)
    u = jnp.asarray(rng.randn(D), jnp.float32)
    k = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    full = wkv(w, u, k, v)
    state = wkv_init_state(B, D)
    outs = []
    for t in range(T):
        o, state = wkv_step(w, u, k[:, t], v[:, t], state)
        outs.append(o)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(full), atol=1e-5)


def test_wkv_grad():
    rng = np.random.RandomState(2)
    D = 3
    w = jnp.asarray(-np.exp(rng.randn(D)), jnp.float32)
    u = jnp.asarray(rng.randn(D), jnp.float32)
    k = jnp.asarray(rng.randn(1, 5, D), jnp.float32)
    v = jnp.asarray(rng.randn(1, 5, D), jnp.float32)
    g = jax.grad(lambda kk: jnp.sum(wkv(w, u, kk, v)))(k)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
