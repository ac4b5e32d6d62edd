"""RNN-T loss tests vs an independent numpy DP and torchaudio (if
available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.ops.rnnt import rnnt_loss


def np_rnnt_ref(logp, labels, T, U):
    """Plain O(T*U) double-loop alpha DP in numpy (log domain)."""
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + logp[t - 1, u, 0])
            if u > 0:
                cands.append(alpha[t, u - 1] + logp[t, u - 1, labels[u - 1]])
            if cands and not (t == 0 and u == 0):
                alpha[t, u] = np.logaddexp.reduce(cands)
    return -(alpha[T - 1, U] + logp[T - 1, U, 0])


def test_rnnt_matches_numpy_dp():
    rng = np.random.RandomState(0)
    B, T, U, V = 3, 6, 3, 5
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    labels = rng.randint(1, V, (B, U)).astype(np.int32)
    tl = np.asarray([6, 5, 4], np.int32)
    ul = np.asarray([3, 2, 1], np.int32)
    out = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                    jnp.asarray(tl), jnp.asarray(ul), reduction="none")
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    for b in range(B):
        ref = np_rnnt_ref(logp[b], labels[b], tl[b], ul[b])
        np.testing.assert_allclose(float(out[b]), ref, rtol=1e-4)


def test_rnnt_matches_torchaudio():
    torch = pytest.importorskip("torch")
    try:
        from torchaudio.functional import rnnt_loss as ta_rnnt
    except Exception:
        pytest.skip("torchaudio rnnt_loss unavailable")
    rng = np.random.RandomState(1)
    B, T, U, V = 2, 8, 4, 6
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    labels = rng.randint(1, V, (B, U)).astype(np.int32)
    tl = np.asarray([8, 6], np.int32)
    ul = np.asarray([4, 3], np.int32)
    ours = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                     jnp.asarray(tl), jnp.asarray(ul), reduction="none")
    ref = ta_rnnt(torch.tensor(logits), torch.tensor(labels).int(),
                  torch.tensor(tl).int(), torch.tensor(ul).int(),
                  blank=0, reduction="none")
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4)


def test_rnnt_grad_finite():
    rng = np.random.RandomState(2)
    B, T, U, V = 2, 5, 2, 4
    logits = jnp.asarray(rng.randn(B, T, U + 1, V), jnp.float32)
    labels = jnp.asarray(rng.randint(1, V, (B, U)), jnp.int32)
    tl = jnp.asarray([5, 4]); ul = jnp.asarray([2, 2])
    g = jax.grad(lambda x: rnnt_loss(x, labels, tl, ul))(logits)
    assert np.isfinite(np.asarray(g)).all()
    # gradient wrt valid region must be nonzero
    assert float(jnp.abs(g[0, :5, :3]).max()) > 0


def test_multi_blank_rnnt_matches_bruteforce():
    """Multi-blank loss == exhaustive numpy DP on a tiny lattice
    (reference: rnnt_multi_blank numba kernels)."""
    import numpy as np
    from espnet_tpu.ops.rnnt import rnnt_loss_multi_blank

    rng = np.random.RandomState(3)
    B, T, U, V = 2, 6, 3, 8
    durs = (2, 3)
    n_big = len(durs)
    sigma = 0.05
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    labels = rng.randint(1, V - n_big, (B, U)).astype(np.int32)
    tl = np.asarray([6, 5], np.int32)
    ul = np.asarray([3, 2], np.int32)

    def brute(b):
        logp = logits[b] - np.log(
            np.exp(logits[b]).sum(-1, keepdims=True)) - sigma
        Tb, Ub = tl[b], ul[b]
        NEG = -1e30
        alpha = np.full((Tb, Ub + 1), NEG)
        alpha[0, 0] = 0.0
        for t in range(Tb):
            for u in range(Ub + 1):
                if t == 0 and u == 0:
                    continue
                cands = []
                if t >= 1:
                    cands.append(alpha[t - 1, u] + logp[t - 1, u, 0])
                if u >= 1:
                    cands.append(alpha[t, u - 1]
                                 + logp[t, u - 1, labels[b, u - 1]])
                for k, dk in enumerate(durs):
                    if t >= dk:
                        cands.append(alpha[t - dk, u]
                                     + logp[t - dk, u, V - n_big + k])
                alpha[t, u] = np.logaddexp.reduce(cands) if cands else NEG
        # exits: standard blank from (Tb-1, Ub); big blank k from (Tb-dk, Ub)
        exits = [alpha[Tb - 1, Ub] + logp[Tb - 1, Ub, 0]]
        for k, dk in enumerate(durs):
            if Tb - dk >= 0:
                exits.append(alpha[Tb - dk, Ub]
                             + logp[Tb - dk, Ub, V - n_big + k])
        return -np.logaddexp.reduce(exits)

    got = rnnt_loss_multi_blank(logits, labels, tl, ul,
                                big_blank_durations=durs, sigma=sigma,
                                reduction="none")
    want = np.asarray([brute(0), brute(1)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
