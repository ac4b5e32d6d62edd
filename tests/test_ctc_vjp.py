"""CTC forward-backward custom VJP: value + gradient parity with
optax.ctc_loss (the XLA autodiff reference), including padded frames,
padded labels, repeated labels (skip-arc constraint), and impossible
alignments (zero-infinity contract of espnet2/asr/ctc.py:9-71)."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from espnet_tpu.ops.losses import ctc_loss, ctc_nll
from espnet_tpu.utils.masks import make_non_pad_mask

pytestmark = pytest.mark.smoke


def _optax_mean(logits, hlens, ys, ylens):
    T = logits.shape[1]
    U = ys.shape[1]
    lp = (~make_non_pad_mask(hlens, T)).astype(jnp.float32)
    yp = (~make_non_pad_mask(ylens, U)).astype(jnp.float32)
    per = optax.ctc_loss(logits, lp, ys, yp, blank_id=0)
    # optax saturates impossible alignments near its log-eps (~1e5),
    # not inf; zero them like espnet's zero_infinity does
    per = jnp.where(per < 1e4, per, 0.0)
    return jnp.mean(per)


def _rand_case(rng, B=5, T=24, U=7, V=11, hard=False):
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32) * 2
    ys = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    if hard:  # force repeats so the skip-arc constraint matters
        ys = ys.at[:, 1].set(ys[:, 0]).at[:, 3].set(ys[:, 2])
    hlens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    ylens = jnp.asarray(rng.integers(1, U + 1, size=(B,)), jnp.int32)
    return logits, hlens, ys, ylens


@pytest.mark.parametrize("hard", [False, True])
def test_ctc_value_and_grad_parity(hard):
    rng = np.random.default_rng(0 if not hard else 1)
    logits, hlens, ys, ylens = _rand_case(rng, hard=hard)

    v_new = ctc_loss(logits, hlens, ys, ylens)
    v_ref = _optax_mean(logits, hlens, ys, ylens)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref),
                               rtol=2e-4, atol=2e-4)

    g_new = jax.grad(lambda x: ctc_loss(x, hlens, ys, ylens))(logits)
    g_ref = jax.grad(lambda x: _optax_mean(x, hlens, ys, ylens))(logits)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_ctc_impossible_alignment_zeroed():
    # U tokens need >= U frames (plus separators for repeats); hlens=2
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
    ys = jnp.asarray([[1, 2, 3, 4, 5], [1, 2, 0, 0, 0]], jnp.int32)
    hlens = jnp.asarray([2, 6], jnp.int32)   # row 0 impossible
    ylens = jnp.asarray([5, 2], jnp.int32)
    per = ctc_nll(logits, hlens, ys, ylens, 0)
    assert float(per[0]) > 1e20 or not np.isfinite(float(per[0]))
    loss = ctc_loss(logits, hlens, ys, ylens)
    ref = _optax_mean(logits, hlens, ys, ylens)
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-4,
                               atol=2e-4)
    g = jax.grad(lambda x: ctc_loss(x, hlens, ys, ylens))(logits)
    assert np.isfinite(np.asarray(g)).all()
    # impossible row contributes zero gradient
    assert float(jnp.abs(g[0]).max()) == 0.0


def test_ctc_single_token_and_full_pad_frames():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((1, 9, 6)), jnp.float32)
    ys = jnp.asarray([[4]], jnp.int32)
    hlens = jnp.asarray([5], jnp.int32)
    ylens = jnp.asarray([1], jnp.int32)
    v = ctc_loss(logits, hlens, ys, ylens)
    r = _optax_mean(logits, hlens, ys, ylens)
    np.testing.assert_allclose(float(v), float(r), rtol=2e-4, atol=2e-4)
    g_new = jax.grad(lambda x: ctc_loss(x, hlens, ys, ylens))(logits)
    g_ref = jax.grad(lambda x: _optax_mean(x, hlens, ys, ylens))(logits)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)
    # frames past hlen get exactly zero gradient
    assert float(jnp.abs(g_new[:, 5:]).max()) == 0.0
