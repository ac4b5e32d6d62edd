"""Stochastic duration predictor (VITS flow SDP) unit tests.

Reference contract: espnet2/gan_tts/vits/duration_predictor.py:25 and
gan_tts/vits/transform.py (rational-quadratic spline).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.tts.stochastic_duration import (
    ConvFlow, StochasticDurationPredictor, rational_quadratic_spline)


def test_spline_invertible():
    rng = np.random.RandomState(0)
    K = 10
    x = jnp.asarray(rng.randn(64).astype(np.float32) * 2.0)
    uw = jnp.asarray(rng.randn(64, K).astype(np.float32))
    uh = jnp.asarray(rng.randn(64, K).astype(np.float32))
    ud = jnp.asarray(rng.randn(64, K - 1).astype(np.float32))
    y, ld = rational_quadratic_spline(x, uw, uh, ud, inverse=False)
    x2, ld2 = rational_quadratic_spline(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    # logdets of forward and inverse must cancel
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-4)


def test_spline_identity_tails():
    K = 8
    x = jnp.asarray([-20.0, 20.0, 7.5])
    uw = jnp.zeros((3, K))
    uh = jnp.zeros((3, K))
    ud = jnp.zeros((3, K - 1))
    y, ld = rational_quadratic_spline(x, uw, uh, ud, tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)


def test_convflow_invertible():
    B, T = 2, 12
    flow = ConvFlow(32)
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([[12], [8]]))[:, :, 0] \
        if False else jnp.asarray(np.arange(T)[None, :] < np.array([12, 8])[:, None])
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, 2).astype(np.float32))
    x = jnp.where(mask[..., None], x, 0.0)
    g = jnp.asarray(np.random.RandomState(1).randn(B, T, 32).astype(np.float32))
    params = flow.init(jax.random.PRNGKey(0), x, mask, g=g)
    y, ld = flow.apply(params, x, mask, g=g)
    x2 = flow.apply(params, y, mask, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    assert ld.shape == (B,)


@pytest.fixture(scope="module")
def sdp_setup():
    B, T = 2, 10
    sdp = StochasticDurationPredictor(filter_channels=48)
    h = jnp.asarray(np.random.RandomState(0).randn(B, T, 48)
                    .astype(np.float32))
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([10, 7])[:, None])
    w = jnp.asarray(np.random.RandomState(1).randint(1, 9, (B, T))
                    .astype(np.float32))
    params = sdp.init(jax.random.PRNGKey(0), h, mask, w,
                      jax.random.PRNGKey(1), deterministic=True)
    return sdp, params, h, mask, w


def test_sdp_train_nll(sdp_setup):
    sdp, params, h, mask, w = sdp_setup
    nll = sdp.apply(params, h, mask, w, jax.random.PRNGKey(2),
                    deterministic=True)
    assert nll.shape == (2,)
    assert np.all(np.isfinite(np.asarray(nll)))

    def loss(p):
        return jnp.sum(sdp.apply(p, h, mask, w, jax.random.PRNGKey(2),
                                 deterministic=True))

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # some grads must be nonzero (the flows train)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_sdp_inference(sdp_setup):
    sdp, params, h, mask, w = sdp_setup
    logw = sdp.apply(params, h, mask, None, jax.random.PRNGKey(3),
                     reverse=True, noise_scale=0.8, deterministic=True)
    assert logw.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(logw)))
    # masked positions are exactly zero
    assert np.all(np.asarray(logw)[1, 7:] == 0.0)


def test_vits_with_sdp():
    from espnet_tpu.models.tts.vits import VITS
    B, S, T = 2, 6, 24
    model = VITS(vocab_size=11, z_channels=8, hidden=16, spec_channels=9,
                 segment_frames=4, hop_length=4,
                 text_encoder_conf={"num_blocks": 1, "attention_heads": 2,
                                    "linear_units": 16},
                 generator_conf={"channels": 8, "upsample_scales": (2, 2),
                                 "upsample_kernel_sizes": (4, 4),
                                 "resblock_kernel_sizes": (3,),
                                 "resblock_dilations": ((1, 3),)},
                 use_sdp=True, sdp_conf={"filter_channels": 16, "bins": 4})
    text = jnp.asarray(np.random.RandomState(0).randint(1, 11, (B, S)))
    tl = jnp.asarray([6, 4])
    spec = jnp.abs(jnp.asarray(
        np.random.RandomState(1).randn(B, T, 9).astype(np.float32)))
    sl = jnp.asarray([24, 16])
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng},
                        text, tl, spec, sl, rng, deterministic=True)
    out = model.apply(params, text, tl, spec, sl, rng, deterministic=True)
    assert np.isfinite(float(out["dur_loss"]))
    assert np.isfinite(float(out["kl_loss"]))

    wav, olens = model.apply(params, text, tl, jax.random.PRNGKey(5),
                             method=model.inference, max_frames=32)
    assert wav.shape[0] == B
    assert np.all(np.isfinite(np.asarray(wav)))
