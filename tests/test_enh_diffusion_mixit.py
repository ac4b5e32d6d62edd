"""MixIT wrapper + SGMSE diffusion enhancement tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mixit_recovers_assignment():
    from espnet_tpu.models.enh.losses import mixit_loss, snr_loss
    rng = np.random.RandomState(0)
    srcs = [jnp.asarray(rng.randn(2, 200).astype(np.float32))
            for _ in range(4)]
    # mixture 0 = s0 + s2, mixture 1 = s1 + s3 -> bitmask 0b1010 = 10
    mix0 = srcs[0] + srcs[2]
    mix1 = srcs[1] + srcs[3]
    loss, best = mixit_loss(snr_loss, srcs, [mix0, mix1])
    assert np.all(np.asarray(best) == 0b1010)
    assert np.all(np.asarray(loss) < -40)  # exact reconstruction

    # swapped mixtures -> complementary assignment
    loss2, best2 = mixit_loss(snr_loss, srcs, [mix1, mix0])
    assert np.all(np.asarray(best2) == 0b0101)


def test_sgmse_sigma_monotone():
    from espnet_tpu.models.enh.diffusion import SGMSEEnhancer
    m = SGMSEEnhancer()
    ts = np.linspace(0.03, 1.0, 10)
    sig = np.asarray([float(m._sigma(jnp.asarray(t))) for t in ts])
    assert np.all(np.diff(sig) > 0)
    assert sig[0] < 0.05 and sig[-1] > 0.1


@pytest.fixture(scope="module")
def tiny_sgmse():
    from espnet_tpu.models.enh.diffusion import SGMSEEnhancer
    m = SGMSEEnhancer(n_fft=64, hop_length=32, channels=(8, 16))
    mix = jnp.asarray(np.random.RandomState(0).randn(2, 512) * 0.1,
                      jnp.float32)
    ref = jnp.asarray(np.random.RandomState(1).randn(2, 512) * 0.1,
                      jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "diffusion": jax.random.PRNGKey(1)}, mix, ref)
    return m, params, mix, ref


def test_sgmse_dsm_loss_and_grads(tiny_sgmse):
    import optax
    m, params, mix, ref = tiny_sgmse

    def loss_fn(p):
        loss, stats, w = m.apply(p, mix, ref,
                                 rngs={"diffusion": jax.random.PRNGKey(2)})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert float(optax.global_norm(grads)) > 0


def test_sgmse_enhance_shape(tiny_sgmse):
    m, params, mix, _ = tiny_sgmse
    out = m.apply(params, mix, n_steps=4, method=m.enhance,
                  rng=jax.random.PRNGKey(3))
    assert out.shape == mix.shape
    assert np.isfinite(np.asarray(out)).all()
