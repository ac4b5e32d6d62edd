"""WPE dereverberation + TSE tests."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.enh.tse import TSEModel
from espnet_tpu.models.enh.wpe import wpe_dereverb
from espnet_tpu.ops.stft import stft


def test_wpe_reduces_reverb_energy():
    rng = np.random.RandomState(0)
    fs = 8000
    src = rng.randn(4000).astype(np.float32) * 0.3
    # synthetic reverb: strong late echo
    rir = np.zeros(800, np.float32)
    rir[0] = 1.0
    rir[400] = 0.8
    rir[700] = 0.5
    rev = np.convolve(src, rir)[:4000]
    rev2 = rev + 0.01 * rng.randn(4000).astype(np.float32)
    re, im, _ = stft(jnp.asarray(np.stack([rev, rev2])), None, n_fft=256,
                     hop_length=64)
    spec = (re + 1j * im)  # (2, T, F) as two "channels"
    spec2 = spec.transpose(1, 0, 2)[None]  # (1, T, C=2, F)
    out = wpe_dereverb(spec2, taps=8, delay=2, iterations=2)
    assert out.shape == spec2.shape
    assert np.isfinite(np.asarray(out.real)).all()
    # dereverbed energy strictly below reverberant energy (tail removed)
    e_in = float(jnp.sum(jnp.abs(spec2) ** 2))
    e_out = float(jnp.sum(jnp.abs(out) ** 2))
    assert e_out < e_in


def test_tse_model():
    model = TSEModel(n_fft=128, hop_length=64, hidden=16, num_layers=1,
                     emb_dim=8)
    rng = np.random.RandomState(0)
    mix = jnp.asarray(rng.randn(2, 1024) * 0.1, jnp.float32)
    ref = jnp.asarray(rng.randn(2, 1024) * 0.1, jnp.float32)
    enroll = jnp.asarray(rng.randn(2, 800) * 0.1, jnp.float32)
    lens = jnp.asarray([1024, 900])
    params = model.init(jax.random.PRNGKey(0), mix, lens, enroll, ref)
    loss, stats, _ = model.apply(params, mix, lens, enroll, ref)
    assert np.isfinite(float(loss))
    est = model.apply(params, mix, lens, enroll,
                      jnp.asarray([800, 800]), method=model.extract)
    assert est.shape == (2, 1024)
    g = jax.grad(lambda p: model.apply(p, mix, lens, enroll, ref)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
