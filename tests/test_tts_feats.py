"""Pitch/energy extractor tests."""

import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.feats import (extract_energy, extract_f0,
                                         token_average)


def test_f0_pure_tone():
    fs = 16000
    t = np.arange(fs) / fs
    for hz in (110.0, 220.0, 330.0):
        x = jnp.asarray(0.5 * np.sin(2 * np.pi * hz * t),
                        jnp.float32)[None]
        f0, flens = extract_f0(x, jnp.asarray([fs]), fs=fs)
        v = np.asarray(f0[0, 2:int(flens[0]) - 2])
        voiced = v[v > 0]
        assert len(voiced) > 0
        med = np.median(voiced)
        assert abs(med - hz) / hz < 0.05, (hz, med)


def test_f0_unvoiced_noise():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8000) * 0.1, jnp.float32)
    f0, flens = extract_f0(x, jnp.asarray([8000]), fs=16000)
    v = np.asarray(f0[0, :int(flens[0])])
    assert (v == 0).mean() > 0.5  # mostly unvoiced


def test_energy_and_token_average():
    fs = 8000
    # loud first half, quiet second half
    x = np.concatenate([0.5 * np.ones(4000), 0.01 * np.ones(4000)])
    e, flens = extract_energy(jnp.asarray(x, jnp.float32)[None],
                              jnp.asarray([8000]), n_fft=256, hop_length=128)
    e = np.asarray(e[0])
    T = int(flens[0])
    assert e[:T // 3].mean() > e[2 * T // 3:T].mean() * 5
    # token averaging
    vals = jnp.asarray(np.arange(10, dtype=np.float32))[None]
    durs = jnp.asarray([[4, 6]])
    avg = token_average(vals, durs)
    np.testing.assert_allclose(np.asarray(avg[0]), [1.5, 6.5])
