"""Waveform effect bank (espnet2/layers/augmentation.py contract)."""

import numpy as np
import pytest

from espnet_tpu.data.augmentation import EFFECTS, DataAugmentation


@pytest.mark.parametrize("name", sorted(EFFECTS))
def test_every_effect_preserves_shape_and_finiteness(name):
    rng = np.random.RandomState(0)
    w = (rng.randn(3200) * 0.2).astype(np.float32)
    out = EFFECTS[name](w, 16000)
    assert out.dtype == np.float32
    assert np.all(np.isfinite(out))
    if name not in ("time_stretch",):  # stretch changes length by design
        assert abs(len(out) - len(w)) <= 1, name


def test_effect_semantics():
    rng = np.random.RandomState(0)
    w = (rng.randn(3200) * 0.2).astype(np.float32)
    np.testing.assert_allclose(EFFECTS["polarity_inverse"](w, 16000), -w)
    np.testing.assert_allclose(EFFECTS["reverse"](w, 16000), w[::-1])
    clipped = EFFECTS["clipping"](w, 16000)
    assert clipped.max() <= np.quantile(w, 0.9) + 1e-6
    # lowpass removes a high-frequency tone more than a low one
    t = np.arange(3200) / 16000
    hi = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    lo = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    assert (np.abs(EFFECTS["lowpass"](hi, 16000, cutoff=1000)).mean()
            < 0.1 * np.abs(EFFECTS["lowpass"](lo, 16000, cutoff=1000)
                           ).mean())


def test_data_augmentation_bank_and_preprocessor():
    from espnet_tpu.data.preprocessor import CommonPreprocessor
    aug = DataAugmentation([(2.0, "clipping", {}),
                            (1.0, "polarity_inverse", {})],
                           apply_n=(1, 2), seed=0)
    w = np.random.RandomState(0).randn(2000).astype(np.float32)
    out = aug(w)
    assert out.shape == w.shape and np.all(np.isfinite(out))
    pre = CommonPreprocessor(
        train=True,
        data_aug_effects=[(1.0, "preemphasis", {})], data_aug_prob=1.0)
    d = pre("u1", {"speech": w})
    assert not np.allclose(d["speech"], w)  # effect applied
    pre2 = CommonPreprocessor(train=False,
                              data_aug_effects=[(1.0, "preemphasis", {})],
                              data_aug_prob=1.0)
    d2 = pre2("u1", {"speech": w})
    np.testing.assert_allclose(d2["speech"], w)  # eval: untouched
