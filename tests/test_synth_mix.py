"""SynthMixCorpus: deterministic 2-speaker mixtures (wsj0-2mix
stand-in; reference bar egs2/wsj0_2mix/enh1)."""

import numpy as np

from espnet_tpu.data.synth_speech import SynthMixCorpus


def test_mixture_is_sum_and_deterministic():
    c = SynthMixCorpus(seconds=1.0)
    mix, r1, r2 = c.mixture("train", 3)
    assert mix.shape == r1.shape == r2.shape == (16000,)
    np.testing.assert_allclose(mix, r1 + r2, atol=1e-6)
    mix2, r1b, _ = c.mixture("train", 3)
    np.testing.assert_array_equal(mix, mix2)
    np.testing.assert_array_equal(r1, r1b)
    # different indices give different mixtures
    mix3, _, _ = c.mixture("train", 4)
    assert not np.array_equal(mix, mix3)


def test_sir_within_mixing_band():
    c = SynthMixCorpus(seconds=1.0)
    for i in range(4):
        _, r1, r2 = c.mixture("valid", i)
        sir = 10 * np.log10((np.mean(r1 ** 2) + 1e-10)
                            / (np.mean(r2 ** 2) + 1e-10))
        # sampled in [-2.5, 2.5] dB (plus the zero-pad duty factor of
        # short sources, which only lowers the measured power)
        assert -8.0 < sir < 8.0


def test_materialize_writes_scp_refs_and_shapes(tmp_path):
    c = SynthMixCorpus(seconds=0.5)
    c.materialize(tmp_path, n_train=2, n_valid=1, n_test=0)
    for split, n in (("train", 2), ("valid", 1)):
        d = tmp_path / split
        for f in ("wav.scp", "spk1.scp", "spk2.scp", "speech_mix_shape"):
            lines = [ln for ln in (d / f).read_text().splitlines() if ln]
            assert len(lines) == n, f
        # shape file matches the fixed window
        uid, length = (d / "speech_mix_shape").read_text().split()[:2]
        assert int(length) == c.n_samples
    # disk roundtrip preserves the mixture (int16 quantization only)
    from espnet_tpu.data.fileio import SoundScpReader
    mix, r1, r2 = c.mixture("train", 0)
    _, disk = SoundScpReader(tmp_path / "train" / "wav.scp")["train_00000"]
    np.testing.assert_allclose(disk, mix, atol=2.0 / 32768)
