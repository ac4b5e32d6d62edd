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


def test_category_power_batches_upsample_rare():
    """catpow (build_batch_sampler.py:87): beta=0 equalizes category
    sampling regardless of duration; beta=1 is duration-proportional."""
    import numpy as np

    from espnet_tpu.data.batching import category_power_batches
    u2c = {f"a{i}": "big" for i in range(90)}
    u2c.update({f"b{i}": "small" for i in range(10)})
    u2l = {k: 100 for k in u2c}
    rng = np.random.RandomState(0)
    flat0 = [k for b in category_power_batches(
        u2c, u2l, 10, beta=0.0, n_batches=200, rng=rng) for k in b]
    frac_small_0 = np.mean([k.startswith("b") for k in flat0])
    rng = np.random.RandomState(0)
    flat1 = [k for b in category_power_batches(
        u2c, u2l, 10, beta=1.0, n_batches=200, rng=rng) for k in b]
    frac_small_1 = np.mean([k.startswith("b") for k in flat1])
    assert abs(frac_small_0 - 0.5) < 0.05     # equalized
    assert abs(frac_small_1 - 0.1) < 0.05     # proportional


def test_category_dataset_power_batches():
    """catpow_balance (build_batch_sampler.py:99): beta_d=0 equalizes
    datasets even when one is 9x larger."""
    import numpy as np

    from espnet_tpu.data.batching import category_dataset_power_batches
    u2c, u2d = {}, {}
    for i in range(90):
        u2c[f"a{i}"] = "c1"
        u2d[f"a{i}"] = "dsA"
    for i in range(10):
        u2c[f"b{i}"] = "c1"
        u2d[f"b{i}"] = "dsB"
    u2l = {k: 50 for k in u2c}
    flat = [k for b in category_dataset_power_batches(
        u2c, u2d, u2l, 10, beta_l=1.0, beta_d=0.0, n_batches=200,
        rng=np.random.RandomState(0)) for k in b]
    frac_b = np.mean([k.startswith("b") for k in flat])
    assert abs(frac_b - 0.5) < 0.05


def test_catpow_through_task_spine(tmp_path):
    """batch_type=catpow trains through the spine with beta upsampling."""
    import numpy as np

    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.tasks.spk import SpeakerTask
    rng = np.random.RandomState(0)
    (tmp_path / "wavs").mkdir()
    lines, cats, lens = [], [], []
    for i in range(6):
        w = (rng.randn(1600) * 0.1).astype(np.float32)
        write_wav(tmp_path / "wavs" / f"u{i}.wav", 16000, w)
        lines.append(f"u{i} {tmp_path}/wavs/u{i}.wav")
        cats.append(f"u{i} {i % 2}")
        lens.append(f"u{i} 1600")
    (tmp_path / "wav.scp").write_text("\n".join(lines) + "\n")
    (tmp_path / "utt2spk").write_text("\n".join(cats) + "\n")
    (tmp_path / "utt2len").write_text("\n".join(lens) + "\n")
    cfg, params = SpeakerTask.main({
        "output_dir": str(tmp_path / "exp"),
        "n_spk": 2, "embed_dim": 8,
        "encoder_conf": {"channels": 8, "num_blocks": 1},
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "batch_type": "catpow", "category_power_beta": 0.5,
        "utt2category_file": str(tmp_path / "utt2spk"),
        "utt2len_file": str(tmp_path / "utt2len"),
        "batch_size": 2, "max_epoch": 1, "log_interval": 1,
        "collate_fixed_lengths": {"speech": 1600},
        "train_data_path_and_name_and_type": [
            f"{tmp_path}/wav.scp,speech,sound",
            f"{tmp_path}/utt2spk,spk_labels,text_int"],
        "valid_data_path_and_name_and_type": [
            f"{tmp_path}/wav.scp,speech,sound",
            f"{tmp_path}/utt2spk,spk_labels,text_int"],
    })
    assert (tmp_path / "exp" / "config.yaml").exists()
