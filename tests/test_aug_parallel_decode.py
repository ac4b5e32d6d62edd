"""Preprocessor augmentation + host-parallel decode sharding tests."""

import numpy as np

from espnet_tpu.data.preprocessor import CommonPreprocessor, speed_perturb
from espnet_tpu.parallel.launch import shard_keys, split_scps


def test_speed_perturb():
    x = np.sin(np.linspace(0, 20, 1000)).astype(np.float32)
    y = speed_perturb(x, 1.1)
    assert abs(len(y) - 1000 / 1.1) < 2
    y2 = speed_perturb(x, 0.9)
    assert abs(len(y2) - 1000 / 0.9) < 2


def test_preprocessor_noise_and_speed(tmp_path):
    from espnet_tpu.data.fileio import write_wav
    rng = np.random.RandomState(0)
    noise = rng.randn(2000).astype(np.float32) * 0.5
    write_wav(tmp_path / "n.wav", 8000, noise)
    (tmp_path / "noise.scp").write_text(f"n {tmp_path/'n.wav'}\n")
    pre = CommonPreprocessor(
        train=True, noise_scp=str(tmp_path / "noise.scp"),
        noise_db_range="5_10", noise_apply_prob=1.0,
        speed_perturb_factors=[0.9, 1.0, 1.1])
    speech = rng.randn(4000).astype(np.float32) * 0.1
    out = pre("u0", {"speech": speech})
    assert out["speech"].dtype == np.float32
    # noise added: output differs from any pure speed-perturbed version
    assert not np.allclose(out["speech"][:100], speech[:100])
    # eval mode: no augmentation
    pre_eval = CommonPreprocessor(
        train=False, noise_scp=str(tmp_path / "noise.scp"))
    out2 = pre_eval("u0", {"speech": speech})
    np.testing.assert_allclose(out2["speech"], speech)


def test_shard_keys_partition():
    keys = [f"u{i}" for i in range(10)]
    shards = [shard_keys(keys, j, 3) for j in range(3)]
    assert sum(len(s) for s in shards) == 10
    assert sorted(sum(shards, [])) == sorted(keys)
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_split_scps(tmp_path):
    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"u{i} /x/u{i}.wav\n" for i in range(7)))
    paths = split_scps(str(scp), 3, str(tmp_path / "split"))
    assert len(paths) == 3
    total = sum(len(open(p).readlines()) for p in paths)
    assert total == 7
