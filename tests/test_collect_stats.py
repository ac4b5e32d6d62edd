"""collect_stats -> GlobalMVN -> training pipeline + pack/from_pretrained."""

import numpy as np

from espnet_tpu.bin.asr_inference import Speech2Text
from espnet_tpu.bin.pack import pack
from espnet_tpu.tasks.asr import ASRTask
from tests.mini_corpus import make_corpus
from tests.test_e2e_asr import small_cfg


def test_collect_stats_and_global_mvn(tmp_path):
    corpus = make_corpus(tmp_path / "mini", n_train=6, n_valid=2)
    stats_dir = tmp_path / "stats"
    cfg = small_cfg(corpus, stats_dir, collect_stats=True, max_epoch=1)
    ASRTask.main(cfg)
    stats = stats_dir / "train" / "feats_stats.npz"
    assert stats.exists()
    d = np.load(stats)
    assert d["count"] > 0 and d["sum"].shape == (20,)
    shape_file = stats_dir / "train" / "speech_shape"
    assert shape_file.exists()
    assert len(shape_file.read_text().splitlines()) == 6

    # train with global_mvn from the collected stats
    outdir = tmp_path / "exp"
    cfg2 = small_cfg(corpus, outdir, max_epoch=2,
                     normalize="global_mvn", stats_file=str(stats))
    ASRTask.main(cfg2)
    # pack + from_pretrained round trip
    packed = pack(tmp_path / "packed", outdir / "config.yaml",
                  outdir / "valid.loss.best")
    s2t = Speech2Text.from_pretrained(str(packed), beam_size=1)
    from espnet_tpu.data.fileio import SoundScpReader
    reader = SoundScpReader(corpus / "valid" / "wav.scp")
    _, audio = reader[list(reader.keys())[0]]
    res = s2t(audio)
    assert isinstance(res[0][0][0], str)


def test_sharded_collect_stats_matches_single(tmp_path):
    """nj-sharded stats (stats_shard=(i, n) per job +
    aggregate_stats_dirs) == one-job stats (collect_stats.py sharding
    contract, asr.sh stage 10)."""
    from espnet_tpu.bin.aggregate_stats_dirs import aggregate_stats_dirs
    corpus = make_corpus(tmp_path / "mini", n_train=6, n_valid=2)
    single = tmp_path / "single"
    ASRTask.main(small_cfg(corpus, single, collect_stats=True, max_epoch=1))
    shard_dirs = []
    for i in range(2):
        d = tmp_path / f"shard{i}"
        cfg = small_cfg(corpus, d, collect_stats=True, max_epoch=1)
        cfg["stats_shard"] = (i, 2)
        ASRTask.main(cfg)
        shard_dirs.append(str(d))
    agg = tmp_path / "agg"
    aggregate_stats_dirs(shard_dirs, agg)
    a = np.load(single / "train" / "feats_stats.npz")
    b = np.load(agg / "train" / "feats_stats.npz")
    assert int(a["count"]) == int(b["count"])
    np.testing.assert_allclose(a["sum"], b["sum"], rtol=1e-6)
    np.testing.assert_allclose(a["sum_square"], b["sum_square"], rtol=1e-6)
    s1 = sorted((single / "train" / "speech_shape").read_text().split())
    s2 = sorted((agg / "train" / "speech_shape").read_text().split())
    assert s1 == s2
