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
