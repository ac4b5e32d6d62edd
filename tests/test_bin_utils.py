"""aggregate_stats_dirs + tokenize_text utilities."""

import numpy as np

from espnet_tpu.bin.aggregate_stats_dirs import aggregate_stats_dirs
from espnet_tpu.bin.tokenize_text import tokenize_text


def test_aggregate_stats(tmp_path):
    for j, n in ((0, 3), (1, 2)):
        d = tmp_path / f"shard{j}" / "train"
        d.mkdir(parents=True)
        (d / "speech_shape").write_text(
            "".join(f"s{j}_{i} 100\n" for i in range(n)))
        np.savez(d / "feats_stats.npz", count=10 * (j + 1),
                 sum=np.full(4, float(j + 1)),
                 sum_square=np.full(4, float(j + 1)))
    out = aggregate_stats_dirs([str(tmp_path / "shard0"),
                                str(tmp_path / "shard1")],
                               tmp_path / "agg")
    lines = (out / "train" / "speech_shape").read_text().splitlines()
    assert len(lines) == 5
    d = np.load(out / "train" / "feats_stats.npz")
    assert int(d["count"]) == 30
    np.testing.assert_allclose(d["sum"], 3.0)


def test_tokenize_text_vocab(tmp_path):
    (tmp_path / "text").write_text("u1 AB BA\nu2 AB\n")
    vocab = tokenize_text(str(tmp_path / "text"),
                          str(tmp_path / "tokens.txt"),
                          token_type="char", write_vocabulary=True)
    assert vocab[0] == "<blank>" and vocab[1] == "<unk>"
    assert vocab[-1] == "<sos/eos>"
    assert "A" in vocab and "B" in vocab and "<space>" in vocab
    # tokenized output mode
    toks = tokenize_text(str(tmp_path / "text"), token_type="char")
    assert toks[0].startswith("u1 A B <space> B A")


def test_lightning_train_strategy_mapping(monkeypatch):
    """lightning_train (espnet2/bin/lightning_train.py role): --strategy
    fsdp/--devices/--precision map onto the mesh + mixed-precision
    config keys of the selected task; unknown tasks error."""
    import pytest as _pytest

    from espnet_tpu.bin import lightning_train as lt
    captured = {}

    class _Stub:
        @staticmethod
        def main(args):
            captured.update(args)

    import espnet_tpu.tasks.registry as reg
    monkeypatch.setattr(reg._LazyTasks, "__getitem__",
                        lambda self, name: _Stub)
    lt.main(["--task", "asr", "--strategy", "fsdp", "--devices", "8",
             "--precision", "bf16-mixed", "--max_epoch", "3"])
    assert captured["use_mesh"] is True
    assert captured["fsdp"] is True
    assert captured["mesh_conf"] == {"n_fsdp": 4, "n_data": 2}
    assert captured["train_dtype"] == "bfloat16"
    assert captured["max_epoch"] == 3
    with _pytest.raises(SystemExit):
        lt.main(["--task", "nope"])
