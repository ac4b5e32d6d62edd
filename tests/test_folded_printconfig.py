"""Folded batch sampler semantics + --print_config contract."""

import io

from espnet_tpu.data.batching import build_batch_sampler
from espnet_tpu.tasks.asr import ASRTask


def test_folded_batches_shrink_for_long_utts():
    shapes = {f"s{i}": 100 for i in range(8)}
    shapes.update({f"l{i}": 1000 for i in range(8)})
    batches = build_batch_sampler(
        "folded", batch_size=8, utt2shapes=[shapes],
        keys=list(shapes), fold_length=250, min_batch_size=1)
    total = sum(len(b) for b in batches)
    assert total == 16
    for b in batches:
        maxlen = max(shapes[k] for k in b)
        if maxlen >= 1000:
            assert len(b) <= 2  # 8 // ceil(1000/250) = 2
        else:
            assert len(b) <= 8


def test_print_config(capsys):
    out = ASRTask.main(argv=["--print_config"])
    captured = capsys.readouterr().out
    assert "encoder:" in captured and "optim_conf:" in captured
    assert isinstance(out, dict) and out["encoder"] == "transformer"
