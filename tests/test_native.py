"""Native C++ helper tests: build, parity with python edit distance."""

import numpy as np
import pytest

from espnet_tpu.utils.metrics import edit_distance, error_rate
from espnet_tpu.utils.native import (edit_distance_batch, native_available,
                                     score_corpus)


def test_native_builds():
    assert native_available(), "g++ build of native lib failed"


def test_edit_distance_parity():
    rng = np.random.RandomState(0)
    refs, hyps = [], []
    for _ in range(20):
        refs.append(list(rng.randint(0, 5, rng.randint(1, 12))))
        hyps.append(list(rng.randint(0, 5, rng.randint(1, 12))))
    outs = edit_distance_batch(refs, hyps)
    for (r, h, o) in zip(refs, hyps, outs):
        s, d, i, n = edit_distance(r, h)
        # total edits must agree (alignment may differ in type mix when
        # costs tie, but our C++ uses the same tie-break order)
        assert o[0] + o[1] + o[2] == s + d + i, (r, h, o, (s, d, i))
        assert o[3] == n


def test_score_corpus():
    refs = ["a b c", "d e"]
    hyps = ["a x c", "d e f"]
    out = score_corpus(refs, hyps)
    # 1 sub + 1 ins over 5 ref words
    assert out["err_rate"] == pytest.approx(2 / 5)
    from espnet_tpu.utils.metrics import wer
    assert out["err_rate"] == pytest.approx(wer(refs, hyps))
