"""CTC forced alignment tests on a constructed posterior sequence."""

import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode.ctc_segmentation import (ctc_forced_align,
                                                token_boundaries)


def test_forced_align_recovers_planted_alignment():
    """Posteriors strongly favoring a known segmentation must recover it."""
    V, T = 5, 12
    # plan: blank(0-1) tok1(2-4) blank(5) tok2(6-8) blank(9-11)
    plan = [0, 0, 1, 1, 1, 0, 2, 2, 2, 0, 0, 0]
    tokens = np.asarray([1, 2], np.int32)
    logits = np.full((T, V), -5.0, np.float32)
    for t, lab in enumerate(plan):
        logits[t, lab] = 5.0
    logp = np.asarray(jnp.log(jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))))
    states = ctc_forced_align(logp, tokens)
    bounds = token_boundaries(states, 2)
    s1, e1 = bounds[0]
    s2, e2 = bounds[1]
    assert s1 == 2 and e1 == 5
    assert s2 == 6 and e2 == 9


def test_forced_align_repeated_tokens():
    """Repeated labels need the blank between them (no skip)."""
    V, T = 4, 10
    plan = [1, 1, 0, 1, 1, 0, 0, 0, 0, 0]
    tokens = np.asarray([1, 1], np.int32)
    logits = np.full((T, V), -5.0, np.float32)
    for t, lab in enumerate(plan):
        logits[t, lab] = 5.0
    logp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    states = ctc_forced_align(logp, tokens)
    bounds = token_boundaries(states, 2)
    assert bounds[0][1] <= bounds[1][0]  # non-overlapping, ordered
    assert bounds[0][0] == 0
    assert bounds[1][0] >= 3
