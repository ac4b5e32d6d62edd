"""N-best LM rescoring.

Behavioral contract: espnet2/fst/lm_rescore.py (nbest_rescore_with_LM)
— re-rank beam-search n-best hypotheses with a neural LM:
total = am_score + lm_weight * lm_logp + length_bonus * len. The
reference builds k2 lattices and intersects on CUDA; here the n-best is
already explicit (the on-device beam search returns it), so rescoring is
ONE batched LM forward over the padded hypothesis matrix — no lattice
object needed on TPU.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def lm_sequence_logp(lm, lm_params, seqs: Sequence[Sequence[int]],
                     sos_eos_id: int) -> np.ndarray:
    """Total log-prob of each token sequence under the LM (one batched
    teacher-forced forward; <sos> prefix, <eos> scored)."""
    n = len(seqs)
    L = max((len(s) for s in seqs), default=0) + 1
    inp = np.full((n, L), sos_eos_id, np.int32)
    tgt = np.full((n, L), 0, np.int32)
    lens = np.zeros((n,), np.int32)
    for i, s in enumerate(seqs):
        inp[i, 1:1 + len(s)] = s
        tgt[i, :len(s)] = s
        tgt[i, len(s)] = sos_eos_id       # score <eos>
        lens[i] = len(s) + 1
    logits = lm.apply(lm_params, jnp.asarray(inp),
                      jnp.asarray(lens))
    if isinstance(logits, tuple):
        logits = logits[0]
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, jnp.asarray(tgt)[..., None],
                                 axis=-1)[..., 0]
    mask = jnp.arange(L)[None, :] < jnp.asarray(lens)[:, None]
    return np.asarray(jnp.sum(jnp.where(mask, tok_lp, 0.0), axis=-1))


def rescore_nbest(nbest: List[Tuple[Sequence[int], float]], lm, lm_params,
                  sos_eos_id: int, lm_weight: float = 0.3,
                  length_bonus: float = 0.0
                  ) -> List[Tuple[Sequence[int], float]]:
    """Re-rank one utterance's [(ids, am_score), ...] with the LM."""
    if not nbest:
        return nbest
    seqs = [list(ids) for ids, _ in nbest]
    lm_lp = lm_sequence_logp(lm, lm_params, seqs, sos_eos_id)
    rescored = [
        (ids, float(am + lm_weight * lp + length_bonus * len(ids)))
        for (ids, am), lp in zip(nbest, lm_lp)]
    return sorted(rescored, key=lambda h: -h[1])
