"""CTC prefix scorer — vectorized lattice DP on device.

Behavioral contract: espnet2/legacy/nets/ctc_prefix_score.py
(CTCPrefixScoreTH :12-192) — batched Algorithm 2 of Watanabe et al.
(hybrid CTC/attention), vectorized per Seki et al. 2019. Given CTC
log-posteriors and a hypothesis prefix g, computes for candidate tokens
c the prefix score log p(g·c...|x) used as the partial scorer in hybrid
beam search.

TPU-first: the DP over T is a `lax.scan` carrying (r_nb, r_b) for all W
pre-beam candidates of all (batch*beam) rows simultaneously; the state
is a fixed-shape pytree, so the scorer lives inside the beam-search
while_loop with gather-based reindexing.

Padding convention (same trick as the reference :50-54): frames beyond
the encoder length have blank logp = 0 and all other tokens = logzero,
so the blank-path DP runs past the end at zero cost and no per-frame
masks are needed inside the scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask

NEG_INF = -1e10


class CTCPrefixState(NamedTuple):
    """Per-row scorer state (rows = batch*beam hypothesis slots)."""

    r_nb: jnp.ndarray    # (rows, T) log p(prefix ends non-blank at t)
    r_b: jnp.ndarray     # (rows, T) log p(prefix ends blank at t)
    score: jnp.ndarray   # (rows,) prefix score log p(g...)
    last: jnp.ndarray    # (rows,) last token of prefix
    length: jnp.ndarray  # (rows,) prefix length (0 = empty)


def pad_log_posteriors(logp: jnp.ndarray, lengths: jnp.ndarray,
                       blank_id: int = 0) -> jnp.ndarray:
    """Apply the reference padding convention beyond each length."""
    rows, T, V = logp.shape
    valid = make_non_pad_mask(lengths, T)[:, :, None]
    pad = jnp.full((V,), NEG_INF).at[blank_id].set(0.0)
    return jnp.where(valid, logp, pad[None, None, :])


def init_state(x: jnp.ndarray, blank_id: int = 0) -> CTCPrefixState:
    """x: (rows, T, V) padded log-posteriors. Initial prefix = empty."""
    rows, T, V = x.shape
    r_b = jnp.cumsum(x[:, :, blank_id], axis=1)
    r_nb = jnp.full((rows, T), NEG_INF)
    return CTCPrefixState(
        r_nb=r_nb, r_b=r_b,
        score=jnp.zeros((rows,)),
        last=jnp.full((rows,), -1, jnp.int32),
        length=jnp.zeros((rows,), jnp.int32))


def score_candidates(state: CTCPrefixState, cand_ids: jnp.ndarray,
                     x: jnp.ndarray, enc_lens: jnp.ndarray,
                     blank_id: int = 0, eos_id: int | None = None):
    """Score W candidate extensions per row.

    cand_ids: (rows, W) candidate tokens; x: (rows, T, V) padded
    log-posteriors; enc_lens: (rows,).

    Returns (local_scores (rows, W) = log_psi - prev_score,
             log_psi (rows, W), r_nb_new, r_b_new (rows, W, T)).
    eos candidates get the full-sequence probability of g itself;
    blank candidates get logzero (ctc_prefix_score.py:177-186).
    """
    rows, W = cand_ids.shape
    T = x.shape[1]
    V = x.shape[2]
    if V <= 1024:
        # data-dependent gather lowers to a pathological scalar-memory
        # kCustom gather on TPU (~16 ms/beam-step, the single hottest op
        # of the search loop); a one-hot contraction is exact for finite
        # logps and rides the MXU instead
        onehot = jax.nn.one_hot(cand_ids, V, dtype=x.dtype)  # (rows, W, V)
        xc = jnp.einsum("rtv,rwv->rtw", x, onehot)
    else:
        xc = jnp.take_along_axis(
            x, jnp.broadcast_to(cand_ids[:, None, :], (rows, T, W)), axis=2)
    xb = x[:, :, blank_id]  # (rows, T)
    same = cand_ids == state.last[:, None]  # (rows, W)
    # phi[t]: prob prefix g complete at t, usable before emitting c
    phi = jnp.where(same[:, None, :], state.r_b[:, :, None],
                    jnp.logaddexp(state.r_b, state.r_nb)[:, :, None])
    empty = (state.length == 0)[:, None]  # (rows, 1)

    r_nb0 = jnp.where(empty, xc[:, 0, :], NEG_INF)
    r_b0 = jnp.full((rows, W), NEG_INF)
    psi0 = r_nb0

    def step(carry, t):
        r_nb_p, r_b_p, psi = carry
        r_nb_t = jnp.logaddexp(r_nb_p, phi[:, t - 1, :]) + xc[:, t, :]
        r_b_t = jnp.logaddexp(r_nb_p, r_b_p) + xb[:, t, None]
        psi = jnp.logaddexp(psi, phi[:, t - 1, :] + xc[:, t, :])
        return (r_nb_t, r_b_t, psi), (r_nb_t, r_b_t)

    (_, _, log_psi), (r_nb_seq, r_b_seq) = jax.lax.scan(
        step, (r_nb0, r_b0, psi0), jnp.arange(1, T))
    r_nb_new = jnp.concatenate([r_nb0[None], r_nb_seq]).transpose(1, 2, 0)
    r_b_new = jnp.concatenate([r_b0[None], r_b_seq]).transpose(1, 2, 0)

    # eos candidate: full-sequence prob of prefix g
    end = jnp.maximum(enc_lens - 1, 0)
    r_sum_end = jnp.logaddexp(
        state.r_nb[jnp.arange(rows), end], state.r_b[jnp.arange(rows), end])
    if eos_id is not None:
        is_eos = cand_ids == eos_id
        log_psi = jnp.where(is_eos, r_sum_end[:, None], log_psi)
    log_psi = jnp.where(cand_ids == blank_id, NEG_INF, log_psi)
    local = log_psi - state.score[:, None]
    return local, log_psi, r_nb_new, r_b_new


def select_state(state: CTCPrefixState, r_nb_new, r_b_new, log_psi,
                 src_row: jnp.ndarray, cand_idx: jnp.ndarray,
                 new_token: jnp.ndarray) -> CTCPrefixState:
    """Gather chosen (row, candidate) DP states into the next beam.

    src_row/cand_idx/new_token: (rows,) for the new beam slots.
    (index_select_state contract, ctc_prefix_score.py:195.)
    """
    return CTCPrefixState(
        r_nb=r_nb_new[src_row, cand_idx],
        r_b=r_b_new[src_row, cand_idx],
        score=log_psi[src_row, cand_idx],
        last=new_token,
        length=state.length[src_row] + 1)
