"""Transducer decoding — batched greedy + beam search on device.

Behavioral contract: espnet2/asr/transducer/beam_search_transducer.py:43
(greedy :239, default beam :273; TSD/ALSD/NSC/mAES variants are
algorithmic refinements of the same lattice walk). TPU-first: greedy is
a single `lax.while_loop` over (frame, emit) events for the whole batch;
beam search keeps a fixed beam block like decode/beam_search.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e10


@dataclasses.dataclass(frozen=True)
class TransducerSearchConfig:
    beam_size: int = 5
    search_type: str = "default"  # greedy | default
    max_sym_exp: int = 3          # max symbols per frame (greedy)
    score_norm: bool = True
    nbest: int = 1


def greedy_search(model, params, enc, enc_lens, max_sym_exp: int = 3):
    """Batched greedy decode. enc: (B, T, D) -> list of token lists.

    Walks the lattice with per-utterance (t, u) pointers inside one
    while_loop: emit (token != blank, u+1, decoder step) or advance
    (blank, t+1). max_sym_exp bounds symbols per frame
    (beam_search_transducer.py:239 greedy semantics).
    """
    B, T, D = enc.shape
    Umax = T * max_sym_exp

    carry0 = model.apply(params, B, method=model.decoder_init_carry)
    dec_out0, carry0 = model.apply(params, carry0,
                                   jnp.zeros((B,), jnp.int32),
                                   method=model.decoder_step)

    class S(NamedTuple):
        t: jnp.ndarray
        n_sym_frame: jnp.ndarray
        tokens: jnp.ndarray
        n_tok: jnp.ndarray
        dec_out: jnp.ndarray
        carry: tuple

    st = S(t=jnp.zeros((B,), jnp.int32),
           n_sym_frame=jnp.zeros((B,), jnp.int32),
           tokens=jnp.zeros((B, Umax), jnp.int32),
           n_tok=jnp.zeros((B,), jnp.int32),
           dec_out=dec_out0, carry=carry0)

    def cond(s):
        return jnp.any(s.t < enc_lens)

    def body(s):
        t_c = jnp.clip(s.t, 0, T - 1)
        enc_frame = enc[jnp.arange(B), t_c]  # (B, D)
        logits = model.apply(params, enc_frame, s.dec_out,
                             method=model.joint_step)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        active = s.t < enc_lens
        emit = (tok != model.blank_id) & active & \
            (s.n_sym_frame < max_sym_exp)
        # decoder step for emitting rows (compute for all, select)
        new_dec_out, new_carry = model.apply(params, s.carry, tok,
                                             method=model.decoder_step)
        dec_out = jnp.where(emit[:, None], new_dec_out, s.dec_out)
        carry = jax.tree_util.tree_map(
            lambda n, o: jnp.where(
                emit.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
            new_carry, s.carry)
        tokens = jax.vmap(
            lambda row, p, v, e: row.at[p].set(jnp.where(e, v, row[p])))(
            s.tokens, jnp.clip(s.n_tok, 0, Umax - 1), tok, emit)
        n_tok = s.n_tok + emit.astype(jnp.int32)
        advance = ~emit & active
        return S(t=s.t + advance.astype(jnp.int32),
                 n_sym_frame=jnp.where(emit, s.n_sym_frame + 1, 0),
                 tokens=tokens, n_tok=n_tok, dec_out=dec_out, carry=carry)

    final = jax.lax.while_loop(cond, body, st)
    return final.tokens, final.n_tok


class BeamState(NamedTuple):
    t: jnp.ndarray         # (rows,) frame pointer per hyp
    tokens: jnp.ndarray    # (rows, Umax)
    n_tok: jnp.ndarray     # (rows,)
    scores: jnp.ndarray    # (rows,)
    dec_out: jnp.ndarray   # (rows, Dd)
    carry: tuple
    done: jnp.ndarray      # (rows,) reached end of frames


def beam_search(model, params, enc, enc_lens, beam_size: int = 5,
                score_norm: bool = True, nbest: int = 1,
                max_sym_per_step: int = 1):
    """Batched time-synchronous transducer beam search (ALSD-flavored:
    hyps are length-synchronous in emitted frames; each step every hyp
    either emits a top token or takes blank and advances t)."""
    B, T, D = enc.shape
    beam = beam_size
    rows = B * beam
    Umax = T  # at most one emission per step here
    V = model.vocab_size

    enc_rows = jnp.repeat(enc, beam, axis=0)
    enc_lens_rows = jnp.repeat(enc_lens, beam, axis=0)
    carry0 = model.apply(params, rows, method=model.decoder_init_carry)
    dec_out0, carry0 = model.apply(params, carry0,
                                   jnp.zeros((rows,), jnp.int32),
                                   method=model.decoder_step)
    st = BeamState(
        t=jnp.zeros((rows,), jnp.int32),
        tokens=jnp.zeros((rows, Umax), jnp.int32),
        n_tok=jnp.zeros((rows,), jnp.int32),
        scores=jnp.where(jnp.arange(rows) % beam == 0, 0.0, NEG_INF),
        dec_out=dec_out0, carry=carry0,
        done=jnp.zeros((rows,), bool))

    max_steps = 2 * T  # each step consumes a frame (blank) or emits

    def cond(args):
        i, s = args
        return (i < max_steps) & ~jnp.all(s.done)

    def body(args):
        i, s = args
        t_c = jnp.clip(s.t, 0, T - 1)
        enc_frame = enc_rows[jnp.arange(rows), t_c]
        logits = model.apply(params, enc_frame, s.dec_out,
                             method=model.joint_step)
        logp = jax.nn.log_softmax(logits, axis=-1)  # (rows, V)
        # candidates: top-(beam) non-blank emissions + blank advance
        nb_logp = logp.at[:, model.blank_id].set(NEG_INF)
        top_lp, top_id = jax.lax.top_k(nb_logp, beam)  # (rows, beam)
        blank_lp = logp[:, model.blank_id]
        # candidate matrix: [blank | top tokens] -> (rows, beam+1)
        cand_scores = jnp.concatenate(
            [(s.scores + blank_lp)[:, None], s.scores[:, None] + top_lp],
            axis=1)
        # frozen rows: only blank-hold allowed
        hold = jnp.arange(beam + 1)[None, :] == 0
        cand_scores = jnp.where(s.done[:, None],
                                jnp.where(hold, s.scores[:, None], NEG_INF),
                                cand_scores)
        Wc = beam + 1
        flat = cand_scores.reshape(B, beam * Wc)
        new_scores, idx = jax.lax.top_k(flat, beam)
        src_beam = idx // Wc
        cand_col = idx % Wc
        src_row = (src_beam + (jnp.arange(B) * beam)[:, None]).reshape(-1)
        cand_col = cand_col.reshape(-1)
        is_blank = cand_col == 0
        tok = jnp.where(is_blank, 0,
                        top_id[src_row, jnp.maximum(cand_col - 1, 0)])
        was_done = s.done[src_row]
        # gather
        t_new = s.t[src_row] + (is_blank & ~was_done).astype(jnp.int32)
        tokens = s.tokens[src_row]
        n_tok = s.n_tok[src_row]
        emit = ~is_blank & ~was_done
        tokens = jax.vmap(
            lambda row, p, v, e: row.at[p].set(jnp.where(e, v, row[p])))(
            tokens, jnp.clip(n_tok, 0, Umax - 1), tok, emit)
        n_tok = n_tok + emit.astype(jnp.int32)
        new_dec_out, new_carry = model.apply(
            params, jax.tree_util.tree_map(lambda c: c[src_row], s.carry),
            tok, method=model.decoder_step)
        dec_out = jnp.where(emit[:, None], new_dec_out, s.dec_out[src_row])
        carry = jax.tree_util.tree_map(
            lambda n, o: jnp.where(
                emit.reshape((-1,) + (1,) * (n.ndim - 1)), n, o[src_row]),
            new_carry, s.carry)
        done = was_done | (t_new >= enc_lens_rows)
        # prefix merge (beam_search_transducer.py recombination): rows of
        # the same utterance holding the identical (sequence, frame)
        # state are duplicates reached via different blank/emit orders —
        # combine their probability mass into the first occurrence
        scores = new_scores.reshape(-1)
        same_utt = (jnp.arange(rows)[:, None] // beam
                    == jnp.arange(rows)[None, :] // beam)
        eq = (same_utt
              & (n_tok[:, None] == n_tok[None, :])
              & (t_new[:, None] == t_new[None, :])
              & jnp.all(tokens[:, None, :] == tokens[None, :, :], axis=-1))
        idx = jnp.arange(rows)
        first = jnp.argmax(eq, axis=1)  # lowest row index of the group
        is_first = first == idx
        group_score = jax.nn.logsumexp(
            jnp.where(eq, scores[None, :], NEG_INF), axis=1)
        scores = jnp.where(is_first, group_score, NEG_INF)
        return i + 1, BeamState(t=t_new, tokens=tokens, n_tok=n_tok,
                                scores=scores,
                                dec_out=dec_out, carry=carry, done=done)

    _, final = jax.lax.while_loop(cond, body, (jnp.asarray(0), st))
    scores = final.scores
    if score_norm:
        scores = scores / jnp.maximum(final.n_tok, 1)
    return final.tokens, final.n_tok, scores


def decode_transducer(model, params, enc, enc_lens,
                      config: TransducerSearchConfig):
    """Dispatch greedy/beam; returns host-side n-best per utterance."""
    B = enc.shape[0]
    if config.search_type == "greedy" or config.beam_size <= 1:
        fn = jax.jit(functools.partial(greedy_search, model,
                                       max_sym_exp=config.max_sym_exp))
        tokens, n_tok = fn(params, enc, enc_lens)
        tokens, n_tok = np.asarray(tokens), np.asarray(n_tok)
        return [[(tokens[b, :n_tok[b]].tolist(), 0.0)] for b in range(B)]
    fn = jax.jit(functools.partial(beam_search, model,
                                   beam_size=config.beam_size,
                                   score_norm=config.score_norm))
    tokens, n_tok, scores = fn(params, enc, enc_lens)
    tokens = np.asarray(tokens)
    n_tok = np.asarray(n_tok)
    scores = np.asarray(scores)
    beam = config.beam_size
    results = []
    for b in range(B):
        hyps = []
        for k in range(beam):
            r = b * beam + k
            hyps.append((tokens[r, :n_tok[r]].tolist(), float(scores[r])))
        hyps.sort(key=lambda h: -h[1])
        # dedup identical sequences (blank-path merges)
        seen, uniq = set(), []
        for ids, sc in hyps:
            key = tuple(ids)
            if key not in seen:
                seen.add(key)
                uniq.append((ids, sc))
        results.append(uniq[:config.nbest])
    return results
