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
    search_type: str = "default"  # greedy|default|alsd|tsd|nsc|maes|mbg
    max_sym_exp: int = 3          # max symbols per frame (greedy, tsd)
    score_norm: bool = True
    nbest: int = 1
    # mAES (beam_search_transducer.py:760) controls
    nstep: int = 2                # expansions per frame (maes, nsc)
    expansion_gamma: float = 2.3  # prune candidates this far below best
    expansion_beta: int = 2       # extra candidates kept per expansion
    big_blank_durations: tuple = ()  # mbg multi-blank greedy
    u_max_ratio: float = 0.5      # ALSD emission bound / frame count
    prefix_alpha: int = 1         # NSC prefix-merge max length gap


def greedy_search(model, params, enc, enc_lens, max_sym_exp: int = 3,
                  big_blank_durations=()):
    """Batched greedy decode. enc: (B, T, D) -> list of token lists.

    Walks the lattice with per-utterance (t, u) pointers inside one
    while_loop: emit (token != blank, u+1, decoder step) or advance
    (blank, t+1). max_sym_exp bounds symbols per frame
    (beam_search_transducer.py:239 greedy semantics). With
    big_blank_durations, this is the multi-blank greedy ("mbg",
    beam_search_transducer.py:103): big blank k (vocab index
    V - n_big + k) advances t by durations[k] frames.
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
        V = model.vocab_size
        n_big = len(big_blank_durations)
        is_big = (tok >= V - n_big) if n_big else jnp.zeros_like(tok, bool)
        blank_like = (tok == model.blank_id) | is_big
        emit = ~blank_like & active & (s.n_sym_frame < max_sym_exp)
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
        if n_big:
            durs = jnp.asarray(big_blank_durations, jnp.int32)
            step_t = jnp.where(is_big, durs[jnp.clip(tok - (V - n_big),
                                                     0, n_big - 1)], 1)
        else:
            step_t = jnp.ones_like(s.t)
        advance = ~emit & active
        return S(t=s.t + jnp.where(advance, step_t, 0),
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


class GreedyStreamState(NamedTuple):
    """Carried across chunks for streaming transducer decode."""
    tokens: jnp.ndarray    # (B, Umax)
    n_tok: jnp.ndarray     # (B,)
    dec_out: jnp.ndarray   # (B, Dd)
    carry: tuple


def greedy_stream_init(model, params, batch: int, umax: int
                       ) -> GreedyStreamState:
    carry0 = model.apply(params, batch, method=model.decoder_init_carry)
    dec_out0, carry0 = model.apply(params, carry0,
                                   jnp.zeros((batch,), jnp.int32),
                                   method=model.decoder_step)
    return GreedyStreamState(
        tokens=jnp.zeros((batch, umax), jnp.int32),
        n_tok=jnp.zeros((batch,), jnp.int32),
        dec_out=dec_out0, carry=carry0)


def greedy_stream_step(model, params, enc_chunk, chunk_lens,
                       state: GreedyStreamState, max_sym_exp: int = 3
                       ) -> GreedyStreamState:
    """Continue greedy transducer decode over one encoder chunk.

    The chunkwise analogue of beam_search_transducer_streaming.py: the
    prediction-network state and running hypothesis persist across
    chunks, so feeding chunks [0..N] produces exactly the same output as
    one full-utterance greedy pass (tested)."""
    B, C, D = enc_chunk.shape
    Umax = state.tokens.shape[1]

    class S(NamedTuple):
        t: jnp.ndarray
        n_sym_frame: jnp.ndarray
        st: GreedyStreamState

    def cond(s):
        return jnp.any(s.t < chunk_lens)

    def body(s):
        t_c = jnp.clip(s.t, 0, C - 1)
        enc_frame = enc_chunk[jnp.arange(B), t_c]
        logits = model.apply(params, enc_frame, s.st.dec_out,
                             method=model.joint_step)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        active = s.t < chunk_lens
        emit = (tok != model.blank_id) & active & \
            (s.n_sym_frame < max_sym_exp)
        new_dec_out, new_carry = model.apply(params, s.st.carry, tok,
                                             method=model.decoder_step)
        dec_out = jnp.where(emit[:, None], new_dec_out, s.st.dec_out)
        carry = jax.tree_util.tree_map(
            lambda n, o: jnp.where(
                emit.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
            new_carry, s.st.carry)
        tokens = jax.vmap(
            lambda row, p, v, e: row.at[p].set(jnp.where(e, v, row[p])))(
            s.st.tokens, jnp.clip(s.st.n_tok, 0, Umax - 1), tok, emit)
        n_tok = s.st.n_tok + emit.astype(jnp.int32)
        advance = ~emit & active
        return S(t=s.t + advance.astype(jnp.int32),
                 n_sym_frame=jnp.where(emit, s.n_sym_frame + 1, 0),
                 st=GreedyStreamState(tokens=tokens, n_tok=n_tok,
                                      dec_out=dec_out, carry=carry))

    final = jax.lax.while_loop(
        cond, body, S(t=jnp.zeros((B,), jnp.int32),
                      n_sym_frame=jnp.zeros((B,), jnp.int32), st=state))
    return final.st


def maes_search(model, params, enc, enc_lens, beam_size: int = 5,
                nstep: int = 2, expansion_gamma: float = 2.3,
                expansion_beta: int = 2, score_norm: bool = True):
    """Batched mAES — modified Adaptive Expansion Search
    (beam_search_transducer.py:760, Kim et al. 2021).

    Frame-synchronous: per frame, up to `nstep` symbol expansions; at
    each expansion, candidates scoring more than `expansion_gamma` below
    the per-row best are pruned; hyps that take blank land in the frame's
    "final" store (entering the next frame), duplicates are recombined by
    logsumexp. All beam rows advance in lockstep — one while_loop over
    frames, static inner expansion loop, everything batched (B*beam)."""
    B, T, D = enc.shape
    beam = beam_size
    rows = B * beam
    Umax = T + nstep
    V = model.vocab_size
    k_exp = min(beam + expansion_beta, V - 1)

    enc_rows = jnp.repeat(enc, beam, axis=0)
    enc_lens_rows = jnp.repeat(enc_lens, beam, axis=0)
    carry0 = model.apply(params, rows, method=model.decoder_init_carry)
    dec_out0, carry0 = model.apply(params, carry0,
                                   jnp.zeros((rows,), jnp.int32),
                                   method=model.decoder_step)

    class S(NamedTuple):
        t: jnp.ndarray
        tokens: jnp.ndarray
        n_tok: jnp.ndarray
        scores: jnp.ndarray
        dec_out: jnp.ndarray
        carry: tuple

    st = S(t=jnp.asarray(0, jnp.int32),
           tokens=jnp.zeros((rows, Umax), jnp.int32),
           n_tok=jnp.zeros((rows,), jnp.int32),
           scores=jnp.where(jnp.arange(rows) % beam == 0, 0.0, NEG_INF),
           dec_out=dec_out0, carry=carry0)

    def merge_dups(scores, tokens, n_tok):
        """logsumexp-recombine rows of the same utterance holding the
        identical token sequence (beam_search_transducer recombine_hyps)."""
        same_utt = (jnp.arange(rows)[:, None] // beam
                    == jnp.arange(rows)[None, :] // beam)
        eq = (same_utt & (n_tok[:, None] == n_tok[None, :])
              & jnp.all(tokens[:, None, :] == tokens[None, :, :], axis=-1)
              & (scores[None, :] > NEG_INF / 2))
        first = jnp.argmax(eq, axis=1)
        is_first = (first == jnp.arange(rows)) & (scores > NEG_INF / 2)
        group = jax.nn.logsumexp(jnp.where(eq, scores[None, :], NEG_INF),
                                 axis=1)
        return jnp.where(is_first, group, NEG_INF)

    def frame_body(s: S) -> S:
        t_c = jnp.clip(s.t, 0, T - 1)  # scalar: rows advance in lockstep
        active = (s.t < enc_lens_rows) & (s.scores > NEG_INF / 2)
        enc_frame = jax.lax.dynamic_slice_in_dim(
            enc_rows, t_c, 1, axis=1)[:, 0, :]  # (rows, D)
        # frame-final store: hyps that have taken blank at this frame
        fin_scores = jnp.full((rows,), NEG_INF)
        fin_tokens = s.tokens
        fin_ntok = s.n_tok
        fin_dec = s.dec_out
        fin_carry = s.carry

        cur_scores, cur_tokens, cur_ntok = s.scores, s.tokens, s.n_tok
        cur_dec, cur_carry = s.dec_out, s.carry
        for step in range(nstep):
            logits = model.apply(params, enc_frame, cur_dec,
                                 method=model.joint_step)
            logp = jax.nn.log_softmax(logits, axis=-1)
            blank_lp = logp[:, model.blank_id]
            # blank expansion -> candidate for the frame-final store
            cand_fin = jnp.where(active & (cur_scores > NEG_INF / 2),
                                 cur_scores + blank_lp, NEG_INF)
            # keep the better of (existing final, new blank candidate)
            # per slot after a top-k merge across the utterance
            both_scores = jnp.concatenate(
                [fin_scores.reshape(B, beam), cand_fin.reshape(B, beam)],
                axis=1)  # (B, 2*beam)
            both_tokens = jnp.concatenate(
                [fin_tokens.reshape(B, beam, Umax),
                 cur_tokens.reshape(B, beam, Umax)], axis=1)
            both_ntok = jnp.concatenate(
                [fin_ntok.reshape(B, beam), cur_ntok.reshape(B, beam)],
                axis=1)
            both_dec = jnp.concatenate(
                [fin_dec.reshape(B, beam, -1),
                 cur_dec.reshape(B, beam, -1)], axis=1)
            both_carry = jax.tree_util.tree_map(
                lambda f, c: jnp.concatenate(
                    [f.reshape((B, beam) + f.shape[1:]),
                     c.reshape((B, beam) + c.shape[1:])], axis=1),
                fin_carry, cur_carry)
            top_s, top_i = jax.lax.top_k(both_scores, beam)
            fin_scores = top_s.reshape(-1)
            fin_tokens = jnp.take_along_axis(
                both_tokens, top_i[:, :, None], axis=1).reshape(rows, Umax)
            fin_ntok = jnp.take_along_axis(both_ntok, top_i,
                                           axis=1).reshape(-1)
            fin_dec = jnp.take_along_axis(
                both_dec, top_i[:, :, None], axis=1).reshape(rows, -1)
            fin_carry = jax.tree_util.tree_map(
                lambda x: jnp.take_along_axis(
                    x, top_i.reshape(top_i.shape + (1,) * (x.ndim - 2)),
                    axis=1).reshape((rows,) + x.shape[2:]),
                both_carry)
            fin_scores = merge_dups(fin_scores, fin_tokens, fin_ntok)
            if step == nstep - 1:
                break
            # non-blank expansions with adaptive gamma pruning
            nb_logp = logp.at[:, model.blank_id].set(NEG_INF)
            top_lp, top_id = jax.lax.top_k(nb_logp, k_exp)
            best = top_lp[:, :1]
            top_lp = jnp.where(top_lp < best - expansion_gamma, NEG_INF,
                               top_lp)
            cand = jnp.where((active & (cur_scores > NEG_INF / 2))[:, None],
                             cur_scores[:, None] + top_lp, NEG_INF)
            flat = cand.reshape(B, beam * k_exp)
            new_s, idx = jax.lax.top_k(flat, beam)
            src = (idx // k_exp
                   + (jnp.arange(B) * beam)[:, None]).reshape(-1)
            col = (idx % k_exp).reshape(-1)
            tok = top_id[src, col]
            cur_scores = new_s.reshape(-1)
            cur_tokens = s.tokens[src] if step == 0 else cur_tokens[src]
            cur_ntok = (s.n_tok[src] if step == 0 else cur_ntok[src])
            cur_tokens = jax.vmap(
                lambda row, p, v: row.at[p].set(v))(
                cur_tokens, jnp.clip(cur_ntok, 0, Umax - 1), tok)
            cur_ntok = cur_ntok + (cur_scores > NEG_INF / 2).astype(
                jnp.int32)
            new_dec, new_carry = model.apply(
                params,
                jax.tree_util.tree_map(
                    lambda c: c[src], cur_carry if step > 0 else s.carry),
                tok, method=model.decoder_step)
            cur_dec = new_dec
            cur_carry = new_carry
        # inactive rows pass through unchanged (already-ended utterances)
        keep = ~active
        fin_scores = jnp.where(keep, s.scores, fin_scores)
        fin_tokens = jnp.where(keep[:, None], s.tokens, fin_tokens)
        fin_ntok = jnp.where(keep, s.n_tok, fin_ntok)
        fin_dec = jnp.where(keep[:, None], s.dec_out, fin_dec)
        fin_carry = jax.tree_util.tree_map(
            lambda f, o: jnp.where(
                keep.reshape((-1,) + (1,) * (f.ndim - 1)), o, f),
            fin_carry, s.carry)
        return S(t=s.t + 1, tokens=fin_tokens, n_tok=fin_ntok,
                 scores=fin_scores, dec_out=fin_dec, carry=fin_carry)

    def cond(s: S):
        return s.t < jnp.max(enc_lens)

    final = jax.lax.while_loop(cond, frame_body, st)
    scores = final.scores
    if score_norm:
        scores = scores / jnp.maximum(final.n_tok, 1)
    return final.tokens, final.n_tok, scores


def alsd_search(model, params, enc, enc_lens, beam_size: int = 5,
                u_max_ratio: float = 0.5, score_norm: bool = True):
    """Batched ALSD — Alignment-Length Synchronous Decoding
    (beam_search_transducer.py:487, Saon et al. 2020).

    All hypotheses share the same alignment length i = t + u; per step
    each hyp expands with blank (t+1) or a token (u+1), both landing at
    alignment length i+1, so the beam stays synchronous without per-row
    frame pointers diverging unboundedly. Emissions are HARD-bounded by
    u_max = ceil(u_max_ratio * T) (the ALSD length model); hyps whose t
    reaches the utterance end enter a FINAL store via logsumexp
    recombination and stop expanding. Runs i = 0..T+u_max-1 in one
    while_loop over the whole batch.
    """
    B, T, D = enc.shape
    beam = beam_size
    rows = B * beam
    u_max = max(int(np.ceil(u_max_ratio * T)), 1)
    Umax = u_max

    enc_rows = jnp.repeat(enc, beam, axis=0)
    enc_lens_rows = jnp.repeat(enc_lens, beam, axis=0)
    carry0 = model.apply(params, rows, method=model.decoder_init_carry)
    dec_out0, carry0 = model.apply(params, carry0,
                                   jnp.zeros((rows,), jnp.int32),
                                   method=model.decoder_step)

    class S(NamedTuple):
        i: jnp.ndarray          # scalar alignment length
        t: jnp.ndarray          # (rows,) = i - u per hyp
        tokens: jnp.ndarray
        n_tok: jnp.ndarray
        scores: jnp.ndarray
        dec_out: jnp.ndarray
        carry: tuple
        fin_scores: jnp.ndarray   # final store (recombined)
        fin_tokens: jnp.ndarray
        fin_ntok: jnp.ndarray

    st = S(i=jnp.asarray(0, jnp.int32),
           t=jnp.zeros((rows,), jnp.int32),
           tokens=jnp.zeros((rows, Umax), jnp.int32),
           n_tok=jnp.zeros((rows,), jnp.int32),
           scores=jnp.where(jnp.arange(rows) % beam == 0, 0.0, NEG_INF),
           dec_out=dec_out0, carry=carry0,
           fin_scores=jnp.full((rows,), NEG_INF),
           fin_tokens=jnp.zeros((rows, Umax), jnp.int32),
           fin_ntok=jnp.zeros((rows,), jnp.int32))

    def merge_into_finals(s, new_scores, new_tokens, new_ntok):
        """logsumexp duplicate finals, then keep beam best per utt."""
        both_s = jnp.concatenate([s.fin_scores.reshape(B, beam),
                                  new_scores.reshape(B, beam)], axis=1)
        both_tok = jnp.concatenate([s.fin_tokens.reshape(B, beam, Umax),
                                    new_tokens.reshape(B, beam, Umax)],
                                   axis=1)
        both_n = jnp.concatenate([s.fin_ntok.reshape(B, beam),
                                  new_ntok.reshape(B, beam)], axis=1)
        W = 2 * beam
        # recombine identical sequences across the 2*beam slots
        eq = ((both_n[:, :, None] == both_n[:, None, :])
              & jnp.all(both_tok[:, :, None, :] == both_tok[:, None, :, :],
                        axis=-1)
              & (both_s[:, None, :] > NEG_INF / 2)
              & (both_s[:, :, None] > NEG_INF / 2))
        first = jnp.argmax(eq, axis=2)
        is_first = (first == jnp.arange(W)[None, :]) & (both_s > NEG_INF / 2)
        group = jax.nn.logsumexp(
            jnp.where(eq, both_s[:, None, :], NEG_INF), axis=2)
        both_s = jnp.where(is_first, group, NEG_INF)
        top_s, top_i = jax.lax.top_k(both_s, beam)
        fin_tokens = jnp.take_along_axis(
            both_tok, top_i[:, :, None], axis=1).reshape(rows, Umax)
        fin_ntok = jnp.take_along_axis(both_n, top_i, axis=1).reshape(-1)
        return top_s.reshape(-1), fin_tokens, fin_ntok

    def cond(s):
        return (s.i < T + u_max) & jnp.any(s.scores > NEG_INF / 2)

    def body(s):
        t_c = jnp.clip(s.t, 0, T - 1)
        enc_frame = enc_rows[jnp.arange(rows), t_c]
        logits = model.apply(params, enc_frame, s.dec_out,
                             method=model.joint_step)
        logp = jax.nn.log_softmax(logits, axis=-1)
        alive = s.scores > NEG_INF / 2
        blank_lp = logp[:, model.blank_id]
        # blank expansion: t+1. If t+1 == enc_len -> candidate FINAL
        blank_scores = jnp.where(alive, s.scores + blank_lp, NEG_INF)
        reaches_end = s.t + 1 >= enc_lens_rows
        fin_cand = jnp.where(reaches_end, blank_scores, NEG_INF)
        fin_scores, fin_tokens, fin_ntok = merge_into_finals(
            s, fin_cand, s.tokens, s.n_tok)
        blank_scores = jnp.where(reaches_end, NEG_INF, blank_scores)
        # token expansions: u+1, bounded by u_max
        nb_logp = logp.at[:, model.blank_id].set(NEG_INF)
        top_lp, top_id = jax.lax.top_k(nb_logp, beam)
        can_emit = alive & (s.n_tok < u_max)
        tok_scores = jnp.where(can_emit[:, None],
                               s.scores[:, None] + top_lp, NEG_INF)
        # candidates per row: [blank | beam tokens] -> global top-k
        cand = jnp.concatenate([blank_scores[:, None], tok_scores], axis=1)
        Wc = beam + 1
        flat = cand.reshape(B, beam * Wc)
        new_scores, idx = jax.lax.top_k(flat, beam)
        src_row = (idx // Wc + (jnp.arange(B) * beam)[:, None]).reshape(-1)
        col = (idx % Wc).reshape(-1)
        is_blank = col == 0
        tok = jnp.where(is_blank, 0,
                        top_id[src_row, jnp.maximum(col - 1, 0)])
        t_new = s.t[src_row] + is_blank.astype(jnp.int32)
        tokens = s.tokens[src_row]
        n_tok = s.n_tok[src_row]
        emit = ~is_blank
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
        scores = new_scores.reshape(-1)
        # recombine identical (sequence, t) duplicates among live rows
        same_utt = (jnp.arange(rows)[:, None] // beam
                    == jnp.arange(rows)[None, :] // beam)
        eq = (same_utt & (n_tok[:, None] == n_tok[None, :])
              & (t_new[:, None] == t_new[None, :])
              & jnp.all(tokens[:, None, :] == tokens[None, :, :], axis=-1)
              & (scores[None, :] > NEG_INF / 2)
              & (scores[:, None] > NEG_INF / 2))
        first = jnp.argmax(eq, axis=1)
        is_first = (first == jnp.arange(rows)) & (scores > NEG_INF / 2)
        group = jax.nn.logsumexp(jnp.where(eq, scores[None, :], NEG_INF),
                                 axis=1)
        scores = jnp.where(is_first, group, NEG_INF)
        return S(i=s.i + 1, t=t_new, tokens=tokens, n_tok=n_tok,
                 scores=scores, dec_out=dec_out, carry=carry,
                 fin_scores=fin_scores, fin_tokens=fin_tokens,
                 fin_ntok=fin_ntok)

    final = jax.lax.while_loop(cond, body, st)
    # fall back to live hyps for utterances with no finals (shouldn't
    # happen with the i-bound, but keeps decode total)
    has_fin = jnp.max(final.fin_scores.reshape(B, beam), axis=1) > NEG_INF / 2
    has_fin = jnp.repeat(has_fin, beam)
    scores = jnp.where(has_fin, final.fin_scores, final.scores)
    tokens = jnp.where(has_fin[:, None], final.fin_tokens, final.tokens)
    n_tok = jnp.where(has_fin, final.fin_ntok, final.n_tok)
    if score_norm:
        scores = scores / jnp.maximum(n_tok, 1)
    return tokens, n_tok, scores


def nsc_search(model, params, enc, enc_lens, beam_size: int = 5,
               nstep: int = 2, prefix_alpha: int = 1,
               score_norm: bool = True):
    """Batched NSC — N-step Constrained beam search
    (beam_search_transducer.py:597, Kim et al. 2020).

    Frame-synchronous like mAES, but (a) expansions are constrained to
    the beam at every sub-step (no adaptive gamma; exactly `nstep`
    constrained expansions per frame), and (b) before expanding, a
    PREFIX-SEARCH merge adds each hypothesis A's mass to hypotheses B
    that extend A by at most `prefix_alpha` tokens at the current frame
    (Graves 2012 prefix search, reference prefix_search at :640):
    score(B) += score(A) + logp_A(frame, B_extension_token).
    """
    B, T, D = enc.shape
    beam = beam_size
    rows = B * beam
    Umax = T + nstep

    enc_rows = jnp.repeat(enc, beam, axis=0)
    enc_lens_rows = jnp.repeat(enc_lens, beam, axis=0)
    carry0 = model.apply(params, rows, method=model.decoder_init_carry)
    dec_out0, carry0 = model.apply(params, carry0,
                                   jnp.zeros((rows,), jnp.int32),
                                   method=model.decoder_step)

    class S(NamedTuple):
        t: jnp.ndarray
        tokens: jnp.ndarray
        n_tok: jnp.ndarray
        scores: jnp.ndarray
        dec_out: jnp.ndarray
        carry: tuple

    st = S(t=jnp.asarray(0, jnp.int32),
           tokens=jnp.zeros((rows, Umax), jnp.int32),
           n_tok=jnp.zeros((rows,), jnp.int32),
           scores=jnp.where(jnp.arange(rows) % beam == 0, 0.0, NEG_INF),
           dec_out=dec_out0, carry=carry0)

    def prefix_merge(s, logp):
        """score(B) += score(A)+logp_A[tok] for A a one-token-short
        prefix of B (prefix_alpha=1 practical case, reference :640-668).
        logp: (rows, V) joint at the current frame computed from each
        row's OWN decoder state (so logp_A is row A's distribution)."""
        tokens, n_tok, scores = s.tokens, s.n_tok, s.scores
        same_utt = (jnp.arange(rows)[:, None] // beam
                    == jnp.arange(rows)[None, :] // beam)
        # A (axis 1) is prefix of B (axis 0) with exactly 1 extra token
        len_ok = n_tok[:, None] == n_tok[None, :] + 1
        # match over the first n_tok[A] tokens
        pos = jnp.arange(Umax)
        m = pos[None, None, :] < n_tok[None, :, None]  # (1, A, U)
        eq_pref = jnp.all(
            (tokens[:, None, :] == tokens[None, :, :]) | ~m, axis=-1)
        valid = (same_utt & len_ok & eq_pref
                 & (scores[:, None] > NEG_INF / 2)
                 & (scores[None, :] > NEG_INF / 2))
        # B's extension token = tokens[B, n_tok[B]-1]
        ext_tok = jax.vmap(lambda row, p: row[p])(
            tokens, jnp.clip(n_tok - 1, 0, Umax - 1))  # (rows,)
        # lp_ab[a, b] = logp_row_a(ext_tok of row b); contrib indexed
        # [B_row, A_row] = score(A) + logp_A(B's extension token)
        lp_ab = logp[:, ext_tok]
        contrib = jnp.where(valid, scores[None, :] + lp_ab.T, NEG_INF)
        add = jax.nn.logsumexp(contrib, axis=1)
        return jnp.where(add > NEG_INF / 2,
                         jnp.logaddexp(scores, add), scores)

    def frame_body(s: S) -> S:
        t_c = jnp.clip(s.t, 0, T - 1)
        active = (s.t < enc_lens_rows) & (s.scores > NEG_INF / 2)
        enc_frame = jax.lax.dynamic_slice_in_dim(
            enc_rows, t_c, 1, axis=1)[:, 0, :]
        logits0 = model.apply(params, enc_frame, s.dec_out,
                              method=model.joint_step)
        logp0 = jax.nn.log_softmax(logits0, axis=-1)
        scores = jnp.where(active, prefix_merge(s, logp0), s.scores)
        s = s._replace(scores=scores)

        fin_scores = jnp.full((rows,), NEG_INF)
        fin_tokens, fin_ntok = s.tokens, s.n_tok
        fin_dec, fin_carry = s.dec_out, s.carry
        cur_scores, cur_tokens, cur_ntok = s.scores, s.tokens, s.n_tok
        cur_dec, cur_carry = s.dec_out, s.carry
        for step in range(nstep):
            logits = model.apply(params, enc_frame, cur_dec,
                                 method=model.joint_step) \
                if step > 0 else logits0
            logp = jax.nn.log_softmax(logits, axis=-1)
            blank_lp = logp[:, model.blank_id]
            cand_fin = jnp.where(active & (cur_scores > NEG_INF / 2),
                                 cur_scores + blank_lp, NEG_INF)
            both_scores = jnp.concatenate(
                [fin_scores.reshape(B, beam), cand_fin.reshape(B, beam)],
                axis=1)
            both_tokens = jnp.concatenate(
                [fin_tokens.reshape(B, beam, Umax),
                 cur_tokens.reshape(B, beam, Umax)], axis=1)
            both_ntok = jnp.concatenate(
                [fin_ntok.reshape(B, beam), cur_ntok.reshape(B, beam)],
                axis=1)
            both_dec = jnp.concatenate(
                [fin_dec.reshape(B, beam, -1),
                 cur_dec.reshape(B, beam, -1)], axis=1)
            both_carry = jax.tree_util.tree_map(
                lambda f, c: jnp.concatenate(
                    [f.reshape((B, beam) + f.shape[1:]),
                     c.reshape((B, beam) + c.shape[1:])], axis=1),
                fin_carry, cur_carry)
            top_s, top_i = jax.lax.top_k(both_scores, beam)
            fin_scores = top_s.reshape(-1)
            fin_tokens = jnp.take_along_axis(
                both_tokens, top_i[:, :, None], axis=1).reshape(rows, Umax)
            fin_ntok = jnp.take_along_axis(both_ntok, top_i,
                                           axis=1).reshape(-1)
            fin_dec = jnp.take_along_axis(
                both_dec, top_i[:, :, None], axis=1).reshape(rows, -1)
            fin_carry = jax.tree_util.tree_map(
                lambda x: jnp.take_along_axis(
                    x, top_i.reshape(top_i.shape + (1,) * (x.ndim - 2)),
                    axis=1).reshape((rows,) + x.shape[2:]),
                both_carry)
            if step == nstep - 1:
                break
            # constrained expansion: beam tokens per row, then global
            # top-BEAM cut (no gamma pruning — the NSC constraint is the
            # beam itself at every sub-step)
            nb_logp = logp.at[:, model.blank_id].set(NEG_INF)
            top_lp, top_id = jax.lax.top_k(nb_logp, beam)
            cand = jnp.where((active & (cur_scores > NEG_INF / 2))[:, None],
                             cur_scores[:, None] + top_lp, NEG_INF)
            flat = cand.reshape(B, beam * beam)
            new_s, idx = jax.lax.top_k(flat, beam)
            src = (idx // beam + (jnp.arange(B) * beam)[:, None]).reshape(-1)
            col = (idx % beam).reshape(-1)
            tok = top_id[src, col]
            cur_scores = new_s.reshape(-1)
            base_tokens = s.tokens if step == 0 else cur_tokens
            base_ntok = s.n_tok if step == 0 else cur_ntok
            cur_tokens = base_tokens[src]
            cur_ntok = base_ntok[src]
            cur_tokens = jax.vmap(
                lambda row, p, v: row.at[p].set(v))(
                cur_tokens, jnp.clip(cur_ntok, 0, Umax - 1), tok)
            cur_ntok = cur_ntok + (cur_scores > NEG_INF / 2).astype(
                jnp.int32)
            new_dec, new_carry = model.apply(
                params,
                jax.tree_util.tree_map(
                    lambda c: c[src], cur_carry if step > 0 else s.carry),
                tok, method=model.decoder_step)
            cur_dec, cur_carry = new_dec, new_carry
        keep = ~active
        fin_scores = jnp.where(keep, s.scores, fin_scores)
        fin_tokens = jnp.where(keep[:, None], s.tokens, fin_tokens)
        fin_ntok = jnp.where(keep, s.n_tok, fin_ntok)
        fin_dec = jnp.where(keep[:, None], s.dec_out, fin_dec)
        fin_carry = jax.tree_util.tree_map(
            lambda f, o: jnp.where(
                keep.reshape((-1,) + (1,) * (f.ndim - 1)), o, f),
            fin_carry, s.carry)
        return S(t=s.t + 1, tokens=fin_tokens, n_tok=fin_ntok,
                 scores=fin_scores, dec_out=fin_dec, carry=fin_carry)

    def cond(s: S):
        return s.t < jnp.max(enc_lens)

    final = jax.lax.while_loop(cond, frame_body, st)
    scores = final.scores
    if score_norm:
        scores = scores / jnp.maximum(final.n_tok, 1)
    return final.tokens, final.n_tok, scores


def decode_transducer(model, params, enc, enc_lens,
                      config: TransducerSearchConfig):
    """Dispatch greedy/beam; returns host-side n-best per utterance."""
    B = enc.shape[0]
    if config.search_type in ("greedy", "mbg") or config.beam_size <= 1:
        fn = jax.jit(functools.partial(
            greedy_search, model, max_sym_exp=config.max_sym_exp,
            big_blank_durations=tuple(config.big_blank_durations)))
        tokens, n_tok = fn(params, enc, enc_lens)
        tokens, n_tok = np.asarray(tokens), np.asarray(n_tok)
        return [[(tokens[b, :n_tok[b]].tolist(), 0.0)] for b in range(B)]
    if config.search_type == "maes":
        fn = jax.jit(functools.partial(
            maes_search, model, beam_size=config.beam_size,
            nstep=config.nstep, expansion_gamma=config.expansion_gamma,
            expansion_beta=config.expansion_beta,
            score_norm=config.score_norm))
    elif config.search_type == "tsd":
        # time-synchronous decoding (beam_search_transducer.py:383): the
        # mAES frame loop with pruning disabled IS TSD — up to max_sym_exp
        # expansions per frame, no adaptive gamma cut, full-beam
        # candidates
        fn = jax.jit(functools.partial(
            maes_search, model, beam_size=config.beam_size,
            nstep=max(config.max_sym_exp, 1), expansion_gamma=1e9,
            expansion_beta=config.beam_size,
            score_norm=config.score_norm))
    elif config.search_type == "alsd":
        # alignment-length synchronous (beam_search_transducer.py:487)
        fn = jax.jit(functools.partial(
            alsd_search, model, beam_size=config.beam_size,
            u_max_ratio=config.u_max_ratio,
            score_norm=config.score_norm))
    elif config.search_type == "nsc":
        # N-step constrained w/ prefix search (:597)
        fn = jax.jit(functools.partial(
            nsc_search, model, beam_size=config.beam_size,
            nstep=config.nstep, prefix_alpha=config.prefix_alpha,
            score_norm=config.score_norm))
    else:  # default (label-synchronous blank/emit beam)
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
