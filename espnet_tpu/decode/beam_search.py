"""Batched hybrid CTC/attention beam search — one XLA program.

Behavioral contract: espnet2/legacy/nets/beam_search.py:34-604 and
batch_beam_search.py (label-synchronous search; weighted sum of full
scorers (attention decoder, LM, length bonus) + partial scorer (CTC
prefix) with pre-beam pruning; eos handling; min/max length ratios;
n-best output).

TPU-first redesign (SURVEY.md §7): instead of Python hypothesis lists
with dynamic removal of ended hyps (batch_beam_search.py:317-423), the
beam is a FIXED (batch*beam) block of slots. Hypotheses that emit eos
are moved into a per-utterance ended-hypothesis STORE (top-`beam` by
score, a running top-k merge — the fixed-size analogue of the
reference's `ended_hyps` list, batch_beam_search.py:359-423) and their
slot is freed (score -> -inf) so the live beam keeps exploring
unfinished prefixes, exactly like the reference's removal of ended hyps
from the running batch. n-best is selected from the store, so a
finished hypothesis can never be evicted by transient unfinished
scores. Every step is pure batched math:

    score_step (KV-cache decoder)  ->  pre-beam top-W  ->
    CTC prefix DP (lax.scan over T) ->  flattened (beam*W) top-k  ->
    gather-based state reindexing

The token loop is a `lax.while_loop` with an all-finished early exit, so
an entire batch of utterances decodes in one device program — the #1
perf target identified in SURVEY.md §3 (the reference's beam loop is
Python-orchestrated and drops CTC posteriors to CPU numpy).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.decode import ctc_prefix
from espnet_tpu.decode.ctc_prefix import (CTCPrefixState, init_state,
                                          pad_log_posteriors,
                                          score_candidates, select_state)

NEG_INF = -1e10


@dataclasses.dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 10
    ctc_weight: float = 0.5
    lm_weight: float = 0.0
    ngram_weight: float = 0.0
    length_bonus: float = 0.0
    maxlenratio: float = 0.0
    minlenratio: float = 0.0
    nbest: int = 1
    pre_beam_ratio: float = 1.5
    blank_id: int = 0
    normalize_length: bool = False
    hyp_primer: tuple = ()  # forced prefix tokens (Whisper/OWSM lang/task
    # conditioning — beam_search.py:123 set_hyp_primer contract; primer
    # tokens are forced WITHOUT adding their model score, matching the
    # reference which seeds yseq before scoring starts)
    end_detect: bool = True  # e2e_asr_common.py end_detect() heuristic,
    # active only when maxlenratio == 0 (beam_search.py:443)
    end_detect_m: int = 3
    end_detect_d: float = -10.0


class BeamState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    yseq: jnp.ndarray          # (rows, Lmax) int32
    lengths: jnp.ndarray       # (rows,) tokens emitted (excl sos)
    scores: jnp.ndarray        # (rows,) accumulated weighted score
    finished: jnp.ndarray      # (rows,) bool — dead slot (hyp moved to store)
    dec_state: dict            # decoder KV caches etc.
    ctc_state: Optional[CTCPrefixState]
    lm_state: Optional[dict]
    ng_state: Optional[jnp.ndarray]
    store_yseq: jnp.ndarray    # (B, S, Lmax) ended-hyp store
    store_len: jnp.ndarray     # (B, S)
    store_score: jnp.ndarray   # (B, S) raw scores, NEG_INF = empty
    ended_at_len: jnp.ndarray  # (B, Lmax) best ended score by emitted length
    done: jnp.ndarray          # (B,) utterance fully decoded


def _expand_rows(x, beam):
    """(B, ...) -> (B*beam, ...) repeating each batch entry."""
    return jnp.repeat(x, beam, axis=0)


_JIT_CACHE: dict = {}


def _jitted_search(model, config, maxlen, lm, ngram=None):
    """Cache the compiled search per (model, config, maxlen, lm, ngram):
    a fresh jax.jit(partial(...)) per call would re-trace every batch."""
    key = (id(model), config, maxlen, id(lm), id(ngram))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        inner = jax.jit(functools.partial(
            _beam_search_device, model=model, config=config, maxlen=maxlen,
            lm=lm, ngram=ngram))

        def fn(params, enc, enc_lens, lm_params, ngram_params=None):
            return inner(params, enc, enc_lens, lm_params, ngram_params)

        _JIT_CACHE[key] = fn
    return fn


def batch_beam_search(model, params, enc, enc_lens,
                      config: BeamSearchConfig, lm=None, lm_params=None,
                      ngram=None, ngram_params=None):
    """Decode a batch. enc: (B, T, D); returns per-utterance n-best
    [(token_ids, score), ...] on host."""
    B, Tenc, D = enc.shape
    beam = config.beam_size
    maxlen = int(config.maxlenratio * Tenc) if config.maxlenratio > 0 \
        else Tenc
    maxlen = max(min(maxlen, Tenc), 2)
    yseq, lengths, scores, _steps = _jitted_search(
        model, config, maxlen, lm, ngram)(
        params, enc, enc_lens, lm_params, ngram_params)
    yseq = np.asarray(yseq)
    lengths = np.asarray(lengths)
    scores = np.asarray(scores)
    results = []
    for b in range(B):
        hyps = []
        for k in range(beam):
            r = b * beam + k
            if scores[r] <= NEG_INF / 2:
                continue
            ids = yseq[r, 1:1 + lengths[r]].tolist()  # strip sos
            # strip trailing eos for the text output
            if ids and ids[-1] == model.eos_id:
                ids = ids[:-1]
            hyps.append((ids, float(scores[r])))
        hyps.sort(key=lambda h: -h[1])
        results.append(hyps[:config.nbest])
    return results


def select_decoder_state(state, idx):
    """Reorder a decoder decode-state by new-beam source rows.

    Dispatches on the state's own keys so each decoder moves only its
    MUTABLE leaves — immutable per-utterance tensors (cross-attn K/V,
    projected memory) live at utterance resolution inside the state and
    are exempt (beam reordering never crosses an utterance's beam
    block, so gathering them is an expensive identity: it tripled the
    search loop's HBM traffic before this split)."""
    if isinstance(state, dict):
        if "cache_k" in state:
            from espnet_tpu.nn.decoder import TransformerDecoder
            return TransformerDecoder.select_state(state, idx)
        if "ssm" in state:
            from espnet_tpu.nn.s4_decoder import S4Decoder
            return S4Decoder.select_state(state, idx)
        if "att_w" in state:
            from espnet_tpu.nn.rnn_decoder import RNNDecoder
            return RNNDecoder.select_state(state, idx)
    # unknown decoder family: batch-first axis-0 gather of every leaf
    return jax.tree_util.tree_map(lambda t: t[idx], state)


def _beam_search_device(params, enc, enc_lens, lm_params,
                        ngram_params=None, *, model, config, maxlen, lm,
                        ngram=None):
    B, Tenc, D = enc.shape
    beam = config.beam_size
    V = model.vocab_size
    rows = B * beam
    sos, eos = model.sos_id, model.eos_id
    use_ctc = config.ctc_weight > 0.0
    att_w = 1.0 - config.ctc_weight
    W = min(max(int(config.pre_beam_ratio * beam), beam), V) if use_ctc else V

    enc_rows = _expand_rows(enc, beam)
    enc_lens_rows = _expand_rows(enc_lens, beam)
    minlens = jnp.maximum(
        (config.minlenratio * enc_lens_rows).astype(jnp.int32), 0)
    maxlens = jnp.minimum(
        jnp.where(config.maxlenratio > 0,
                  (config.maxlenratio * enc_lens_rows).astype(jnp.int32),
                  enc_lens_rows),
        maxlen).astype(jnp.int32)
    maxlens = jnp.maximum(maxlens, 1)

    # memory goes in at UTTERANCE resolution (B): decoders keep immutable
    # cross-attention K/V at B and fold the beam into the query, so the
    # decode state stays small and the per-step reorder only moves the
    # mutable caches (nn/decoder.py init_state/select_state)
    dec_state = model.apply(
        params, enc, enc_lens, rows, maxlen + 1,
        method=model.decoder_init_state)
    if use_ctc:
        ctc_logp = jax.nn.log_softmax(
            model.apply(params, enc, method=model.ctc_logits), axis=-1)
        ctc_logp = pad_log_posteriors(ctc_logp, enc_lens, config.blank_id)
        ctc_logp_rows = _expand_rows(ctc_logp, beam)
        ctc_state = init_state(ctc_logp_rows, config.blank_id)
    else:
        ctc_state = None
    lm_state = (lm.apply(lm_params, rows, maxlen + 1,
                         method=lm.init_carry) if lm is not None else None)
    ng_state0 = (ngram.apply(ngram_params, rows, maxlen + 1,
                             method=ngram.init_carry)
                 if ngram is not None else None)

    Lmax = maxlen + 2
    yseq = jnp.full((rows, Lmax), eos, jnp.int32)
    yseq = yseq.at[:, 0].set(sos)
    # only slot 0 of each utterance is live initially
    init_scores = jnp.where(jnp.arange(rows) % beam == 0, 0.0, NEG_INF)
    use_end_detect = bool(config.end_detect) and config.maxlenratio == 0.0
    M = int(config.end_detect_m)
    state = BeamState(
        step=jnp.asarray(0, jnp.int32),
        yseq=yseq,
        lengths=jnp.zeros((rows,), jnp.int32),
        scores=init_scores,
        finished=jnp.zeros((rows,), bool),
        dec_state=dec_state,
        ctc_state=ctc_state,
        lm_state=lm_state,
        ng_state=ng_state0,
        store_yseq=jnp.full((B, beam, Lmax), eos, jnp.int32),
        store_len=jnp.zeros((B, beam), jnp.int32),
        store_score=jnp.full((B, beam), NEG_INF, jnp.float32),
        ended_at_len=jnp.full((B, Lmax), NEG_INF, jnp.float32),
        done=jnp.zeros((B,), bool))

    def cond(st: BeamState):
        return (st.step < maxlen) & ~jnp.all(st.done)

    def body(st: BeamState):
        step = st.step
        last = jnp.where(st.step == 0, jnp.full((rows,), sos, jnp.int32),
                         st.yseq[:, st.step])
        att_logp, dec_state_new = model.apply(
            params, last, step, st.dec_state,
            method=model.decoder_score_step)  # (rows, V)
        weighted = att_w * att_logp
        if lm is not None:
            lm_logp, lm_state_new = lm.apply(
                lm_params, last, step, st.lm_state, method=lm.score_step)
            weighted = weighted + config.lm_weight * lm_logp
        else:
            lm_state_new = st.lm_state
        if ngram is not None:
            ng_logp, ng_state_new = ngram.apply(
                ngram_params, last, step, st.ng_state,
                method=ngram.score_step)
            weighted = weighted + config.ngram_weight * ng_logp
        else:
            ng_state_new = st.ng_state
        # eos constraint: not before minlen; forced at per-utt maxlen
        pos = st.lengths
        allow_eos = pos >= minlens
        force_eos = (step + 1) >= maxlens
        eos_col = jnp.arange(V)[None, :] == eos
        weighted = jnp.where(eos_col & ~allow_eos[:, None], NEG_INF, weighted)
        weighted = jnp.where((~eos_col) & force_eos[:, None], NEG_INF,
                             weighted)
        in_primer = jnp.asarray(False)
        if config.hyp_primer:
            # force primer tokens WITHOUT scoring them: the reference seeds
            # yseq with the primer before search starts (beam_search.py:123)
            # so the primer contributes nothing to the hypothesis score.
            primer = jnp.asarray(config.hyp_primer, jnp.int32)
            in_primer = step < len(config.hyp_primer)
            forced = primer[jnp.minimum(step, len(config.hyp_primer) - 1)]
            col = jnp.arange(V)[None, :] == forced
            weighted = jnp.where(in_primer, jnp.where(col, 0.0, NEG_INF),
                                 weighted)

        bonus = jnp.where(in_primer, 0.0, config.length_bonus)
        if use_ctc:
            # pre-beam pruning by the weighted full score
            pre_scores, cand_ids = jax.lax.top_k(weighted, W)
            local, log_psi, r_nb_new, r_b_new = score_candidates(
                st.ctc_state, cand_ids, ctc_logp_rows, enc_lens_rows,
                config.blank_id, eos)
            ctc_w = jnp.where(in_primer, 0.0, config.ctc_weight)
            cand_scores = (st.scores[:, None] + pre_scores
                           + ctc_w * local + bonus)
        else:
            cand_ids = jnp.broadcast_to(jnp.arange(V)[None, :], (rows, V))
            cand_scores = (st.scores[:, None] + weighted + bonus)
            log_psi = r_nb_new = r_b_new = None

        # dead slots (hyp already in store) and done utterances offer nothing
        dead = st.finished | st.done[jnp.arange(rows) // beam]
        cand_scores = jnp.where(dead[:, None], NEG_INF, cand_scores)
        cand_tok = cand_ids

        # per-utterance top-k over (beam * W)
        Wc = cand_ids.shape[1]
        flat = cand_scores.reshape(B, beam * Wc)
        top_scores, top_idx = jax.lax.top_k(flat, beam)  # (B, beam)
        src_beam = top_idx // Wc
        cand_col = top_idx % Wc
        src_row = (src_beam
                   + (jnp.arange(B) * beam)[:, None]).reshape(-1)  # (rows,)
        cand_col = cand_col.reshape(-1)
        new_scores = top_scores.reshape(-1)
        new_tok = cand_tok[src_row, cand_col]
        was_dead = dead[src_row]

        # append token
        yseq = st.yseq[src_row]
        write_pos = jnp.where(was_dead, 0, step + 1)
        yseq = jax.vmap(
            lambda seq, p, t, keep: seq.at[p].set(
                jnp.where(keep, seq[p], t)))(yseq, write_pos, new_tok,
                                             was_dead)
        lengths = st.lengths[src_row] + jnp.where(was_dead, 0, 1)

        # hyps that emitted eos move to the per-utterance ended store
        # (batch_beam_search.py:359-423 post_process) and free their slot
        newly_fin = (new_tok == eos) & ~was_dead & (new_scores > NEG_INF / 2)
        fin_scores = jnp.where(newly_fin, new_scores, NEG_INF).reshape(B, beam)
        merged_scores = jnp.concatenate([st.store_score, fin_scores], axis=1)
        merged_yseq = jnp.concatenate(
            [st.store_yseq, yseq.reshape(B, beam, Lmax)], axis=1)
        merged_len = jnp.concatenate(
            [st.store_len, lengths.reshape(B, beam)], axis=1)
        keep_scores, keep_idx = jax.lax.top_k(merged_scores, beam)
        store_yseq = jnp.take_along_axis(merged_yseq, keep_idx[:, :, None],
                                         axis=1)
        store_len = jnp.take_along_axis(merged_len, keep_idx, axis=1)
        store_score = keep_scores

        # end_detect bookkeeping: best ended score per emitted length
        fin_len = jnp.where(newly_fin, lengths, 0).reshape(B, beam)
        ended_at_len = jax.vmap(lambda e, idx, s: e.at[idx].max(s))(
            st.ended_at_len, fin_len, fin_scores)

        finished = was_dead | (new_tok == eos)
        live_scores = jnp.where(finished, NEG_INF, new_scores)

        no_live = jnp.all(
            live_scores.reshape(B, beam) <= NEG_INF / 2, axis=1)
        done = st.done | no_live
        if use_end_detect:
            # e2e_asr_common.end_detect: stop when the best hyps ended at
            # each of the last M lengths all score D below the global best
            best_ended = jnp.max(store_score, axis=1)  # (B,)
            count = jnp.zeros((B,), jnp.int32)
            for m in range(M):
                li = jnp.clip(step + 1 - m, 0, Lmax - 1)
                at_l = ended_at_len[:, li]
                hit = (at_l > NEG_INF / 2) & \
                    (at_l - best_ended < config.end_detect_d) & \
                    (step + 1 - m >= 1)
                count = count + hit.astype(jnp.int32)
            done = done | (count == M)

        dec_state = select_decoder_state(dec_state_new, src_row)
        if use_ctc:
            ctc_state = select_state(st.ctc_state, r_nb_new, r_b_new,
                                     log_psi, src_row, cand_col, new_tok)
        else:
            ctc_state = st.ctc_state
        if lm is not None:
            # all LM states are batch-first pytrees -> uniform axis-0 gather
            lm_state = jax.tree_util.tree_map(lambda t: t[src_row],
                                              lm_state_new)
        else:
            lm_state = st.lm_state
        ng_state = (ng_state_new[src_row] if ngram is not None
                    else st.ng_state)
        return BeamState(step=step + 1, yseq=yseq, lengths=lengths,
                         scores=live_scores, finished=finished,
                         dec_state=dec_state, ctc_state=ctc_state,
                         lm_state=lm_state, ng_state=ng_state,
                         store_yseq=store_yseq,
                         store_len=store_len, store_score=store_score,
                         ended_at_len=ended_at_len, done=done)

    final = jax.lax.while_loop(cond, body, state)
    # safety flush: any still-live rows at loop exit get eos appended and
    # compete for the store (reference: "adding <eos> in the last position")
    live = ~final.finished & (final.scores > NEG_INF / 2)
    flush_yseq = jax.vmap(lambda seq, p: seq.at[p].set(eos))(
        final.yseq, jnp.minimum(final.lengths + 1, Lmax - 1))
    flush_len = jnp.minimum(final.lengths + 1, Lmax - 1)
    flush_scores = jnp.where(live, final.scores, NEG_INF).reshape(B, beam)
    merged_scores = jnp.concatenate([final.store_score, flush_scores], axis=1)
    merged_yseq = jnp.concatenate(
        [final.store_yseq, flush_yseq.reshape(B, beam, Lmax)], axis=1)
    merged_len = jnp.concatenate(
        [final.store_len, flush_len.reshape(B, beam)], axis=1)
    scores_out, keep_idx = jax.lax.top_k(merged_scores, beam)
    yseq_out = jnp.take_along_axis(merged_yseq, keep_idx[:, :, None], axis=1)
    len_out = jnp.take_along_axis(merged_len, keep_idx, axis=1)
    if config.normalize_length:
        norm = scores_out / jnp.maximum(len_out, 1)
        scores_out = jnp.where(scores_out > NEG_INF / 2, norm, scores_out)
    return (yseq_out.reshape(rows, Lmax), len_out.reshape(rows),
            scores_out.reshape(rows), final.step)
