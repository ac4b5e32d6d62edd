"""Time-synchronous (frame-synchronous) CTC prefix beam search with
attention rescoring — one lax.scan over frames.

Behavioral contract: espnet2/legacy/nets/beam_search_timesync.py
(frame-synchronous CTC prefix search maintaining per-prefix blank /
non-blank probabilities, pruned per frame, combined with attention
scores). The reference walks python dicts of prefixes per frame; here
the beam is a fixed block of slots advanced by a single `lax.scan`:

    per frame:  top-W token pruning  ->  candidate block
                (beam x (1 + W): stay | extend)  ->
                duplicate-prefix merge (sort by rolling hash +
                neighbor-segment logsumexp)  ->  top-k

Prefix identity uses two independent 32-bit rolling hashes (64 bits
joint), so cross-parent duplicate prefixes merge exactly like the
reference's dict update with collision probability ~2^-64 per pair.
Attention rescoring follows the reference's hybrid combination: the
final n-best CTC prefixes are batch-scored by the decoder in one
teacher-forcing pass (ESPnetASRModel.nll) and ranked by
ctc_weight * ctc + (1 - ctc_weight) * att.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e10
_H1_MUL = np.uint32(1000003)
_H2_MUL = np.uint32(2654435761)


def _lse(a, b):
    return jnp.logaddexp(a, b)


class TSState(NamedTuple):
    prefixes: jnp.ndarray   # (beam, Lmax) int32
    plen: jnp.ndarray       # (beam,)
    last: jnp.ndarray       # (beam,) last token, -1 for empty
    p_b: jnp.ndarray        # (beam,) log prob ending in blank
    p_nb: jnp.ndarray       # (beam,) log prob ending in non-blank
    h1: jnp.ndarray         # (beam,) uint32 rolling hash
    h2: jnp.ndarray         # (beam,) uint32 rolling hash


def _search_one(logp, T_true, *, beam, width, blank, Lmax):
    """logp: (T, V) log posteriors for ONE utterance."""
    V = logp.shape[-1]
    W = min(width, V)

    init = TSState(
        prefixes=jnp.zeros((beam, Lmax), jnp.int32),
        plen=jnp.zeros((beam,), jnp.int32),
        last=jnp.full((beam,), -1, jnp.int32),
        p_b=jnp.where(jnp.arange(beam) == 0, 0.0, NEG_INF),
        p_nb=jnp.full((beam,), NEG_INF),
        h1=jnp.zeros((beam,), jnp.uint32),
        h2=jnp.zeros((beam,), jnp.uint32))

    def frame(st: TSState, inp):
        t, lp = inp  # lp: (V,)
        top_lp, top_v = jax.lax.top_k(lp, W)

        # stay candidates (one per beam slot): emit blank, or repeat last
        safe_last = jnp.maximum(st.last, 0)
        rep_lp = jnp.where(st.last >= 0, lp[safe_last], NEG_INF)
        stay_pb = _lse(st.p_b, st.p_nb) + lp[blank]
        stay_pnb = st.p_nb + rep_lp

        # extend candidates: beam x W
        ext_v = jnp.broadcast_to(top_v[None, :], (beam, W))
        ext_lp = jnp.broadcast_to(top_lp[None, :], (beam, W))
        same = ext_v == st.last[:, None]
        base = jnp.where(same, st.p_b[:, None],
                         _lse(st.p_b, st.p_nb)[:, None])
        is_blank = ext_v == blank
        ext_pnb = jnp.where(is_blank, NEG_INF, base + ext_lp)
        ext_pb = jnp.full((beam, W), NEG_INF)

        # candidate block: (C,) with C = beam * (1 + W)
        cand_parent = jnp.concatenate(
            [jnp.arange(beam),
             jnp.repeat(jnp.arange(beam), W)]).astype(jnp.int32)
        cand_ext = jnp.concatenate(
            [jnp.full((beam,), -1, jnp.int32), ext_v.reshape(-1)])
        cand_pb = jnp.concatenate([stay_pb, ext_pb.reshape(-1)])
        cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
        # hashes (stay keeps parent hash; extend rolls token in)
        e_u = cand_ext.astype(jnp.uint32) + jnp.uint32(1)
        ph1, ph2 = st.h1[cand_parent], st.h2[cand_parent]
        cand_h1 = jnp.where(cand_ext >= 0, ph1 * _H1_MUL + e_u, ph1)
        cand_h2 = jnp.where(cand_ext >= 0, ph2 * _H2_MUL + e_u, ph2)
        # dead parents (empty slots) stay dead
        dead = (_lse(st.p_b, st.p_nb) <= NEG_INF / 2)[cand_parent]
        cand_pb = jnp.where(dead, NEG_INF, cand_pb)
        cand_pnb = jnp.where(dead, NEG_INF, cand_pnb)

        # duplicate-prefix merge: sort by (h1,h2), logsumexp equal runs
        # into the run head, kill the rest
        order = jnp.lexsort((cand_h2, cand_h1))
        s_pb, s_pnb = cand_pb[order], cand_pnb[order]
        s_h1, s_h2 = cand_h1[order], cand_h2[order]
        new_run = jnp.concatenate(
            [jnp.ones((1,), bool),
             (s_h1[1:] != s_h1[:-1]) | (s_h2[1:] != s_h2[:-1])])
        seg = jnp.cumsum(new_run) - 1  # group id per sorted candidate
        C = s_pb.shape[0]
        # segment logsumexp via max-shift + segment_sum
        def seg_lse(x):
            m = jax.ops.segment_max(x, seg, num_segments=C)
            xm = m[seg]
            e = jnp.where(x <= NEG_INF / 2, 0.0, jnp.exp(x - xm))
            ssum = jax.ops.segment_sum(e, seg, num_segments=C)
            out = m + jnp.log(jnp.maximum(ssum, 1e-38))
            return jnp.where(m <= NEG_INF / 2, NEG_INF, out)

        g_pb, g_pnb = seg_lse(s_pb), seg_lse(s_pnb)
        m_pb = jnp.where(new_run, g_pb[seg], NEG_INF)
        m_pnb = jnp.where(new_run, g_pnb[seg], NEG_INF)

        total = _lse(m_pb, m_pnb)
        top_tot, top_i = jax.lax.top_k(total, beam)
        sel = order[top_i]  # candidate indices in original order
        parent = cand_parent[sel]
        ext = cand_ext[sel]

        new_prefixes = st.prefixes[parent]
        wpos = jnp.minimum(st.plen[parent], Lmax - 1)
        new_prefixes = jax.vmap(
            lambda seq, p, tok, ok: jnp.where(
                ok, seq.at[p].set(tok), seq))(
            new_prefixes, wpos, jnp.maximum(ext, 0), ext >= 0)
        new_state = TSState(
            prefixes=new_prefixes,
            plen=st.plen[parent] + (ext >= 0).astype(jnp.int32),
            last=jnp.where(ext >= 0, ext, st.last[parent]),
            p_b=m_pb[top_i],
            p_nb=m_pnb[top_i],
            h1=cand_h1[sel],
            h2=cand_h2[sel])
        # past the true length: freeze
        live = t < T_true
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(live, n, o), new_state, st)
        return new_state, None

    T = logp.shape[0]
    final, _ = jax.lax.scan(frame, init,
                            (jnp.arange(T), logp))
    scores = _lse(final.p_b, final.p_nb)
    return final.prefixes, final.plen, scores


@functools.lru_cache(maxsize=32)
def _jitted(beam, width, blank, Lmax):
    fn = functools.partial(_search_one, beam=beam, width=width,
                           blank=blank, Lmax=Lmax)
    return jax.jit(jax.vmap(fn))


def ctc_prefix_beam_search(log_probs, lens, beam: int = 10,
                           width: int = 40, blank: int = 0
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched frame-sync CTC prefix beam search.

    log_probs: (B, T, V) log posteriors; lens: (B,).
    Returns (prefixes (B, beam, Lmax), lengths (B, beam),
    scores (B, beam)) sorted best-first.
    """
    B, T, V = log_probs.shape
    Lmax = T + 1
    pre, plen, scores = _jitted(beam, width, blank, Lmax)(
        jnp.asarray(log_probs), jnp.asarray(lens, jnp.int32))
    return np.asarray(pre), np.asarray(plen), np.asarray(scores)


class BeamSearchTimeSync:
    """Frame-synchronous hybrid decode: CTC prefix beam search + one
    batched attention-rescoring pass (beam_search_timesync.py
    weights={ctc, decoder} contract)."""

    def __init__(self, model, params, beam_size: int = 10,
                 ctc_weight: float = 0.5, pruning_width: int = 40):
        self.model = model
        self.params = params
        self.beam = beam_size
        self.ctc_weight = ctc_weight
        self.width = pruning_width
        self._ctc = jax.jit(lambda p, enc: jax.nn.log_softmax(
            model.apply(p, enc, method=model.ctc_logits), axis=-1))
        self._nll = jax.jit(lambda p, enc, el, ys, yl: model.apply(
            p, enc, el, ys, yl, method=model.nll))

    def __call__(self, enc, enc_lens, nbest: int = 1
                 ) -> List[List[Tuple[List[int], float]]]:
        logp = self._ctc(self.params, enc)
        pre, plen, ctc_scores = ctc_prefix_beam_search(
            logp, enc_lens, beam=self.beam, width=self.width,
            blank=self.model.blank_id)
        B, beam, Lmax = pre.shape
        results = []
        att_w = 1.0 - self.ctc_weight
        if att_w > 0.0 and self.model.decoder is not None:
            # one teacher-forcing pass over all (B*beam) prefixes
            ys = pre.reshape(B * beam, Lmax)
            yl = plen.reshape(B * beam)
            enc_rows = jnp.repeat(enc, beam, axis=0)
            el_rows = jnp.repeat(enc_lens, beam, axis=0)
            att_nll = np.asarray(self._nll(
                self.params, enc_rows, el_rows, jnp.asarray(ys),
                jnp.asarray(np.maximum(yl, 1), np.int32)))
            att = (-att_nll).reshape(B, beam)
        else:
            att = np.zeros((B, beam), np.float32)
        combined = self.ctc_weight * ctc_scores + att_w * att
        combined = np.where(ctc_scores <= NEG_INF / 2, NEG_INF, combined)
        for b in range(B):
            order = np.argsort(-combined[b])
            hyps = []
            for k in order[:nbest]:
                if combined[b, k] <= NEG_INF / 2:
                    continue
                ids = pre[b, k, :plen[b, k]].tolist()
                hyps.append((ids, float(combined[b, k])))
            results.append(hyps)
        return results
