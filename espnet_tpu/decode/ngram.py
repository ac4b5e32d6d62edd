"""ARPA back-off n-gram LM scorer, fully on device.

Behavioral contract: espnet2/legacy/nets/scorers/ngram.py
(NgramFullScorer: per-step log p(w|history) over the FULL vocabulary,
fused into beam search with weight --ngram_weight). The reference binds
KenLM (external C++); this environment has no kenlm, and a CPU
per-step callout would stall the on-device while_loop anyway.

TPU-first design: the ARPA file is parsed host-side into, per order k,
a SORTED int64 key array (context+word packed base-V) with parallel
log-prob / back-off arrays. Scoring all V candidates for every beam row
is then the textbook back-off recursion evaluated bottom-up with
vectorized `jnp.searchsorted` lookups:

    p_1(w)        = unigram[w]            (dense table, <unk> fallback)
    p_k(w|h)      = hit_k ? logp_k(h,w) : bo_{k-1}(h) + p_{k-1}(w|h')

The scorer state is just the last (N-1) tokens per row — a plain int32
array, so beam-search gather reindexing works with tree_map like any
other scorer state. Requires vocab_size**max_order < 2**63 (true for
char/BPE vocabs up to ~50k at order 4).

ARPA notes: `<s>` / `</s>` both map to the framework's single
sos/eos id — `<s>` only ever appears sentence-initial in contexts and
`</s>` only as a predicted final word, so the shared id cannot collide.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e10
_LOG10 = math.log(10.0)


def read_arpa(path, token_list: List[str], sos_eos_id: Optional[int] = None
              ) -> Dict:
    """Parse an ARPA file into packed numpy tables.

    Words are mapped through `token_list`; n-grams containing OOV words
    are dropped (they can never be queried). Returns a dict of device-
    ready arrays (see NgramScorer).
    """
    tok2id = {t: i for i, t in enumerate(token_list)}
    if sos_eos_id is None:
        for cand in ("<sos/eos>", "<eos>", "<s>"):
            if cand in tok2id:
                sos_eos_id = tok2id[cand]
                break
        if sos_eos_id is None:
            sos_eos_id = len(token_list) - 1
    V = len(token_list)

    def wid(w: str) -> Optional[int]:
        if w in ("<s>", "</s>"):
            return sos_eos_id
        return tok2id.get(w)

    orders: Dict[int, List[Tuple[Tuple[int, ...], float, float]]] = {}
    max_order = 0
    section = 0
    unk_logp = -7.0 * _LOG10  # fallback if no <unk> entry
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("\\data\\"):
                continue
            if line.startswith("\\") and line.endswith("-grams:"):
                section = int(line[1:].split("-")[0])
                max_order = max(max_order, section)
                orders.setdefault(section, [])
                continue
            if line.startswith("\\end\\"):
                break
            if section == 0:
                continue
            parts = line.split()
            if len(parts) < section + 1:
                continue
            logp = float(parts[0]) * _LOG10  # ARPA is log10 -> ln
            words = parts[1:1 + section]
            bo = (float(parts[section + 1]) * _LOG10
                  if len(parts) > section + 1 else 0.0)
            if section == 1 and words[0] == "<unk>":
                unk_logp = logp
            ids = tuple(wid(w) for w in words)
            if any(i is None for i in ids):
                continue
            orders[section].append((ids, logp, bo))

    if max_order < 1:
        raise ValueError(f"no n-gram sections found in {path}")
    if V ** max_order >= 2 ** 63:
        raise ValueError(
            f"vocab {V} too large for base-V packing at order {max_order}")

    # dense unigram table
    uni = np.full((V,), unk_logp, np.float32)
    uni_bo = np.zeros((V,), np.float32)
    for ids, logp, bo in orders.get(1, []):
        uni[ids[0]] = logp
        uni_bo[ids[0]] = bo
    tables = {"order": max_order, "vocab": V, "unigram": uni,
              "unigram_bo": uni_bo, "sos_eos": int(sos_eos_id)}

    def pack(ids: Tuple[int, ...]) -> int:
        key = 0
        for i in ids:
            key = key * V + int(i)
        return key

    for k in range(2, max_order + 1):
        ent = orders.get(k, [])
        keys = np.asarray([pack(ids) for ids, _, _ in ent], np.int64)
        logps = np.asarray([lp for _, lp, _ in ent], np.float32)
        bos = np.asarray([bo for _, _, bo in ent], np.float32)
        srt = np.argsort(keys, kind="stable")
        tables[f"keys{k}"] = keys[srt]
        tables[f"logp{k}"] = logps[srt]
        tables[f"bo{k}"] = bos[srt]
    return tables


def _lookup(keys: jnp.ndarray, vals: jnp.ndarray, query: jnp.ndarray,
            default: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized sorted-array lookup: (values, hit_mask)."""
    if keys.shape[0] == 0:
        return (jnp.full(query.shape, default, vals.dtype),
                jnp.zeros(query.shape, bool))
    idx = jnp.searchsorted(keys, query)
    idx = jnp.clip(idx, 0, keys.shape[0] - 1)
    hit = keys[idx] == query
    return jnp.where(hit, vals[idx], default), hit


class NgramScorer:
    """Full-vocabulary back-off scorer. Use with beam search via the
    same duck-typed `apply(params, ..., method=...)` protocol as the
    neural LM scorers (params = device tables from read_arpa)."""

    def __init__(self, tables: Dict):
        self.order = int(tables["order"])
        self.vocab = int(tables["vocab"])
        self.sos_eos = int(tables["sos_eos"])

    @staticmethod
    def from_file(path, token_list: List[str]) -> Tuple["NgramScorer", Dict]:
        tables = read_arpa(path, token_list)
        # JAX runs with x64 disabled: the packed keys must fit int32 on
        # device (char/small-BPE vocabs at order<=4). Larger vocab*order
        # products fall back to host n-best rescoring (rescore_nbest).
        V, N = tables["vocab"], tables["order"]
        if V ** N >= 2 ** 31:
            raise ValueError(
                f"vocab {V} at order {N} exceeds int32 packing; use "
                "rescore_nbest() host rescoring instead of in-loop fusion")
        dev = {k: (jnp.asarray(v.astype(np.int32)
                               if v.dtype == np.int64 else v)
                   if isinstance(v, np.ndarray) else v)
               for k, v in tables.items()}
        return NgramScorer(tables), dev

    # -- duck-typed flax-module-like interface -------------------------
    def apply(self, params, *args, method=None):
        # method arrives as a bound method (beam search passes
        # e.g. ngram.score_step), mirroring flax's apply(method=...)
        return method(params, *args)

    def init_carry(self, params, rows: int, maxlen: int = 0):
        """Context = last (order-1) tokens, seeded with sos (<s>)."""
        n_ctx = max(self.order - 1, 1)
        return jnp.full((rows, n_ctx), self.sos_eos, jnp.int32)

    def score_step(self, params, last: jnp.ndarray, step: jnp.ndarray,
                   ctx: jnp.ndarray):
        """last: (rows,) token just emitted (sos at step 0).
        Returns (logp (rows, V), new_ctx). The context already contains
        sos from init_carry, so `last` at step 0 is redundant and the
        shift below keeps semantics right for step>=1."""
        rows = ctx.shape[0]
        V = self.vocab
        new_ctx = jnp.where(
            step == 0, ctx,
            jnp.concatenate([ctx[:, 1:], last[:, None].astype(jnp.int32)],
                            axis=1))
        # bottom-up back-off evaluation over all V candidates
        p = jnp.broadcast_to(params["unigram"][None, :], (rows, V))
        kdt = params["keys2"].dtype if "keys2" in params else jnp.int32
        cand = jnp.arange(V, dtype=kdt)[None, :]
        for k in range(2, self.order + 1):
            hctx = new_ctx[:, -(k - 1):].astype(kdt)  # (rows, k-1)
            # pack context prefix
            ckey = jnp.zeros((rows,), kdt)
            for i in range(k - 1):
                ckey = ckey * V + hctx[:, i]
            qkeys = ckey[:, None] * V + cand  # (rows, V)
            logp_k, hit = _lookup(params[f"keys{k}"], params[f"logp{k}"],
                                  qkeys, 0.0)
            # back-off weight of the (k-1)-gram context
            if k == 2:
                bo = params["unigram_bo"][new_ctx[:, -1]]
            else:
                bkeys = jnp.zeros((rows,), kdt)
                for i in range(k - 1):
                    bkeys = bkeys * V + hctx[:, i]
                bo, _ = _lookup(params[f"keys{k - 1}"],
                                params[f"bo{k - 1}"], bkeys, 0.0)
            p = jnp.where(hit, logp_k, bo[:, None] + p)
        return p.astype(jnp.float32), new_ctx


def rescore_nbest(tables: Dict, nbest, weight: float):
    """Host n-best rescoring (NgramPartScorer-style use when the vocab
    is too large for in-loop fusion): nbest = [(ids, score), ...] ->
    re-sorted with score + weight * lm_logp."""
    out = [(ids, score + weight * score_sentence_host(tables, list(ids)))
           for ids, score in nbest]
    return sorted(out, key=lambda h: -h[1])


def score_sentence_host(tables: Dict, ids: List[int]) -> float:
    """Reference host-side scorer (numpy, literal back-off recursion) —
    used by tests to verify the device path. Scores
    p(ids[0] | <s>) * ... * p(</s> | ...)."""
    V = tables["vocab"]
    N = tables["order"]
    sos = tables["sos_eos"]
    seq = [sos] + list(ids) + [sos]

    def pack(t):
        key = 0
        for i in t:
            key = key * V + int(i)
        return key

    def find(k, key):
        keys = tables[f"keys{k}"]
        j = np.searchsorted(keys, key)
        if j < len(keys) and keys[j] == key:
            return j
        return None

    def prob(hist, w, k):
        """p_k(w | last k-1 of hist) with back-off to p_{k-1}."""
        if k == 1:
            return float(tables["unigram"][w])
        h = hist[len(hist) - (k - 1):]
        j = find(k, pack(h + [w]))
        if j is not None:
            return float(tables[f"logp{k}"][j])
        if k - 1 == 1:
            bo = float(tables["unigram_bo"][h[-1]])
        else:
            jj = find(k - 1, pack(h))
            bo = float(tables[f"bo{k - 1}"][jj]) if jj is not None else 0.0
        return bo + prob(hist, w, k - 1)

    total = 0.0
    for t in range(1, len(seq)):
        hist = seq[:t]
        total += prob(hist, seq[t], min(len(hist) + 1, N))
    return total
