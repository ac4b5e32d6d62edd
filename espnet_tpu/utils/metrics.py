"""Error-rate scoring (WER/CER) — pure-Python sclite replacement.

Behavioral contract: sclite scoring used in recipe stage 13
(egs2/TEMPLATE/asr1/asr.sh:1654) — Levenshtein alignment per utterance,
corpus-level rate = total edits / total ref tokens; also train-time
ErrorCalculator (espnet2/legacy/nets/e2e_asr_common.py).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple


def edit_distance(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int, int]:
    """Returns (substitutions, deletions, insertions, ref_len)."""
    n, m = len(ref), len(hyp)
    # DP over (cost, sub, del, ins)
    prev = [(j, 0, 0, j) for j in range(m + 1)]
    prev = [[j, 0, 0, j] for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [[i, 0, i, 0]] + [[0, 0, 0, 0] for _ in range(m)]
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                cand = [prev[j - 1][0], prev[j - 1][1], prev[j - 1][2],
                        prev[j - 1][3]]
            else:
                cand = [prev[j - 1][0] + 1, prev[j - 1][1] + 1,
                        prev[j - 1][2], prev[j - 1][3]]
            dele = [prev[j][0] + 1, prev[j][1], prev[j][2] + 1, prev[j][3]]
            ins = [cur[j - 1][0] + 1, cur[j - 1][1], cur[j - 1][2],
                   cur[j - 1][3] + 1]
            cur[j] = min(cand, dele, ins, key=lambda x: x[0])
        prev = cur
    _, s, d, ins = prev[m]
    return s, d, ins, n


def error_rate(refs: Iterable[Sequence], hyps: Iterable[Sequence]) -> Dict:
    """Corpus-level error rate over aligned (ref, hyp) pairs."""
    S = D = I = N = 0
    n_utt = n_err_utt = 0
    for ref, hyp in zip(refs, hyps):
        s, d, i, n = edit_distance(ref, hyp)
        S += s
        D += d
        I += i
        N += n
        n_utt += 1
        if s + d + i > 0:
            n_err_utt += 1
    rate = (S + D + I) / max(N, 1)
    return {"err_rate": rate, "sub": S, "del": D, "ins": I, "ref_len": N,
            "n_utt": n_utt, "sent_err_rate": n_err_utt / max(n_utt, 1)}


def wer(ref_texts: Iterable[str], hyp_texts: Iterable[str]) -> float:
    return error_rate([r.split() for r in ref_texts],
                      [h.split() for h in hyp_texts])["err_rate"]


def cer(ref_texts: Iterable[str], hyp_texts: Iterable[str]) -> float:
    return error_rate([list(r.replace(" ", "")) for r in ref_texts],
                      [list(h.replace(" ", "")) for h in hyp_texts])["err_rate"]


def bleu(ref_texts: Iterable[str], hyp_texts: Iterable[str],
         max_n: int = 4) -> Dict:
    """Corpus BLEU-4 with exponential smoothing on zero n-gram counts —
    the sacrebleu `exp` default used by the reference's ST scoring
    (egs2/TEMPLATE/st1/st.sh stage: sacrebleu). Tokenization is
    whitespace (the recipes score detokenized-then-split text)."""
    import math
    from collections import Counter

    def ngrams(toks: List[str], n: int) -> Counter:
        return Counter(tuple(toks[i:i + n])
                       for i in range(len(toks) - n + 1))

    match = [0] * max_n
    total = [0] * max_n
    hyp_len = ref_len = 0
    for ref, hyp in zip(ref_texts, hyp_texts):
        r, h = ref.split(), hyp.split()
        hyp_len += len(h)
        ref_len += len(r)
        for n in range(1, max_n + 1):
            hc, rc = ngrams(h, n), ngrams(r, n)
            match[n - 1] += sum(min(c, rc[g]) for g, c in hc.items())
            total[n - 1] += max(len(h) - n + 1, 0)
    smooth = 1.0
    log_p = 0.0
    for n in range(max_n):
        if total[n] == 0:
            return {"bleu": 0.0, "precisions": [0.0] * max_n,
                    "bp": 0.0, "hyp_len": hyp_len, "ref_len": ref_len}
        if match[n] == 0:
            smooth *= 2.0
            p = 1.0 / (smooth * total[n])
        else:
            p = match[n] / total[n]
        log_p += math.log(p) / max_n
    bp = 1.0 if hyp_len > ref_len else math.exp(
        1.0 - ref_len / max(hyp_len, 1))
    score = bp * math.exp(log_p)
    return {"bleu": 100.0 * score,
            "precisions": [m / t if t else 0.0
                           for m, t in zip(match, total)],
            "bp": bp, "hyp_len": hyp_len, "ref_len": ref_len}
