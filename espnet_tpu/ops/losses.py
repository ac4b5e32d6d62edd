"""Shared loss functions: CTC, label smoothing, accuracy.

Behavioral contracts:
- CTC: espnet2/asr/ctc.py:9-71 (builtin type, reduce mean over batch,
  zero-infinity). Implemented via optax.ctc_loss (XLA-native lattice DP).
- LabelSmoothingLoss: espnet2/legacy/nets/pytorch_backend/transformer/
  label_smoothing_loss.py (KL to smoothed target, ignore padding,
  normalize by #non-pad when length-normalized).
- th_accuracy: espnet2/legacy/nets/pytorch_backend/nets_utils.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask


def _ctc_expand(labels: jnp.ndarray, label_lens: jnp.ndarray,
                blank_id: int):
    """(B, U) labels -> (B, S=2U+1) blank-interleaved state sequence plus
    per-state validity and 'can skip from s-2' masks."""
    B, U = labels.shape
    S = 2 * U + 1
    s = jnp.arange(S)
    is_lab = (s % 2) == 1
    lab_idx = jnp.minimum(s // 2, U - 1)
    z = jnp.where(is_lab[None, :], labels[:, lab_idx], blank_id)  # (B, S)
    valid = s[None, :] < (2 * label_lens[:, None] + 1)
    # skip transition s-2 -> s allowed when z_s is a label and differs
    # from z_{s-2}
    z_m2 = jnp.concatenate([jnp.full((B, 2), -1, z.dtype), z[:, :-2]], 1)
    can_skip = is_lab[None, :] & (z != z_m2)
    return z, valid, can_skip


_NEG = -1e30


def _ctc_fwd_scan(lp_z, valid, can_skip, logit_lens):
    """Alpha recursion over time. lp_z: (T, B, S) state log-emissions.
    Returns (alpha_stack (T, B, S), per-seq nll (B,))."""
    T, B, S = lp_z.shape
    init = jnp.full((B, S), _NEG).at[:, :2].set(0.0) + lp_z[0]
    init = jnp.where(valid, init, _NEG)

    def shift(a, k):
        return jnp.concatenate([jnp.full((B, k), _NEG), a[:, :-k]], 1)

    def body(alpha, inp):
        lp_t, t = inp
        prev = jnp.logaddexp(alpha, shift(alpha, 1))
        prev = jnp.logaddexp(prev, jnp.where(can_skip, shift(alpha, 2),
                                             _NEG))
        new = jnp.where(valid, prev + lp_t, _NEG)
        # frames at/after logit_len don't emit: carry alpha unchanged
        new = jnp.where((t < logit_lens)[:, None], new, alpha)
        return new, new

    # unroll: the DP body is tiny (B x S elementwise), so the scan cost
    # is sequential-iteration overhead, not FLOPs — unrolling 8 steps
    # per loop iteration cuts that overhead ~8x
    _, tail = jax.lax.scan(body, init,
                           (lp_z[1:], jnp.arange(1, T)), unroll=8)
    alpha_stack = jnp.concatenate([init[None], tail], 0)
    final = alpha_stack[-1]                              # (B, S)
    send = jnp.sum(valid.astype(jnp.int32), 1) - 1       # = 2*label_len
    a_end = jnp.take_along_axis(final, send[:, None], 1)[:, 0]
    a_pen = jnp.where(send >= 1, jnp.take_along_axis(
        final, jnp.maximum(send - 1, 0)[:, None], 1)[:, 0], _NEG)
    nll = -jnp.logaddexp(a_end, a_pen)
    return alpha_stack, nll


@jax.custom_vjp
def ctc_nll(logits: jnp.ndarray, logit_lens: jnp.ndarray,
            labels: jnp.ndarray, label_lens: jnp.ndarray,
            blank_id: int):
    """Per-sequence CTC negative log likelihood, (B,).

    Forward-backward custom VJP: the gradient is the analytic
    softmax-minus-posterior form, so the backward pass is one beta scan
    plus fused elementwise work instead of autodiff replaying the alpha
    scan with stored residuals (the optax.ctc_loss path that made CTC
    ~20% of the flagship train step; see docs/DIAG_BWD.json).
    """
    out, _ = _ctc_fwd(logits, logit_lens, labels, label_lens, blank_id)
    return out


def _state_logprobs(logits, labels, label_lens, blank_id):
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    z, valid, can_skip = _ctc_expand(labels, label_lens, blank_id)
    # (B, T, S) gather of each state's emission logprob, time-major
    lp_z = jnp.take_along_axis(
        lp, z[:, None, :].astype(jnp.int32), axis=2)
    return lp, jnp.transpose(lp_z, (1, 0, 2)), z, valid, can_skip


def _ctc_fwd(logits, logit_lens, labels, label_lens, blank_id):
    _, lp_z, z, valid, can_skip = _state_logprobs(
        logits, labels, label_lens, blank_id)
    alpha_stack, nll = _ctc_fwd_scan(lp_z, valid, can_skip, logit_lens)
    res = (logits, logit_lens, labels, label_lens, blank_id,
           alpha_stack, nll)
    return nll, res


def _ctc_bwd(res, g):
    (logits, logit_lens, labels, label_lens, blank_id,
     alpha_stack, nll) = res
    B, T, V = logits.shape
    sm, lp_z, z, valid, can_skip = _state_logprobs(
        logits, labels, label_lens, blank_id)
    sm = jnp.exp(sm)
    S = lp_z.shape[-1]
    send = jnp.sum(valid.astype(jnp.int32), 1) - 1
    s_idx = jnp.arange(S)[None, :]
    terminal = jnp.where((s_idx == send[:, None]) |
                         (s_idx == jnp.maximum(send - 1, 0)[:, None]),
                         0.0, _NEG)                      # (B, S)

    def unshift(b, k):
        return jnp.concatenate([b[:, k:], jnp.full((B, k), _NEG)], 1)

    def body(beta_next, inp):
        lp_next, t = inp          # lp at time t+1; computing beta_t
        term = beta_next + lp_next
        # arcs s->s, s->s+1 always; s->s+2 exists iff can_skip[s+2]
        skip_term = jnp.where(can_skip, term, _NEG)
        nxt = jnp.logaddexp(jnp.logaddexp(term, unshift(term, 1)),
                            unshift(skip_term, 2))
        beta = jnp.where(valid, nxt, _NEG)
        # for t >= logit_len - 1 the chain must already be terminal
        beta = jnp.where((t >= logit_lens - 1)[:, None], terminal, beta)
        return beta, beta

    beta_T = terminal
    _, betas = jax.lax.scan(
        body, beta_T, (lp_z[1:], jnp.arange(T - 1)), reverse=True,
        unroll=8)
    beta_stack = jnp.concatenate([betas, beta_T[None]], 0)  # (T, B, S)

    # state posteriors gamma_t(s) = alpha + beta + nll (both include
    # emission at t via alpha; beta here excludes t's emission)
    log_gamma = alpha_stack + beta_stack + nll[None, :, None]
    gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
    tmask = (jnp.arange(T)[:, None] < logit_lens[None, :])
    gamma = jnp.where(tmask[..., None] & valid[None], gamma, 0.0)
    # fold states back onto the vocab: (T, B, S) x (B, S, V) -> (B, T, V)
    onehot = jax.nn.one_hot(z, V, dtype=gamma.dtype)
    post = jnp.einsum("tbs,bsv->btv", gamma, onehot)
    dlp = sm * tmask.T[..., None] - post
    # impossible alignments saturate at ~|_NEG|, not inf: zero their grad
    safe = jnp.isfinite(nll) & (nll < 1e29)
    coeff = jnp.where(safe, g, 0.0)[:, None, None]
    dlogits = (coeff * dlp).astype(logits.dtype)
    return (dlogits, None, None, None, None)


ctc_nll.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss(logits: jnp.ndarray, logit_lens: jnp.ndarray,
             labels: jnp.ndarray, label_lens: jnp.ndarray,
             blank_id: int = 0) -> jnp.ndarray:
    """Mean-over-batch CTC negative log likelihood.

    logits: (B, T, V) unnormalized; labels: (B, U) with 0-padding.
    Contract: espnet2/asr/ctc.py:9-71 (builtin type, mean over batch,
    zero-infinity). Forward-backward DP with an analytic-gradient
    custom VJP (value parity with optax.ctc_loss, tested).
    """
    per_seq = ctc_nll(logits.astype(jnp.float32), logit_lens, labels,
                      label_lens, blank_id)
    # zero_infinity semantics: invalid alignments (U > T) contribute 0
    per_seq = jnp.where(jnp.isfinite(per_seq) & (per_seq < 0.5 * -_NEG),
                        per_seq, 0.0)
    return jnp.mean(per_seq)


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         smoothing: float = 0.1, padding_idx: int = -1,
                         normalize_length: bool = False) -> jnp.ndarray:
    """KL(smoothed one-hot || softmax(logits)) summed over tokens.

    logits: (B, L, V); targets: (B, L) int with padding_idx marking pad.
    Returns loss normalized by batch (default) or token count.
    """
    V = logits.shape[-1]
    valid = targets != padding_idx
    tgt = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    smooth_val = smoothing / (V - 1)
    # KL(t||p) = sum t log t - sum t log p ; constant term included to
    # match reference's kl_div semantics
    true_dist_logp_sum = (confidence * jnp.take_along_axis(
        logp, tgt[..., None], axis=-1)[..., 0]
        + smooth_val * (jnp.sum(logp, axis=-1)
                        - jnp.take_along_axis(logp, tgt[..., None],
                                              axis=-1)[..., 0]))
    ent = -(confidence * jnp.log(jnp.maximum(confidence, 1e-20))
            + (V - 1) * smooth_val * jnp.log(jnp.maximum(smooth_val, 1e-20)))
    kl = -true_dist_logp_sum - ent
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1) if normalize_length \
        else jnp.maximum(jnp.sum(jnp.any(valid, axis=-1)), 1)
    return jnp.sum(kl) / denom


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
             padding_idx: int = -1) -> jnp.ndarray:
    """Token accuracy over non-pad positions (th_accuracy equivalent)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != padding_idx
    correct = jnp.sum((pred == targets) & valid)
    return correct / jnp.maximum(jnp.sum(valid), 1)


def add_sos_eos(ys_pad: jnp.ndarray, ys_lens: jnp.ndarray, sos: int, eos: int,
                ignore_id: int = -1):
    """(B, U) 0-padded labels -> (ys_in (B, U+1) , ys_out (B, U+1)).

    ys_in = [sos, y...]; ys_out = [y..., eos] with ignore_id padding —
    mirrors espnet2/legacy/nets/pytorch_backend/nets_utils.py add_sos_eos.
    """
    B, U = ys_pad.shape
    valid = make_non_pad_mask(ys_lens, U)
    ys_in = jnp.concatenate(
        [jnp.full((B, 1), sos, ys_pad.dtype), jnp.where(valid, ys_pad, eos)],
        axis=1)
    # ys_out: y tokens then eos at position ys_lens, ignore elsewhere
    pos = jnp.arange(U + 1)[None, :]
    y_ext = jnp.concatenate([ys_pad, jnp.zeros((B, 1), ys_pad.dtype)], axis=1)
    ys_out = jnp.where(pos < ys_lens[:, None], y_ext,
                       jnp.where(pos == ys_lens[:, None], eos, ignore_id))
    return ys_in, ys_out
