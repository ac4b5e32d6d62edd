"""RNN-T (transducer) loss — native lattice DP.

Behavioral contract: the reference delegates to external CUDA kernels
(warp-transducer via tools/installers/install_warp-transducer.sh, and the
numba-CUDA multi-blank variant espnet2/asr/transducer/rnnt_multi_blank/)
— SURVEY.md §2.5 requires TPU-native equivalents.

Design: the alpha recursion runs as a `lax.scan` over anti-diagonals of
the (T, U) lattice — all cells of a diagonal are independent, so each
scan step is vectorized VPU work of width U+1 and the whole batch loss is
one fused XLA program. Gradients flow through the scan via XLA autodiff
(the scan transpose is itself a diagonal sweep, equivalent to the beta
recursion). A Pallas kernel variant can be layered in ops/pallas/ for
large-vocab fast paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def rnnt_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              logit_lens: jnp.ndarray, label_lens: jnp.ndarray,
              blank_id: int = 0, reduction: str = "mean") -> jnp.ndarray:
    """Transducer negative log likelihood.

    logits: (B, T, U+1, V) joint outputs; labels: (B, U) (0-padded);
    logit_lens: (B,); label_lens: (B,).

    alpha(t, u) = logaddexp(alpha(t-1, u) + blank(t-1, u),
                            alpha(t, u-1) + emit(t, u-1))
    loss = -(alpha(T-1, U) + blank(T-1, U))
    """
    B, T, U1, V = logits.shape
    U = U1 - 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank_lp = logp[..., blank_id]  # (B, T, U+1)
    # emit_lp[b, t, u] = logp[b, t, u, labels[b, u]] for u < U
    emit_lp = jnp.take_along_axis(
        logp[:, :, :U, :],
        jnp.broadcast_to(labels[:, None, :, None], (B, T, U, 1)),
        axis=3)[..., 0]  # (B, T, U)

    u_ar = jnp.arange(U1)[None, :]  # (1, U1)

    def diag_step(alpha_prev, d):
        """alpha_prev[b, u] = alpha(d-1-u, u); returns diag d."""
        t = d - u_ar  # (1, U1) target t per slot
        # blank arrival from (t-1, u): same slot u on previous diag
        t_bl = jnp.clip(t - 1, 0, T - 1)
        bl = jnp.take_along_axis(blank_lp,
                                 jnp.broadcast_to(t_bl[:, None, :],
                                                  (B, 1, U1)), axis=1)[:, 0]
        from_blank = jnp.where((t - 1 >= 0) & (t - 1 < T),
                               alpha_prev + bl, NEG_INF)
        # emit arrival from (t, u-1): slot u-1 on previous diag
        t_em = jnp.clip(t, 0, T - 1)  # (1, U1)
        em_gather = jnp.take_along_axis(
            emit_lp, jnp.broadcast_to(t_em[:, None, 1:], (B, 1, U)),
            axis=1)[:, 0]  # (B, U): emit_lp[b, t[u], u-1] for u=1..U
        em = jnp.concatenate([jnp.full((B, 1), NEG_INF), em_gather], axis=1)
        prev_shift = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha_prev[:, :-1]], axis=1)
        from_emit = jnp.where((u_ar >= 1) & (t >= 0) & (t < T),
                              prev_shift + em, NEG_INF)
        alpha_d = jnp.logaddexp(from_blank, from_emit)
        alpha_d = jnp.where((d == 0) & (u_ar == 0), 0.0, alpha_d)
        alpha_d = jnp.where((t >= 0) & (t < T), alpha_d, NEG_INF)
        return alpha_d, alpha_d

    init = jnp.full((B, U1), NEG_INF)
    _, alphas = jax.lax.scan(diag_step, init, jnp.arange(T + U))
    # final cell (T_b - 1, U_b) lies on diagonal d_b = T_b - 1 + U_b
    d_idx = jnp.clip(logit_lens - 1 + label_lens, 0, T + U - 1)
    final_alpha = alphas[d_idx, jnp.arange(B), label_lens]
    final_blank = blank_lp[jnp.arange(B), jnp.maximum(logit_lens - 1, 0),
                           label_lens]
    nll = -(final_alpha + final_blank)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def rnnt_loss_auto(logits, labels, logit_lens, label_lens,
                   blank_id: int = 0, reduction: str = "mean"):
    """Dispatch: Pallas fused kernel (VMEM lattice + closed-form VJP) on
    TPU, the lax.scan formulation elsewhere (interpret-mode Pallas is
    correct but slow for CPU training)."""
    if jax.default_backend() == "tpu":
        from espnet_tpu.ops.pallas.rnnt_kernel import rnnt_loss_pallas
        return rnnt_loss_pallas(logits, labels, logit_lens, label_lens,
                                blank_id=blank_id, reduction=reduction)
    return rnnt_loss(logits, labels, logit_lens, label_lens,
                     blank_id=blank_id, reduction=reduction)


def rnnt_loss_multi_blank(logits, labels, logit_lens, label_lens,
                          blank_id: int = 0,
                          big_blank_durations=(2, 4),
                          sigma: float = 0.0,
                          reduction: str = "mean"):
    """Multi-blank transducer loss (Xu et al. 2023; reference:
    espnet2/asr/transducer/rnnt_multi_blank/rnnt.py numba-CUDA).

    Big blank k occupies vocab index V - n_big + k and consumes
    big_blank_durations[k] frames at once; `sigma` is the logit
    under-normalization trick (subtracted from every log-prob).
    Same anti-diagonal scan as rnnt_loss, with a ring buffer of the last
    max(durations) diagonals for the long blank edges.
    """
    B, T, U1, V = logits.shape
    U = U1 - 1
    n_big = len(big_blank_durations)
    durs = list(big_blank_durations)
    H = max([1] + durs)  # history depth
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1) - sigma
    blank_lp = logp[..., blank_id]                      # (B, T, U1)
    big_lp = [logp[..., V - n_big + k] for k in range(n_big)]
    emit_lp = jnp.take_along_axis(
        logp[:, :, :U, :],
        jnp.broadcast_to(labels[:, None, :, None], (B, T, U, 1)),
        axis=3)[..., 0]

    u_ar = jnp.arange(U1)[None, :]

    def gather_t(lat, t):
        """lat: (B, T, U1); t: (1, U1) per-slot frame -> (B, U1)."""
        tc = jnp.clip(t, 0, T - 1)
        return jnp.take_along_axis(
            lat, jnp.broadcast_to(tc[:, None, :], (B, 1, U1)), axis=1)[:, 0]

    def diag_step(hist, d):
        """hist: (H, B, U1) diagonals d-H .. d-1."""
        alpha_prev = hist[-1]
        t = d - u_ar
        from_blank = jnp.where((t - 1 >= 0) & (t - 1 < T),
                               alpha_prev + gather_t(blank_lp, t - 1),
                               NEG_INF)
        # emit into (t, u) from (t, u-1): label prob at the DESTINATION
        # frame t, source column u-1 -> shift columns before the gather
        emit_shifted = jnp.pad(emit_lp, ((0, 0), (0, 0), (1, 0)),
                               constant_values=NEG_INF)[:, :, :U1]
        em_shift = gather_t(emit_shifted, t)
        prev_shift = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha_prev[:, :-1]], axis=1)
        from_emit = jnp.where((u_ar >= 1) & (t >= 0) & (t < T),
                              prev_shift + em_shift, NEG_INF)
        acc = jnp.logaddexp(from_blank, from_emit)
        for k, dk in enumerate(durs):
            src = hist[H - dk]  # diagonal d - dk
            bb = gather_t(big_lp[k], t - dk)
            acc = jnp.logaddexp(
                acc, jnp.where((t - dk >= 0) & (t - dk < T), src + bb,
                               NEG_INF))
        alpha_d = jnp.where((d == 0) & (u_ar == 0), 0.0, acc)
        alpha_d = jnp.where((t >= 0) & (t < T), alpha_d, NEG_INF)
        hist = jnp.concatenate([hist[1:], alpha_d[None]], axis=0)
        return hist, alpha_d

    init = jnp.full((H, B, U1), NEG_INF)
    _, alphas = jax.lax.scan(diag_step, init, jnp.arange(T + U))
    bidx = jnp.arange(B)
    # exits: standard blank from (T-1, U); big blank k from (T-dk, U)
    d_std = jnp.clip(logit_lens - 1 + label_lens, 0, T + U - 1)
    exits = [alphas[d_std, bidx, label_lens]
             + blank_lp[bidx, jnp.maximum(logit_lens - 1, 0), label_lens]]
    for k, dk in enumerate(durs):
        t_src = logit_lens - dk
        d_k = jnp.clip(t_src + label_lens, 0, T + U - 1)
        e = jnp.where(
            t_src >= 0,
            alphas[d_k, bidx, label_lens]
            + big_lp[k][bidx, jnp.clip(t_src, 0, T - 1), label_lens],
            NEG_INF)
        exits.append(e)
    nll = -jax.nn.logsumexp(jnp.stack(exits, 0), axis=0)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll
