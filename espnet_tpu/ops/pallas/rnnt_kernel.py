"""Pallas RNN-T loss: VMEM-resident lattice sweeps + closed-form VJP.

Replaces the reference's external CUDA kernels (warp-transducer,
tools/installers/install_warp-transducer.sh; numba-CUDA
espnet2/asr/transducer/rnnt_multi_blank/utils/cuda_utils/gpu_rnnt_kernel.py)
with a TPU-native design:

- The (T, U) lattice is PRE-SKEWED in XLA so each anti-diagonal is a
  contiguous row: skew[d, u] = x[d - u, u]. The wavefront recursion then
  becomes a row-at-a-time sweep — pure VPU work with a `roll` for the
  emit edge, no gathers inside the kernel.
- One Pallas program holds a whole batch-block's skewed lattice in VMEM
  and runs all T+U steps with zero inter-step dispatch overhead (the
  lax.scan formulation in ops/rnnt.py pays an XLA op boundary per
  diagonal).
- The backward pass is CLOSED-FORM (warp-transducer math): a beta sweep
  (same kernel family, reversed) plus one softmax recompute —
  dL/dlogits = -exp(alpha+beta_edge-logZ) at the blank/label targets
  plus softmax * total occupancy. No O(T*U*V) autodiff residuals are
  stored; the only saved tensors are the (B,T,U+1) blank/emit lattices
  and the input logits.

Batch items with different (T_b, U_b) are handled by NEG_INF-masking the
inputs (forward) and per-sample exit cells read from SMEM (backward).
Falls back to interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------
# kernels: forward (alpha) and backward (beta) sweeps over skewed rows
# --------------------------------------------------------------------

def _alpha_kernel(bs_ref, es_ref, alpha_ref):
    """bs/es/alpha: (Bb, D, Up) skewed. alpha[d,u] = log p(paths to
    (t=d-u, u))."""
    Bb, D, Up = alpha_ref.shape
    u_col = jax.lax.broadcasted_iota(jnp.int32, (Bb, Up), 1)
    alpha0 = jnp.where(u_col == 0, 0.0, NEG_INF)
    alpha_ref[:, 0, :] = alpha0

    def body(d, prev):
        bs = bs_ref[:, d - 1, :]
        es = es_ref[:, d - 1, :]
        from_blank = prev + bs
        emit = prev + es
        emit = pltpu.roll(emit, 1, 1)
        emit = jnp.where(u_col == 0, NEG_INF, emit)
        a = jnp.logaddexp(from_blank, emit)
        alpha_ref[:, d, :] = a
        return a

    jax.lax.fori_loop(1, D, body, alpha0)


def _beta_kernel(bs_ref, es_ref, tb_ref, ub_ref, beta_ref):
    """beta[d,u] = log p(completing from (t=d-u, u)); per-sample exit at
    (T_b-1, U_b) -> virtual 0 via the blank edge. tb/ub: (Bb, 1) SMEM."""
    Bb, D, Up = beta_ref.shape
    u_col = jax.lax.broadcasted_iota(jnp.int32, (Bb, Up), 1)
    tb = tb_ref[:, 0][:, None]  # (Bb, 1)
    ub = ub_ref[:, 0][:, None]

    def body(i, nxt):
        # d runs D-1 .. 0; the exit cell (T_b-1, U_b) lies on diagonal
        # T_b-1+U_b which can be the last one
        d = D - 1 - i
        bs = bs_ref[:, d, :]
        es = es_ref[:, d, :]
        t = d - u_col
        # blank edge to (t+1, u): next diag same u; exits at t+1 == T_b,
        # u == U_b with completion prob 1
        exit_cell = (t + 1 == tb) & (u_col == ub)
        from_blank = bs + jnp.where(exit_cell, 0.0, nxt)
        # emit edge to (t, u+1): next diag u+1
        nxt_up = pltpu.roll(nxt, Up - 1, 1)  # roll by -1 (shift must be >=0)
        nxt_up = jnp.where(u_col == Up - 1, NEG_INF, nxt_up)
        from_emit = es + nxt_up
        b = jnp.logaddexp(from_blank, from_emit)
        beta_ref[:, d, :] = b
        return b

    jax.lax.fori_loop(0, D, body, jnp.full((Bb, Up), NEG_INF),
                      unroll=False)


def _sweep(kernel, args, Bb, D, Up, n_smem=0):
    """Run a lattice sweep blocked over batch."""
    B = args[0].shape[0]
    grid = (B // Bb,)
    in_specs = [pl.BlockSpec((Bb, D, Up), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(len(args) - n_smem)]
    # per-sample length vectors: VMEM, not SMEM — Mosaic only allows
    # SCALAR loads from SMEM, and the kernels read (Bb,)-vectors
    in_specs += [pl.BlockSpec((Bb, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
                 for _ in range(n_smem)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bb, D, Up), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, Up), jnp.float32),
        interpret=_interpret(),
    )(*args)


def _pick_bb(B: int, D: int, Up: int) -> int:
    """Largest batch block keeping ~3 lattices under the VMEM budget."""
    budget = 8 * 1024 * 1024
    per_item = 3 * D * Up * 4
    bb = max(min(budget // max(per_item, 1), B), 1)
    while B % bb != 0:
        bb -= 1
    return bb


# --------------------------------------------------------------------
# skew helpers (XLA)
# --------------------------------------------------------------------

def _skew(x: jnp.ndarray, D: int, Up: int) -> jnp.ndarray:
    """(B, T, U1) -> (B, D, Up) with skew[b, d, u] = x[b, d-u, u]."""
    B, T, U1 = x.shape
    d_idx = jnp.arange(D)[:, None]
    u_idx = jnp.arange(Up)[None, :]
    t = d_idx - u_idx  # (D, Up)
    valid = (t >= 0) & (t < T) & (u_idx < U1)
    tc = jnp.clip(t, 0, T - 1)
    uc = jnp.clip(u_idx, 0, U1 - 1)
    out = x[:, tc, uc]  # (B, D, Up)
    return jnp.where(valid[None], out, NEG_INF)


def _unskew(s: jnp.ndarray, T: int, U1: int) -> jnp.ndarray:
    """(B, D, Up) -> (B, T, U1) with out[b, t, u] = s[b, t+u, u]."""
    t_idx = jnp.arange(T)[:, None]
    u_idx = jnp.arange(U1)[None, :]
    return s[:, t_idx + u_idx, u_idx]


def _lattices(logits, labels, logit_lens, label_lens, blank_id):
    """-> blank_lp, emit_lp (B, T, U1), NEG_INF-masked outside lengths."""
    B, T, U1, V = logits.shape
    U = U1 - 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank_lp = logp[..., blank_id]
    emit_lp = jnp.take_along_axis(
        logp[:, :, :U, :],
        jnp.broadcast_to(labels[:, None, :, None], (B, T, U, 1)),
        axis=3)[..., 0]
    emit_lp = jnp.pad(emit_lp, ((0, 0), (0, 0), (0, 1)),
                      constant_values=NEG_INF)
    t_ok = jnp.arange(T)[None, :, None] < logit_lens[:, None, None]
    u_ok = jnp.arange(U1)[None, None, :] <= label_lens[:, None, None]
    blank_lp = jnp.where(t_ok & u_ok, blank_lp, NEG_INF)
    emit_lp = jnp.where(
        t_ok & (jnp.arange(U1)[None, None, :] < label_lens[:, None, None]),
        emit_lp, NEG_INF)
    return blank_lp, emit_lp


# --------------------------------------------------------------------
# loss with custom VJP
# --------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rnnt_loss_fused(logits, labels, logit_lens, label_lens, blank_id=0):
    """Per-sample RNN-T negative log-likelihood, (B,)."""
    nll, _ = _fwd(logits, labels, logit_lens, label_lens, blank_id)
    return nll


def _alpha_beta(blank_lp, emit_lp, logit_lens, label_lens, want_beta):
    B, T, U1 = blank_lp.shape
    D = T + U1 - 1
    Up = _round_up(U1, 128)
    Dp = D  # rows are sequential; no tiling constraint on D
    bs = _skew(blank_lp, Dp, Up)
    es = _skew(emit_lp, Dp, Up)
    Bb = _pick_bb(B, Dp, Up)
    alpha_s = _sweep(_alpha_kernel, (bs, es), Bb, Dp, Up)
    beta_s = None
    if want_beta:
        tb = logit_lens.astype(jnp.int32).reshape(B, 1)
        ub = label_lens.astype(jnp.int32).reshape(B, 1)
        beta_s = _sweep(_beta_kernel, (bs, es, tb, ub), Bb, Dp, Up,
                        n_smem=2)
    return alpha_s, beta_s, (D, Up)


def _fwd(logits, labels, logit_lens, label_lens, blank_id):
    B, T, U1, V = logits.shape
    blank_lp, emit_lp = _lattices(logits, labels, logit_lens, label_lens,
                                  blank_id)
    alpha_s, _, (D, Up) = _alpha_beta(blank_lp, emit_lp, logit_lens,
                                      label_lens, want_beta=False)
    # logZ = alpha(T_b-1, U_b) + blank(T_b-1, U_b)
    d_idx = jnp.clip(logit_lens - 1 + label_lens, 0, D - 1)
    final_alpha = alpha_s[jnp.arange(B), d_idx, label_lens]
    final_blank = blank_lp[jnp.arange(B), jnp.maximum(logit_lens - 1, 0),
                           label_lens]
    nll = -(final_alpha + final_blank)
    return nll, (logits, labels, logit_lens, label_lens)


def _bwd(blank_id, res, g):
    logits, labels, logit_lens, label_lens = res
    B, T, U1, V = logits.shape
    U = U1 - 1
    blank_lp, emit_lp = _lattices(logits, labels, logit_lens, label_lens,
                                  blank_id)
    alpha_s, beta_s, (D, Up) = _alpha_beta(blank_lp, emit_lp, logit_lens,
                                           label_lens, want_beta=True)
    alpha = _unskew(alpha_s, T, U1)
    beta = _unskew(beta_s, T, U1)
    logz = -(
        -(alpha_s[jnp.arange(B), jnp.clip(logit_lens - 1 + label_lens, 0,
                                          D - 1), label_lens]
          + blank_lp[jnp.arange(B), jnp.maximum(logit_lens - 1, 0),
                     label_lens]))
    logz = logz[:, None, None]
    # occupancy of the blank edge out of (t, u): alpha + blank + beta(t+1,u)
    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    beta_t1 = jnp.concatenate(
        [beta[:, 1:, :], jnp.full((B, 1, U1), NEG_INF)], axis=1)
    exit_cell = (t_idx + 1 == logit_lens[:, None, None]) \
        & (u_idx == label_lens[:, None, None])
    beta_t1 = jnp.where(exit_cell, 0.0, beta_t1)
    g_blank = -jnp.exp(alpha + blank_lp + beta_t1 - logz)
    # occupancy of the emit edge out of (t, u): alpha + emit + beta(t,u+1)
    beta_u1 = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((B, T, 1), NEG_INF)], axis=2)
    g_emit = -jnp.exp(alpha + emit_lp + beta_u1 - logz)
    g_blank = jnp.where(blank_lp <= NEG_INF / 2, 0.0, g_blank)
    g_emit = jnp.where(emit_lp <= NEG_INF / 2, 0.0, g_emit)
    # chain through log_softmax: dlogits = scatter(g) - softmax * sum(g)
    total = g_blank + g_emit  # (B, T, U1)
    sm = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    dlogits = -sm * total[..., None]
    oh_blank = jax.nn.one_hot(blank_id, V, dtype=jnp.float32)
    dlogits = dlogits + g_blank[..., None] * oh_blank
    lab_oh = jax.nn.one_hot(labels, V, dtype=jnp.float32)  # (B, U, V)
    dlogits = dlogits.at[:, :, :U, :].add(
        g_emit[:, :, :U, None] * lab_oh[:, None, :, :])
    dlogits = dlogits * g[:, None, None, None]
    return (dlogits.astype(logits.dtype), None, None, None)


rnnt_loss_fused.defvjp(_fwd, _bwd)


def rnnt_loss_pallas(logits, labels, logit_lens, label_lens,
                     blank_id: int = 0, reduction: str = "mean"):
    """Drop-in for ops.rnnt.rnnt_loss with the fused kernel path."""
    nll = rnnt_loss_fused(logits, labels, logit_lens, label_lens, blank_id)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll
