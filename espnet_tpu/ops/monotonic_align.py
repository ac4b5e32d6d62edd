"""Monotonic alignment search (Viterbi max-path over a (T_text, T_feat)
log-likelihood matrix).

Behavioral contract: the VITS Cython kernel
espnet2/gan_tts/vits/monotonic_align/core.pyx (+ numba fallback in
__init__.py:11-46) and the JETS numba alignment
(espnet2/gan_tts/jets/alignments.py): given value[s, t] log-likelihoods,
find the best monotonic, surjective alignment path (each feature frame t
assigned to text position s, s nondecreasing, starting at (0,0), ending
at (S-1, T-1)).

TPU-first: forward DP as `lax.scan` over feature frames (vectorized over
text positions and batch), backtracking as a reverse scan carrying the
current text index — everything on device, batched, no host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def maximum_path(value: jnp.ndarray, text_lens: jnp.ndarray,
                 feat_lens: jnp.ndarray) -> jnp.ndarray:
    """value: (B, S, T) log-likelihoods -> path (B, S, T) in {0,1}.

    Cells outside (text_lens, feat_lens) are ignored; the path for
    sequence b ends at (text_lens[b]-1, feat_lens[b]-1).
    """
    B, S, T = value.shape
    s_idx = jnp.arange(S)

    def fwd(carry, t):
        prev = carry  # (B, S) best score ending at (s, t-1)
        stay = prev
        advance = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), prev[:, :-1]], axis=1)
        best = jnp.maximum(stay, advance)
        from_adv = advance > stay  # True if best came from s-1
        # t == 0 handled by init
        cur = best + value[:, :, t]
        # enforce monotone feasibility: s <= t and s >= S_b - (T_b - t)
        feasible = (s_idx[None, :] <= t)
        cur = jnp.where(feasible, cur, NEG_INF)
        return cur, from_adv

    init = jnp.where(s_idx[None, :] == 0, value[:, :, 0], NEG_INF)
    final, from_adv = jax.lax.scan(fwd, init, jnp.arange(1, T))
    # from_adv: (T-1, B, S) transition choices for t = 1..T-1

    # backtrack: start at s_end = text_lens-1 at t = feat_lens-1
    def bwd(carry, t):
        s_cur = carry  # (B,) current text index at frame t
        s_cur = jnp.where(t == feat_lens - 1, text_lens - 1, s_cur)
        adv = from_adv[jnp.maximum(t - 1, 0), jnp.arange(B), s_cur]
        active = (t > 0) & (t <= feat_lens - 1)
        s_prev = jnp.clip(s_cur - jnp.where(active & adv, 1, 0), 0, S - 1)
        return s_prev, s_cur

    s0 = text_lens - 1
    _, s_path = jax.lax.scan(bwd, s0, jnp.arange(T - 1, -1, -1))
    s_path = s_path[::-1].T  # (B, T) text index per frame
    path = jax.nn.one_hot(s_path, S, axis=1)  # (B, S, T)
    t_valid = jnp.arange(T)[None, :] < feat_lens[:, None]
    return path * t_valid[:, None, :]
