"""CTC forced alignment / segmentation.

Behavioral contract: espnet2/bin/asr_align.py (CTC segmentation: given
audio and its transcript, produce per-token time boundaries from CTC
posteriors).

The Viterbi forward over the blank-interleaved CTC topology runs as a
`lax.scan` on device; backtracking over the returned pointer matrix is
cheap host work (alignment is an offline utility, not a serving path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def ctc_viterbi_forward(logp: jnp.ndarray, tokens: jnp.ndarray,
                        blank_id: int = 0):
    """logp: (T, V); tokens: (U,). Returns (alphas (T, S), backs (T-1, S))
    over the S = 2U+1 CTC states (even=blank, odd=token)."""
    Tmax, V = logp.shape
    U = tokens.shape[0]
    S = 2 * U + 1
    emit = jnp.where(jnp.arange(S) % 2 == 0, blank_id,
                     tokens[jnp.clip(jnp.arange(S) // 2, 0, U - 1)])
    tok_s = tokens[jnp.clip(jnp.arange(S) // 2, 0, U - 1)]
    tok_prev = tokens[jnp.clip(jnp.arange(S) // 2 - 1, 0, U - 1)]
    can_skip = (jnp.arange(S) % 2 == 1) & (jnp.arange(S) // 2 >= 1) & \
        (tok_s != tok_prev)

    def step(alpha, t):
        stay = alpha
        prev1 = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        prev2 = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
        prev2 = jnp.where(can_skip, prev2, NEG_INF)
        best = jnp.maximum(stay, jnp.maximum(prev1, prev2))
        back = jnp.where(best == prev2, 2,
                         jnp.where(best == prev1, 1, 0)).astype(jnp.int32)
        alpha_new = best + logp[t, emit]
        return alpha_new, (alpha_new, back)

    alpha0 = jnp.full((S,), NEG_INF)
    alpha0 = alpha0.at[0].set(logp[0, blank_id])
    if U > 0:
        alpha0 = alpha0.at[1].set(logp[0, emit[1]])
    _, (alphas_rest, backs) = jax.lax.scan(step, alpha0,
                                           jnp.arange(1, Tmax))
    alphas = jnp.concatenate([alpha0[None], alphas_rest])
    return alphas, backs


def ctc_forced_align(logp, tokens, T: int | None = None, blank_id: int = 0
                     ) -> np.ndarray:
    """-> (T_eff,) int state path (host numpy)."""
    alphas, backs = jax.jit(ctc_viterbi_forward, static_argnums=(2,))(
        jnp.asarray(logp), jnp.asarray(tokens), blank_id)
    alphas = np.asarray(alphas)
    backs = np.asarray(backs)
    U = len(tokens)
    S = 2 * U + 1
    eff_T = alphas.shape[0] if T is None else int(T)
    a_end = alphas[eff_T - 1]
    state = S - 1 if a_end[S - 1] >= a_end[S - 2] else S - 2
    states = np.zeros(eff_T, np.int32)
    states[eff_T - 1] = state
    for t in range(eff_T - 1, 0, -1):
        state = state - backs[t - 1, state]
        states[t - 1] = state
    return states


def token_boundaries(states: np.ndarray, U: int):
    """(T,) CTC state path -> per-token (start_frame, end_frame)."""
    bounds = []
    for u in range(U):
        frames = np.where(states == 2 * u + 1)[0]
        if len(frames):
            bounds.append((int(frames[0]), int(frames[-1] + 1)))
        else:  # skipped token (repeat merge); zero-width at previous end
            prev_end = bounds[-1][1] if bounds else 0
            bounds.append((prev_end, prev_end))
    return bounds


def align_segments(model, params, speech, speech_lengths, token_ids,
                   token_lengths, *, fs: int = 16000, hop_length: int = 128,
                   subsample: int = 4):
    """Full pipeline: encode -> CTC posteriors -> Viterbi -> seconds.

    Returns per-utterance list of (token_id, start_sec, end_sec)."""
    enc, enc_lens = model.apply(params, jnp.asarray(speech),
                                jnp.asarray(speech_lengths),
                                method=model.encode)
    logits = model.apply(params, enc, method=model.ctc_logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    results = []
    spf = hop_length * subsample / fs
    for b in range(logp.shape[0]):
        U = int(token_lengths[b])
        toks = np.asarray(token_ids[b][:U])
        states = ctc_forced_align(logp[b], toks, T=int(enc_lens[b]))
        bounds = token_boundaries(states, U)
        results.append([(int(toks[u]), s * spf, e * spf)
                        for u, (s, e) in enumerate(bounds)])
    return results
