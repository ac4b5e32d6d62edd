"""SpecAugment as pure jittable masking with explicit RNG.

Behavioral contract: espnet2/asr/specaug/specaug.py:10 (TimeWarp +
MaskAlongAxis freq/time). TPU-first design: masks are computed with
`jax.random` on device with static shapes — a (B, T, D) feature batch in,
same shape out, no data-dependent control flow. Time-warp is implemented
as a per-utterance piecewise-linear time resampling (one gather), the
TPU analogue of the reference's sparse_image_warp-based warp
(espnet2/layers/time_warp.py:10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_along_axis(rng, x: jnp.ndarray, lengths: jnp.ndarray | None, *,
                    axis: int, mask_width_range=(0, 30), num_mask: int = 2,
                    mask_value: float = 0.0) -> jnp.ndarray:
    """Random rectangular masks along time (axis=1) or freq (axis=2).

    x: (B, T, D). Equivalent to espnet2/layers/mask_along_axis.py:8 but
    fully vectorized: sample (B, num_mask) starts/widths, build boolean
    via broadcasted comparisons.
    """
    B, T, D = x.shape
    size = x.shape[axis]
    r_width, r_start = jax.random.split(rng)
    widths = jax.random.randint(r_width, (B, num_mask),
                                mask_width_range[0], mask_width_range[1])
    if axis == 1 and lengths is not None:
        maxstart = jnp.maximum(lengths[:, None] - widths, 1)
    else:
        maxstart = jnp.maximum(size - widths, 1)
    starts = jax.random.randint(r_start, (B, num_mask), 0, 2 ** 30) % maxstart
    pos = jnp.arange(size)[None, None, :]  # (1, 1, size)
    hit = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    mask = jnp.any(hit, axis=1)  # (B, size) True where masked
    shape = [B, 1, 1]
    shape[axis] = size
    return jnp.where(mask.reshape(shape), jnp.asarray(mask_value, x.dtype), x)


def time_warp(rng, x: jnp.ndarray, lengths: jnp.ndarray | None, *,
              window: int = 5) -> jnp.ndarray:
    """Piecewise-linear time warp around a random center (per utterance).

    A random frame c in [window, L-window) moves to c+w, w~U(-window,window);
    frames are linearly re-timed on [0,c]->[0,c+w] and [c,L]->[c+w,L], then
    gathered with nearest-neighbor indices (static shapes).
    """
    B, T, D = x.shape
    L = lengths if lengths is not None else jnp.full((B,), T)
    L = L.astype(jnp.int32)
    r_c, r_w = jax.random.split(rng)
    safe_hi = jnp.maximum(L - window, window + 1)
    c = window + jax.random.randint(r_c, (B,), 0, 2 ** 30) % jnp.maximum(
        safe_hi - window, 1)
    w = jax.random.randint(r_w, (B,), -window, window + 1)
    cw = jnp.clip(c + w, 1, jnp.maximum(L - 1, 2))
    t = jnp.arange(T)[None, :].astype(jnp.float32)  # target positions
    cf, cwf, Lf = c[:, None].astype(jnp.float32), cw[:, None].astype(jnp.float32), \
        L[:, None].astype(jnp.float32)
    # inverse map: source index for each target frame
    src_lo = t * cf / jnp.maximum(cwf, 1.0)
    src_hi = cf + (t - cwf) * (Lf - cf) / jnp.maximum(Lf - cwf, 1.0)
    src = jnp.where(t < cwf, src_lo, src_hi)
    src = jnp.where(t < Lf, src, t)  # padding region untouched
    idx = jnp.clip(jnp.round(src).astype(jnp.int32), 0, T - 1)
    warped = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    ok = (L >= 2 * window + 2)[:, None, None]  # too-short utts pass through
    return jnp.where(ok, warped, x)


def specaug(rng, x: jnp.ndarray, lengths: jnp.ndarray | None = None, *,
            apply_time_warp: bool = True, time_warp_window: int = 5,
            apply_freq_mask: bool = True, freq_mask_width_range=(0, 20),
            num_freq_mask: int = 2, apply_time_mask: bool = True,
            time_mask_width_range=(0, 40), num_time_mask: int = 2
            ) -> jnp.ndarray:
    """Full SpecAug pipeline (espnet2/asr/specaug/specaug.py:94-96 order).

    Width ranges accept an int W as shorthand for (0, W) — the
    reference's mask_along_axis.py:108 int/tuple duality."""
    if isinstance(freq_mask_width_range, int):
        freq_mask_width_range = (0, freq_mask_width_range)
    if isinstance(time_mask_width_range, int):
        time_mask_width_range = (0, time_mask_width_range)
    r1, r2, r3 = jax.random.split(rng, 3)
    if apply_time_warp:
        x = time_warp(r1, x, lengths, window=time_warp_window)
    if apply_freq_mask:
        x = mask_along_axis(r2, x, lengths, axis=2,
                            mask_width_range=freq_mask_width_range,
                            num_mask=num_freq_mask)
    if apply_time_mask:
        x = mask_along_axis(r3, x, lengths, axis=1,
                            mask_width_range=time_mask_width_range,
                            num_mask=num_time_mask)
    return x
