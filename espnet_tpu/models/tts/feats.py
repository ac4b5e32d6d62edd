"""TTS target-feature extractors: F0 (pitch) and energy.

Behavioral contract: espnet2/tts/feats_extract/ — `Dio` (pyworld F0
with continuous interpolation; pyworld is unavailable in this image, so
F0 comes from a jittable autocorrelation pitch tracker), `Energy` (L2
of STFT frames), and FastSpeech2's token-averaging of frame-level
values by durations (fastspeech2.py use_token_averaged_* behavior).
All pure JAX -> runs inside the training step like the reference's
feats_extract modules.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.stft import frame_signal, stft_power
from espnet_tpu.utils.masks import make_non_pad_mask


def extract_f0(speech: jnp.ndarray, lengths: jnp.ndarray, *,
               fs: int = 16000, frame_length: int = 1024,
               hop_length: int = 256, f0min: float = 70.0,
               f0max: float = 400.0, voicing_threshold: float = 0.3):
    """Autocorrelation pitch tracker.

    (B, S) -> (f0 (B, T) Hz with 0 at unvoiced frames, then linearly
    usable as-is; frame count T matches hop/frame_length framing with
    center padding).
    """
    pad = frame_length // 2
    x = jnp.pad(speech.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")
    frames = frame_signal(x, frame_length, hop_length)  # (B, T, W)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # autocorrelation via rFFT power spectrum
    n_fft = 2 * frame_length
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    r = jnp.fft.irfft(jnp.abs(spec) ** 2, n=n_fft, axis=-1)[
        ..., :frame_length]
    r0 = jnp.maximum(r[..., 0], 1e-10)
    lag_min = max(int(fs / f0max), 2)
    lag_max = min(int(fs / f0min), frame_length - 1)
    window = r[..., lag_min:lag_max]
    best = jnp.argmax(window, axis=-1)
    peak = jnp.take_along_axis(window, best[..., None], axis=-1)[..., 0]
    voiced = (peak / r0) > voicing_threshold
    f0 = fs / (best + lag_min).astype(jnp.float32)
    f0 = jnp.where(voiced, f0, 0.0)
    T = f0.shape[1]
    flens = jnp.minimum(lengths // hop_length + 1, T).astype(jnp.int32)
    f0 = jnp.where(make_non_pad_mask(flens, T), f0, 0.0)
    return f0, flens


def extract_energy(speech: jnp.ndarray, lengths: jnp.ndarray, *,
                   n_fft: int = 1024, hop_length: int = 256):
    """L2 norm of STFT frames (feats_extract/energy.py)."""
    power, flens = stft_power(speech, lengths, n_fft=n_fft,
                              hop_length=hop_length)
    e = jnp.sqrt(jnp.maximum(jnp.sum(power, axis=-1), 1e-10))
    e = jnp.where(make_non_pad_mask(flens, e.shape[1]), e, 0.0)
    return e, flens


def token_average(values: jnp.ndarray, durations: jnp.ndarray):
    """Average frame-level values per token by durations
    (fastspeech2.py _adjust/token-average behavior).

    values: (B, T); durations: (B, L) int -> (B, L)."""
    B, T = values.shape
    L = durations.shape[1]
    ends = jnp.cumsum(durations, axis=1)  # (B, L)
    starts = ends - durations
    pos = jnp.arange(T)[None, None, :]  # (1, 1, T)
    inside = (pos >= starts[:, :, None]) & (pos < ends[:, :, None])
    total = jnp.einsum("blt,bt->bl", inside.astype(values.dtype), values)
    n = jnp.maximum(jnp.sum(inside, axis=-1), 1)
    return total / n
