"""Mel filterbank matrix + log-mel, librosa-compatible math, no librosa dep.

Behavioral contract: espnet2/layers/log_mel.py:24-90 builds
``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax, htk)`` (slaney mel
scale + slaney area-normalization by default) and applies
``log(clamp(power @ mel.T, 1e-10))``. We reimplement that published
algorithm directly in numpy; the per-frame op is a single (F -> n_mels)
matmul fused by XLA into the STFT matmul chain.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hz_to_mel(freq: np.ndarray, htk: bool = False) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
                    mels)


def mel_to_hz(mels: np.ndarray, htk: bool = False) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel weights, shape (n_freq, n_mels) ready for `power @ W`."""
    if fmax is None:
        fmax = fs / 2.0
    n_freq = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, fs / 2.0, n_freq)
    mel_pts = mel_to_hz(
        np.linspace(hz_to_mel(np.array(fmin), htk), hz_to_mel(np.array(fmax), htk),
                    n_mels + 2), htk)
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_freq)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_freq)
    if norm == "slaney":
        enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
        weights = weights * enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freq, n_mels)


def log_mel(power: jnp.ndarray, *, fs: int = 16000, n_fft: int = 512,
            n_mels: int = 80, fmin: float = 0.0, fmax: float | None = None,
            htk: bool = False, log_base: float | None = None) -> jnp.ndarray:
    """(B, T, n_freq) power spectrum -> (B, T, n_mels) log-mel features."""
    w = jnp.asarray(mel_filterbank(fs, n_fft, n_mels, fmin, fmax, htk))
    mel = jnp.einsum("btf,fm->btm", power.astype(jnp.float32), w,
                     preferred_element_type=jnp.float32)
    out = jnp.log(jnp.maximum(mel, 1e-10))
    if log_base is not None:
        out = out / np.log(log_base)
    return out.astype(power.dtype)
