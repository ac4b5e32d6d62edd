"""Griffin-Lim phase recovery (espnet2/utils/griffin_lim.py contract:
logmel -> linear via pseudo-inverse mel, iterative phase estimation)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.mel import mel_filterbank
from espnet_tpu.ops.stft import istft, stft


def logmel_to_linear(logmel: jnp.ndarray, *, fs: int, n_fft: int,
                     n_mels: int, fmin=0.0, fmax=None) -> jnp.ndarray:
    """(B, T, n_mels) log-mel -> (B, T, n_fft//2+1) magnitude via NNLS-ish
    pseudo-inverse (non-negative clamp)."""
    mel_basis = mel_filterbank(fs, n_fft, n_mels, fmin, fmax)  # (F, M)
    inv = np.linalg.pinv(mel_basis.T)  # pinv of (M, F) -> (F, M)
    mel = jnp.exp(logmel)
    lin = jnp.einsum("btm,fm->btf", mel, jnp.asarray(inv.astype(np.float32)))
    return jnp.sqrt(jnp.maximum(lin, 1e-10))


def griffin_lim(magnitude: jnp.ndarray, *, n_fft: int, hop_length: int,
                n_iter: int = 32, length=None) -> jnp.ndarray:
    """(B, T, F) magnitude -> (B, S) waveform."""
    B, T, F = magnitude.shape
    key = jax.random.PRNGKey(0)
    phase = jax.random.uniform(key, (B, T, F)) * 2 * jnp.pi

    def body(i, phase):
        real = magnitude * jnp.cos(phase)
        imag = magnitude * jnp.sin(phase)
        wav = istft(real, imag, n_fft=n_fft, hop_length=hop_length)
        r2, i2, _ = stft(wav, None, n_fft=n_fft, hop_length=hop_length)
        r2, i2 = r2[:, :T], i2[:, :T]
        return jnp.arctan2(i2, r2)

    phase = jax.lax.fori_loop(0, n_iter, body, phase)
    wav = istft(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase),
                n_fft=n_fft, hop_length=hop_length, length=length)
    return wav
