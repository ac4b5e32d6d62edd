"""Fused log-mel frontend as a Pallas TPU kernel.

One VMEM pass per 128-frame block: windowed-DFT matmul (MXU) -> power
-> mel matmul (MXU) -> log. The XLA composition in ops/stft.py +
ops/mel.py materializes the (T, n_fft) frame matrix and the (T, n_freq)
power spectrum in HBM between ops; the kernel keeps both fused in VMEM
(SURVEY.md north star: "frontend becomes fused Pallas kernels").

Layout: overlapping frames cannot be expressed by BlockSpecs, and
Mosaic rejects sublane-shifted slices feeding the MXU, so the host side
prepares aligned hop-sized frame SEGMENTS x3[b, blk, j, r, :] =
signal chunk (blk*128 + r + j); the kernel accumulates the DFT matmul
over the k = n_fft/hop segments:

    spec = sum_j  x3[..., j, :, :] @ Wdft[j*hop:(j+1)*hop, :]

which never builds the frame matrix at all. Requires hop | n_fft;
frontends fall back to the XLA ops otherwise. CPU tests run the kernel
in interpret mode for exact parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from espnet_tpu.ops.mel import mel_filterbank
from espnet_tpu.ops.stft import _windowed_dft_matrix

BLOCK_FRAMES = 128


def _kernel(seg_ref, dft_ref, mel_ref, out_ref, *, hop: int, k: int):
    spec = jnp.zeros((BLOCK_FRAMES, dft_ref.shape[1]), jnp.float32)
    for j in range(k):
        spec = spec + jnp.dot(seg_ref[0, 0, j],
                              dft_ref[j * hop:(j + 1) * hop, :],
                              preferred_element_type=jnp.float32)
    F = spec.shape[1] // 2
    power = spec[:, :F] ** 2 + spec[:, F:] ** 2
    mel = jnp.dot(power, mel_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = jnp.log(jnp.maximum(mel, 1e-10))[None]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "n_mels", "fs", "interpret"))
def fused_logmel(speech: jnp.ndarray, *, fs: int = 16000, n_fft: int = 512,
                 hop_length: int = 128, n_mels: int = 80,
                 interpret: bool = False) -> jnp.ndarray:
    """(B, S) wave -> (B, ceil(T/128)*128, n_mels) log-mel with
    torch.stft center semantics; frames beyond the true feat length are
    computed from zero padding and masked by callers."""
    assert n_fft % hop_length == 0, "fused_logmel requires hop | n_fft"
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B, S = speech.shape
    hop, k = hop_length, n_fft // hop_length
    pad = n_fft // 2
    x = jnp.pad(speech.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")
    T = (x.shape[1] - n_fft) // hop + 1
    n_blocks = -(-T // BLOCK_FRAMES)
    n_frames = n_blocks * BLOCK_FRAMES
    n_chunks = n_frames + k
    if x.shape[1] < n_chunks * hop:
        x = jnp.pad(x, ((0, 0), (0, n_chunks * hop - x.shape[1])))
    x2 = x[:, :n_chunks * hop].reshape(B, n_chunks, hop)
    # aligned segments: x3[b, blk, j, r] = x2[b, blk*128 + r + j]
    x3 = jnp.stack([
        x2[:, j:j + n_frames].reshape(B, n_blocks, BLOCK_FRAMES, hop)
        for j in range(k)], axis=2)  # (B, n_blocks, k, 128, hop)
    dft = jnp.asarray(_windowed_dft_matrix(n_fft, n_fft, "hann", False))
    melw = jnp.asarray(mel_filterbank(fs, n_fft, n_mels))

    out = pl.pallas_call(
        functools.partial(_kernel, hop=hop, k=k),
        out_shape=jax.ShapeDtypeStruct((B, n_frames, n_mels), jnp.float32),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, k, BLOCK_FRAMES, hop),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_FRAMES, n_mels),
                               lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(x3, dft, melw)
    return out
