"""Incremental (chunk-by-chunk) feature extraction for streaming ASR.

Behavioral contract: espnet2/bin/asr_inference_streaming.py:205
(apply_frontend) — buffered raw samples are consumed into log-mel frames
with center=False so frames never change retroactively; training-time
center padding is mimicked by seeding n_fft//2 zeros (and flushing the
same at the end). Shared by the CTC and transducer streaming APIs.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.mel import log_mel
from espnet_tpu.ops.stft import stft_power

# valid-conv receptive-field extras per subsampling rate: producing k
# encoder frames needs rate*k + extra feature frames (see
# espnet_tpu/nn/subsampling.py conv arithmetic)
_SUBSAMPLE_EXTRA = {1: 0, 2: 5, 4: 3, 6: 5, 8: 7}


class StreamingFeatureExtractor:
    def __init__(self, n_fft: int = 512, hop_length: int = 128,
                 n_mels: int = 80, fs: int = 16000):
        self.n_fft = n_fft
        self.hop = hop_length
        self.n_mels = n_mels
        self.fs = fs
        self.reset()

    def reset(self):
        # prepend n_fft//2 zeros to mimic training-time center padding
        self._samples = np.zeros((self.n_fft // 2,), np.float32)
        self.feats = np.zeros((0, self.n_mels), np.float32)

    def push(self, speech: np.ndarray, is_final: bool = False) -> None:
        """Buffer samples; extend self.feats with completed frames."""
        self._samples = np.concatenate(
            [self._samples, np.asarray(speech, np.float32)])
        if is_final:
            self._samples = np.concatenate(
                [self._samples, np.zeros((self.n_fft // 2,), np.float32)])
        S = len(self._samples)
        n_frames = (S - self.n_fft) // self.hop + 1 if S >= self.n_fft else 0
        if n_frames <= 0:
            return
        p, _ = stft_power(jnp.asarray(self._samples[None]), None,
                          n_fft=self.n_fft, hop_length=self.hop,
                          center=False)
        feats = log_mel(p, fs=self.fs, n_fft=self.n_fft, n_mels=self.n_mels)
        self.feats = np.concatenate(
            [self.feats, np.asarray(feats[0, :n_frames])], axis=0)
        self._samples = self._samples[n_frames * self.hop:]

    def pop_one_window(self, window: int, advance: int,
                       is_final: bool = False, with_valid: bool = False):
        """Pop a single (window, n_mels) chunk or None (session pools
        drain one window per session per batched round). with_valid=True
        returns (chunk, n_valid_frames) so the caller can mask the
        zero-padded tail of the last window."""
        if len(self.feats) >= window or (
                is_final and len(self.feats) > window - advance):
            take = min(window, len(self.feats))
            chunk = self.feats[:take]
            self.feats = self.feats[advance:]
            if take < window:
                chunk = np.pad(chunk, ((0, window - take), (0, 0)))
            return (chunk, take) if with_valid else chunk
        return None

    def pop_windows(self, window: int, advance: int,
                    is_final: bool = False) -> List[np.ndarray]:
        """Yield fixed-size (window, n_mels) chunks advancing by
        `advance` frames (overlap = window - advance kept for the
        valid-conv subsampling); zero-pads the tail when final."""
        out = []
        while len(self.feats) >= window or (
                is_final and len(self.feats) > window - advance):
            take = min(window, len(self.feats))
            chunk = self.feats[:take]
            self.feats = self.feats[advance:]
            if take < window:
                chunk = np.pad(chunk, ((0, window - take), (0, 0)))
            out.append(chunk)
        return out


def subsample_window(rate: int, chunk_size: int) -> tuple:
    """(window, advance) feature-frame arithmetic for a streaming
    encoder chunk of `chunk_size` output frames."""
    extra = _SUBSAMPLE_EXTRA[rate]
    return rate * chunk_size + extra, rate * chunk_size


def subsampled_valid_len(rate: int, n_valid_feats: int) -> int:
    """Valid ENCODER frames produced from the first n_valid feature
    frames of a window (the valid-conv stage arithmetic of
    nn/subsampling.py — masks the zero-padded tail of final windows)."""
    convs = {2: [(3, 2), (3, 1)], 4: [(3, 2), (3, 2)],
             6: [(3, 2), (5, 3)], 8: [(3, 2), (3, 2), (3, 2)],
             1: []}[rate]
    n = n_valid_feats
    for k, s in convs:
        n = (n - k + s) // s
    return max(int(n), 0)
