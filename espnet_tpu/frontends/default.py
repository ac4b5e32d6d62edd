"""Default feature frontend: waveform -> STFT power -> log-mel.

Behavioral contract: espnet2/asr/frontend/default.py:17-117
(Stft -> power -> LogMel). Pure function of (wave, ilens); the whole
pipeline is two MXU matmuls (windowed-DFT + mel) that XLA fuses with the
downstream subsampling conv, so features never round-trip to HBM between
stages. Normalization (GlobalMVN/UtteranceMVN) is a separate step, as in
the reference model graph (espnet2/asr/espnet_model.py:380 encode order).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.mel import log_mel
from espnet_tpu.ops.stft import stft_power, stft_segmented
from espnet_tpu.utils.masks import make_non_pad_mask, mask_fill


@dataclasses.dataclass(frozen=True)
class DefaultFrontend:
    """Config-carrying callable; stateless (mel matrix is cached numpy)."""

    fs: int = 16000
    n_fft: int = 512
    win_length: int | None = None
    hop_length: int = 128
    window: str = "hann"
    center: bool = True
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None
    htk: bool = False
    log_base: float | None = None
    # "auto": segment-accumulate DFT (k shifted MXU matmuls, no frame
    # gather — ops/stft.py stft_segmented); "pallas": the fused VMEM
    # kernel (ops/pallas/logmel_kernel.py); "never": gather-based stft
    use_fused_kernel: str = "auto"

    @property
    def output_size(self) -> int:
        return self.n_mels

    def _fused_eligible(self) -> bool:
        return (self.use_fused_kernel in ("auto", "pallas")
                and self.win_length in (None, self.n_fft)
                and self.window == "hann" and self.center
                and self.n_fft % self.hop_length == 0
                and self.fmin == 0.0 and self.fmax is None
                and not self.htk and self.log_base is None)

    def __call__(self, speech: jnp.ndarray, lengths: jnp.ndarray):
        """(B, S) float wave, (B,) int -> (B, T, n_mels), (B,) feat lengths."""
        if self._fused_eligible() and self.use_fused_kernel == "pallas" \
                and jax.default_backend() == "tpu":
            from espnet_tpu.ops.pallas.logmel_kernel import fused_logmel
            T = (speech.shape[1] + 2 * (self.n_fft // 2)
                 - self.n_fft) // self.hop_length + 1
            feats = fused_logmel(speech, fs=self.fs, n_fft=self.n_fft,
                                 hop_length=self.hop_length,
                                 n_mels=self.n_mels)[:, :T]
            olens = ((lengths + 2 * (self.n_fft // 2) - self.n_fft)
                     // self.hop_length + 1).astype(jnp.int32)
        elif self._fused_eligible():
            real, imag = stft_segmented(speech, n_fft=self.n_fft,
                                        hop_length=self.hop_length)
            power = real * real + imag * imag
            feats = log_mel(power, fs=self.fs, n_fft=self.n_fft,
                            n_mels=self.n_mels, fmin=self.fmin,
                            fmax=self.fmax, htk=self.htk,
                            log_base=self.log_base)
            olens = ((lengths + 2 * (self.n_fft // 2) - self.n_fft)
                     // self.hop_length + 1).astype(jnp.int32)
        else:
            power, olens = stft_power(
                speech, lengths, n_fft=self.n_fft,
                win_length=self.win_length, hop_length=self.hop_length,
                window=self.window, center=self.center)
            feats = log_mel(power, fs=self.fs, n_fft=self.n_fft,
                            n_mels=self.n_mels, fmin=self.fmin,
                            fmax=self.fmax, htk=self.htk,
                            log_base=self.log_base)
        feats = mask_fill(feats, make_non_pad_mask(olens, feats.shape[1]))
        return feats, olens


@dataclasses.dataclass(frozen=True)
class GlobalMVN:
    """Global mean-variance normalization from collected stats.

    Contract: espnet2/layers/global_mvn.py:13-40 — stats npz with keys
    count/sum/sum_square (or Kaldi 2-row stats matrix).
    """

    mean: np.ndarray  # (D,)
    istd: np.ndarray  # (D,)
    norm_means: bool = True
    norm_vars: bool = True

    @classmethod
    def from_stats(cls, count, sum_, sum_square, norm_means=True, norm_vars=True,
                   eps: float = 1e-20):
        mean = sum_ / count
        var = np.maximum(sum_square / count - mean * mean, eps)
        return cls(mean=mean.astype(np.float32),
                   istd=(1.0 / np.sqrt(var)).astype(np.float32),
                   norm_means=norm_means, norm_vars=norm_vars)

    @classmethod
    def from_file(cls, path, norm_means=True, norm_vars=True):
        d = np.load(path)
        return cls.from_stats(d["count"], d["sum"], d["sum_square"],
                              norm_means, norm_vars)

    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray | None = None):
        if self.norm_means:
            x = x - jnp.asarray(self.mean)
        if self.norm_vars:
            x = x * jnp.asarray(self.istd)
        if lengths is not None:
            x = mask_fill(x, make_non_pad_mask(lengths, x.shape[1]))
        return x, lengths

    def inverse(self, x: jnp.ndarray, lengths: jnp.ndarray | None = None):
        if self.norm_vars:
            x = x / jnp.asarray(self.istd)
        if self.norm_means:
            x = x + jnp.asarray(self.mean)
        if lengths is not None:
            x = mask_fill(x, make_non_pad_mask(lengths, x.shape[1]))
        return x, lengths


@dataclasses.dataclass(frozen=True)
class UtteranceMVN:
    """Per-utterance MVN (espnet2/layers/utterance_mvn.py behavior)."""

    norm_means: bool = True
    norm_vars: bool = False
    eps: float = 1.0e-20

    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        mask = make_non_pad_mask(lengths, x.shape[1])[:, :, None]
        n = jnp.maximum(lengths[:, None, None].astype(x.dtype), 1.0)
        mean = jnp.sum(jnp.where(mask, x, 0.0), axis=1, keepdims=True) / n
        if self.norm_means:
            x = jnp.where(mask, x - mean, 0.0)
            if self.norm_vars:
                var = jnp.sum(jnp.where(mask, x * x, 0.0), axis=1,
                              keepdims=True) / n
                x = x * jax.lax.rsqrt(jnp.maximum(var, self.eps))
            return x, lengths
        if self.norm_vars:
            # reference utterance_mvn.py: var from centered x, but the
            # scaling applies to x directly (no centering, mean not
            # restored) when norm_means=False
            var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0), axis=1,
                          keepdims=True) / n
            x = jnp.where(mask, x * jax.lax.rsqrt(
                jnp.maximum(var, self.eps)), 0.0)
        return x, lengths
