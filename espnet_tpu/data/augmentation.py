"""Waveform data-augmentation effect registry.

Behavioral contract: espnet2/layers/augmentation.py (DataAugmentation) —
a bank of named waveform effects, a random subset of which (sampled by
weight) is applied per utterance during preprocessing. The reference
delegates DSP to torchaudio.functional; here each effect is a small
numpy routine (host-side, like the rest of CommonPreprocessor's
augmentation — SpecAug stays on-device).

Effects: lowpass / highpass / bandpass / bandreject (windowed-sinc FIR),
preemphasis / deemphasis, clipping, contrast, polarity_inverse, reverse,
pitch_shift (resample + crop), time_stretch (phase-free WSOLA-lite),
bandwidth_limitation (down/up resample).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _sinc_fir(cutoff: float, fs: float, taps: int = 101,
              highpass: bool = False) -> np.ndarray:
    n = np.arange(taps) - (taps - 1) / 2
    f = cutoff / fs
    h = 2 * f * np.sinc(2 * f * n)
    h *= np.hamming(taps)
    h /= np.sum(h)
    if highpass:
        g = -h
        g[(taps - 1) // 2] += 1.0
        return g
    return h


def _fir(w: np.ndarray, h: np.ndarray) -> np.ndarray:
    return np.convolve(w, h, mode="same").astype(np.float32)


def lowpass_filtering(w, fs=16000, cutoff=1000.0):
    return _fir(w, _sinc_fir(cutoff, fs))


def highpass_filtering(w, fs=16000, cutoff=3000.0):
    return _fir(w, _sinc_fir(cutoff, fs, highpass=True))


def bandpass_filtering(w, fs=16000, low=300.0, high=3400.0):
    return lowpass_filtering(highpass_filtering(w, fs, low), fs, high)


def bandreject_filtering(w, fs=16000, low=300.0, high=3400.0):
    return (w - bandpass_filtering(w, fs, low, high)).astype(np.float32)


def preemphasis(w, fs=16000, coeff=0.97):
    out = np.copy(w)
    out[1:] = w[1:] - coeff * w[:-1]
    return out.astype(np.float32)


def deemphasis(w, fs=16000, coeff=0.97):
    out = np.copy(w)
    for i in range(1, len(out)):
        out[i] += coeff * out[i - 1]
    return out.astype(np.float32)


def clipping(w, fs=16000, min_quantile=0.06, max_quantile=0.9):
    lo = np.quantile(w, min_quantile)
    hi = np.quantile(w, max_quantile)
    return np.clip(w, lo, hi).astype(np.float32)


def contrast(w, fs=16000, enhancement_amount=75.0):
    # torchaudio.functional.contrast formula
    ca = enhancement_amount / 750.0
    return np.sin(np.pi / 2 * w + ca * np.sin(2 * np.pi * w)
                  ).astype(np.float32)


def polarity_inverse(w, fs=16000):
    return (-w).astype(np.float32)


def reverse(w, fs=16000):
    return w[::-1].astype(np.float32)


def _resample_linear(w, factor: float) -> np.ndarray:
    n_out = max(int(round(len(w) / factor)), 1)
    src = np.linspace(0.0, len(w) - 1, n_out)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, len(w) - 1)
    frac = (src - i0).astype(np.float32)
    return (w[i0] * (1 - frac) + w[i1] * frac).astype(np.float32)


def _ola_time_stretch(w, rate: float, win: int = 1024) -> np.ndarray:
    """Pitch-preserving time stretch via overlap-add (SOLA without the
    offset search): hann windows taken at analysis hop `Hs*rate` are
    overlap-added at synthesis hop `Hs`.  Local waveform periodicity
    (hence pitch) is preserved; only the frame timeline is re-spaced.
    Output length ~ len(w)/rate."""
    if len(w) <= win:
        return _resample_linear(w, rate)  # too short to frame
    hs = win // 2
    ha = hs * rate
    n_frames = max(int((len(w) - win) / ha) + 1, 1)
    window = np.hanning(win).astype(np.float32)
    n_out = (n_frames - 1) * hs + win
    out = np.zeros(n_out, np.float32)
    norm = np.zeros(n_out, np.float32)
    for k in range(n_frames):
        a = int(round(k * ha))
        a = min(a, len(w) - win)
        seg = w[a:a + win] * window
        out[k * hs:k * hs + win] += seg
        norm[k * hs:k * hs + win] += window
    return (out / np.maximum(norm, 1e-3)).astype(np.float32)


def pitch_shift(w, fs=16000, semitones=2.0):
    """Pitch shift preserving duration (torchaudio pitch_shift contract):
    OLA time-stretch by `factor` (pitch unchanged, duration*factor), then
    linear-resample back to the original duration (pitch*factor).

    The previous resample-then-resample version composed to ~identity
    (ADVICE r2): two pure resamplings cancel, so no pitch change."""
    factor = 2.0 ** (semitones / 12.0)
    stretched = _ola_time_stretch(w, 1.0 / factor)
    out = _resample_linear(stretched, len(stretched) / len(w))
    if len(out) < len(w):
        out = np.pad(out, (0, len(w) - len(out)))
    return out[:len(w)]


def time_stretch(w, fs=16000, factor=1.1):
    return _resample_linear(w, factor)


def bandwidth_limitation(w, fs=16000, target_fs=8000):
    down = _resample_linear(lowpass_filtering(w, fs, target_fs / 2 * 0.9),
                            fs / target_fs)
    return _resample_linear(down, target_fs / fs)[:len(w)]


EFFECTS = {
    "lowpass": lowpass_filtering,
    "highpass": highpass_filtering,
    "bandpass": bandpass_filtering,
    "bandreject": bandreject_filtering,
    "preemphasis": preemphasis,
    "deemphasis": deemphasis,
    "clipping": clipping,
    "contrast": contrast,
    "polarity_inverse": polarity_inverse,
    "reverse": reverse,
    "pitch_shift": pitch_shift,
    "time_stretch": time_stretch,
    "bandwidth_limitation": bandwidth_limitation,
}


class DataAugmentation:
    """Apply `num_effects_per_utt` weighted-sampled effects per call
    (augmentation.py:33 DataAugmentation contract).

    effects: list of (weight, name, kwargs) triples (a flat registry of
    the reference's nested spec)."""

    def __init__(self, effects: Sequence, apply_n: Sequence[int] = (1, 1),
                 fs: int = 16000, seed: int = 0):
        self.effects: List[Tuple[float, str, Dict]] = []
        for e in effects:
            if isinstance(e, (list, tuple)) and len(e) == 3:
                w, name, kw = e
            else:
                w, name, kw = 1.0, e, {}
            if name not in EFFECTS:
                raise ValueError(f"unknown effect {name!r}")
            self.effects.append((float(w), name, dict(kw or {})))
        self.apply_n = (int(apply_n[0]), int(apply_n[-1]))
        self.fs = fs
        self.rng = np.random.RandomState(seed)

    def __call__(self, waveform: np.ndarray,
                 fs: Optional[int] = None) -> np.ndarray:
        fs = fs or self.fs
        lo, hi = self.apply_n
        n = self.rng.randint(lo, hi + 1) if hi > lo else lo
        weights = np.asarray([w for w, _, _ in self.effects], np.float64)
        probs = weights / weights.sum()
        idx = self.rng.choice(len(self.effects), size=min(n, len(probs)),
                              replace=False, p=probs)
        out = np.asarray(waveform, np.float32)
        for i in idx:
            _, name, kw = self.effects[i]
            out = EFFECTS[name](out, fs, **kw)
        return out.astype(np.float32)
