"""Energy-based voice activity detection.

Behavioral contract: the VAD stage of the spoken dialogue system
(espnet2/sds/vad/webrtc_vad.py role — frame-level speech/nonspeech
decisions with hangover smoothing). Pure numpy (host-side, streaming
friendly).
"""

from __future__ import annotations

import numpy as np


def energy_vad(speech: np.ndarray, fs: int = 16000,
               frame_ms: float = 30.0, threshold_db: float = -35.0,
               hangover_frames: int = 8):
    """-> (frame_decisions bool array, segments [(start_s, end_s)])."""
    frame = max(int(fs * frame_ms / 1000), 1)
    n = len(speech) // frame
    if n == 0:
        return np.zeros(0, bool), []
    x = speech[:n * frame].reshape(n, frame)
    rms = np.sqrt(np.mean(x ** 2, axis=1) + 1e-12)
    db = 20 * np.log10(rms + 1e-12)
    active = db > threshold_db
    # hangover: keep active for a few frames after speech ends
    out = active.copy()
    run = 0
    for i in range(n):
        if active[i]:
            run = hangover_frames
        elif run > 0:
            out[i] = True
            run -= 1
    segments = []
    start = None
    for i, a in enumerate(out):
        if a and start is None:
            start = i
        elif not a and start is not None:
            segments.append((start * frame / fs, i * frame / fs))
            start = None
    if start is not None:
        segments.append((start * frame / fs, n * frame / fs))
    return out, segments
