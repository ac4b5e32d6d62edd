"""Spoken dialogue cascade: VAD -> ASR -> response -> TTS.

Behavioral contract: espnet2/sds/ (cascade dialogue demo: VAD + ASR +
LLM + TTS modules; espnet_model.py orchestration). The response module
is pluggable (`response_fn`); without an LLM in this environment the
default echoes the recognized text.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from espnet_tpu.ops.vad import energy_vad


class DialogueSystem:
    def __init__(self, speech2text, text2speech,
                 response_fn: Optional[Callable[[str], str]] = None,
                 fs: int = 16000):
        self.s2t = speech2text
        self.t2s = text2speech
        self.response_fn = response_fn or (lambda text: text)
        self.fs = fs

    def __call__(self, speech: np.ndarray) -> dict:
        """One dialogue turn: audio in -> dict(asr_text, response_text,
        response_wav, segments)."""
        _, segments = energy_vad(speech, self.fs)
        if segments:
            s = int(segments[0][0] * self.fs)
            e = int(segments[-1][1] * self.fs)
            speech = speech[s:e]
        asr_text = self.s2t(speech)[0][0][0] if len(speech) else ""
        response = self.response_fn(asr_text)
        out = self.t2s(response) if response else {"wav": np.zeros(0)}
        return {"asr_text": asr_text, "response_text": response,
                "response_wav": out["wav"],
                "segments": segments}


def build_streaming_session(**kw):
    """Streaming SDS entry (the full subsystem lives in espnet_tpu/sds/:
    event-driven DialogueSession with VAD endpointing + barge-in,
    SDSInterface module selection, SpeechLMCodecE2E end-to-end path)."""
    from espnet_tpu.sds.interface import SDSInterface
    return SDSInterface().build_session(**kw)
