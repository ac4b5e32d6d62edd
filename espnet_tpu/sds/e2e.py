"""End-to-end speech-to-speech dialogue (espnet2/sds/end_to_end/
mini_omni_e2e.py:20 role): user speech -> discrete codec units ->
SpeechLM continuation -> codec decode -> response speech. No external
LLM — the in-repo SpeechLM over in-repo codec units IS the E2E model,
the same modeling shape as mini-omni's audio-token LM.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class SpeechLMCodecE2E:
    """Wraps SpeechLMInference for the session protocol:
    set_user_audio(wav) -> transcript placeholder ('' — E2E produces no
    text), respond_audio() -> response waveform continuation."""

    def __init__(self, train_config=None, model_file=None,
                 codec_train_config=None, codec_model_file=None,
                 steps: Optional[int] = None, temperature: float = 1.0,
                 topk: int = 30, max_prompt_s: float = 4.0,
                 fs: int = 16000):
        from espnet_tpu.bin.speechlm_inference import SpeechLMInference
        self.slm = SpeechLMInference(
            train_config=train_config, model_file=model_file,
            codec_train_config=codec_train_config,
            codec_model_file=codec_model_file,
            temperature=temperature, topk=topk)
        self.steps = steps
        self.fs = fs
        self.max_prompt = int(max_prompt_s * fs)
        self._pending: Optional[np.ndarray] = None

    def warmup(self):
        """mini_omni_e2e.py:72 contract: trace/compile with a dummy."""
        self.set_user_audio(np.zeros((self.fs // 2,), np.float32))
        self.respond_audio()
        self._pending = None

    def set_user_audio(self, wav: np.ndarray) -> str:
        self._pending = np.asarray(wav, np.float32)[-self.max_prompt:]
        return ""        # E2E path emits audio, not a transcript

    def respond_audio(self) -> np.ndarray:
        if self._pending is None or not len(self._pending):
            return np.zeros((0,), np.float32)
        res = self.slm("audio_continuation", speech=self._pending,
                       steps=self.steps)
        self._pending = None
        wav = res.get("wav")
        if wav is None:
            return np.zeros((0,), np.float32)
        return np.asarray(wav, np.float32)

    def forward(self, wav: np.ndarray) -> np.ndarray:
        """One-shot speech->speech (mini_omni_e2e.py:110 forward)."""
        self.set_user_audio(wav)
        return self.respond_audio()
