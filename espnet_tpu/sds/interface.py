"""SDS module-selection interface (espnet2/sds/espnet_model.py:27
ESPnetSDSModelInterface — handle_ASR/TTS/LLM/E2E_selection contract).

Builds the callables a DialogueSession consumes from registered option
names; options resolve lazily so constructing the interface is cheap.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np


class SDSInterface:
    """Registry-backed cascade/E2E builder.

    ASR options:  'speech2text' (trained config dirs via kwargs)
    TTS options:  'text2speech', 'griffin_lim'
    LLM options:  'echo' (identity), 'reverse' (demo), callable
    E2E option:   'speechlm_codec' (sds/e2e.py path)
    """

    def __init__(self):
        self.asr_options: Dict[str, Callable] = {}
        self.tts_options: Dict[str, Callable] = {}
        self.llm_options: Dict[str, Callable] = {
            "echo": lambda: (lambda text, history: text),
            "reverse": lambda: (
                lambda text, history: " ".join(reversed(text.split()))),
        }
        self.e2e_options: Dict[str, Callable] = {}
        self._register_defaults()

    def _register_defaults(self):
        def make_s2t(**kw):
            from espnet_tpu.bin.asr_inference import Speech2Text
            s2t = Speech2Text(**kw)

            def fn(wav: np.ndarray) -> str:
                if not len(wav):
                    return ""
                nb = s2t(np.asarray(wav, np.float32)[None],
                         np.asarray([len(wav)], np.int32))
                return nb[0][0][0]

            return fn

        def make_t2s(**kw):
            from espnet_tpu.bin.tts_inference import Text2Speech
            t2s = Text2Speech(**kw)

            def fn(text: str) -> np.ndarray:
                if not text:
                    return np.zeros((0,), np.float32)
                return np.asarray(t2s(text)["wav"], np.float32)

            return fn

        self.asr_options["speech2text"] = make_s2t
        self.tts_options["text2speech"] = make_t2s

        def make_e2e(**kw):
            from espnet_tpu.sds.e2e import SpeechLMCodecE2E
            return SpeechLMCodecE2E(**kw)

        self.e2e_options["speechlm_codec"] = make_e2e

    # handle_*_selection contract (espnet_model.py:92,120,144,182) ------
    def handle_ASR_selection(self, option: str, **kw) -> Callable:
        return self.asr_options[option](**kw)

    def handle_TTS_selection(self, option: str, **kw) -> Callable:
        return self.tts_options[option](**kw)

    def handle_LLM_selection(self, option, **kw) -> Callable:
        if callable(option):
            return option
        return self.llm_options[option](**kw)

    def handle_E2E_selection(self, option: str = "speechlm_codec", **kw):
        return self.e2e_options[option](**kw)

    def build_session(self, asr: str = "speech2text",
                      tts: str = "text2speech", llm="echo",
                      e2e: Optional[str] = None,
                      asr_kw=None, tts_kw=None, llm_kw=None, e2e_kw=None,
                      **session_kw):
        """-> DialogueSession (cascade) or E2E-backed session."""
        from espnet_tpu.sds.session import DialogueSession
        if e2e is not None:
            model = self.handle_E2E_selection(e2e, **(e2e_kw or {}))
            return DialogueSession(
                asr_fn=lambda wav: model.set_user_audio(wav),
                respond_fn=lambda text, hist: text,
                tts_fn=lambda _txt: model.respond_audio(),
                **session_kw)
        return DialogueSession(
            asr_fn=self.handle_ASR_selection(asr, **(asr_kw or {})),
            tts_fn=self.handle_TTS_selection(tts, **(tts_kw or {})),
            respond_fn=self.handle_LLM_selection(llm, **(llm_kw or {})),
            **session_kw)
