"""Prompt-based S2T inference via a pretrained HF audio-text LLM
(contract: espnet2/bin/ps2st_inference.py — Qwen2-Audio-style
prompted decoding: audio + text prompt in, text out).

Offline environment: hub weights are NOT downloadable, so this wraps a
LOCAL pretrained directory through `transformers` (torch CPU backend —
the audio LLM families have no flax port). Without a local model the
constructor raises a clear error instead of hanging on a download.
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np


class PromptedSpeech2Text:
    def __init__(self, model_dir: str, prompt: str = "Transcribe: ",
                 max_new_tokens: int = 128):
        try:
            from transformers import (AutoModelForSeq2SeqLM,
                                      AutoProcessor)
            self.processor = AutoProcessor.from_pretrained(
                model_dir, local_files_only=True)
            self.model = AutoModelForSeq2SeqLM.from_pretrained(
                model_dir, local_files_only=True)
        except Exception as e:
            raise RuntimeError(
                f"could not load a local HF audio-text model from "
                f"{model_dir!r} (offline environment: hub names are not "
                f"downloadable; point model_dir at a saved local "
                f"checkout)") from e
        self.prompt = prompt
        self.max_new_tokens = max_new_tokens

    def __call__(self, speech: np.ndarray, fs: int = 16000,
                 prompt: Optional[str] = None) -> str:
        inputs = self.processor(
            text=(prompt or self.prompt), audios=np.asarray(speech),
            sampling_rate=fs, return_tensors="pt")
        out = self.model.generate(**inputs,
                                  max_new_tokens=self.max_new_tokens)
        return self.processor.batch_decode(out,
                                           skip_special_tokens=True)[0]


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    PromptedSpeech2Text(**kw)


if __name__ == "__main__":
    main()
