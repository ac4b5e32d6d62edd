"""VAD + dialogue cascade tests."""

import numpy as np

from espnet_tpu.bin.sds_demo import DialogueSystem
from espnet_tpu.ops.vad import energy_vad


def test_energy_vad():
    fs = 8000
    sil = np.zeros(int(0.3 * fs), np.float32)
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(int(0.4 * fs)) / fs)
    x = np.concatenate([sil, tone.astype(np.float32), sil])
    frames, segs = energy_vad(x, fs)
    assert len(segs) == 1
    s, e = segs[0]
    assert 0.2 < s < 0.4 and 0.6 < e <= 1.1


def test_dialogue_cascade():
    # fake ASR/TTS: interfaces only
    class FakeS2T:
        def __call__(self, speech):
            return [[("HELLO", ["H"], [1], 0.0)]]

    class FakeT2S:
        def __call__(self, text):
            return {"wav": np.ones(100, np.float32) * 0.1}

    ds = DialogueSystem(FakeS2T(), FakeT2S(),
                        response_fn=lambda t: f"YOU SAID {t}", fs=8000)
    fs = 8000
    tone = 0.5 * np.sin(2 * np.pi * 300 * np.arange(4000) / fs)
    out = ds(tone.astype(np.float32))
    assert out["asr_text"] == "HELLO"
    assert out["response_text"] == "YOU SAID HELLO"
    assert len(out["response_wav"]) == 100
