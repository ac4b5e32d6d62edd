"""Synthetic mini corpus for end-to-end tests (mini_an4 analogue,
SURVEY.md §4: CPU-runnable integration recipe).

Each "word" is a pure tone at a distinct frequency; utterances are
random 1-3 word sequences. Learnable by a tiny CTC model in a few steps.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from espnet_tpu.data.fileio import write_wav

WORDS = {"ONE": 400.0, "TWO": 900.0, "THREE": 1800.0}
FS = 8000


def make_corpus(root: Path, n_train: int = 16, n_valid: int = 4, seed=0):
    rng = np.random.RandomState(seed)
    root = Path(root)
    for split, n in (("train", n_train), ("valid", n_valid)):
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        wavdir = d / "wav"
        with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
            for i in range(n):
                words = rng.choice(list(WORDS), size=rng.randint(1, 4))
                sig = []
                for w in words:
                    t = np.arange(int(FS * 0.12)) / FS
                    tone = 0.5 * np.sin(2 * np.pi * WORDS[w] * t)
                    sig += [tone, np.zeros(int(FS * 0.03))]
                x = np.concatenate(sig) + 0.01 * rng.randn(
                    sum(len(s) for s in sig))
                uid = f"{split}_{i:03d}"
                write_wav(wavdir / f"{uid}.wav", FS, x.astype(np.float32))
                fw.write(f"{uid} {wavdir / f'{uid}.wav'}\n")
                ft.write(f"{uid} {' '.join(words)}\n")
    # token list: blank + chars + space + unk + sos/eos
    chars = sorted(set("".join(WORDS)))
    tokens = ["<blank>", "<unk>"] + chars + ["<space>", "<sos/eos>"]
    (root / "tokens.txt").write_text("\n".join(tokens) + "\n")
    return root
