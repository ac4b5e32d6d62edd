"""SpeechLM task: multi-stream token LM over multimodal sequences.

Behavioral contract: the speechlm task spine
(espnet2/speechlm/bin/train.py + espnet2/tasks/abs_task.py:996-1003
`--multi_task_dataset` JSON mode + speechlm/dataloader/). Two data
modes:

1. `multi_task_dataset: [task1.json, ...]` — prepared dataset JSONs
   (data/speechlm.py) linearized through task templates into global-id
   (T, Q) streams with loss masks; the packed vocabulary is derived
   from `text_token_list` + `codebook_size` + `n_streams`.
2. Plain triples of pre-tokenized npy code arrays (legacy round-2 mode)
   via the normal `*_data_path_and_name_and_type` spine.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.tasks.abs_task import AbsTask


def build_vocab_from_cfg(cfg):
    """SpeechLMVocabulary + text id mapper from a task config."""
    from espnet_tpu.data.speechlm import SpeechLMVocabulary
    tl = cfg.get("text_token_list")
    if isinstance(tl, (str, Path)):
        tokens = [ln for ln in Path(tl).read_text(
            encoding="utf-8").splitlines() if ln]
    else:
        tokens = list(tl or [])
    vocab = SpeechLMVocabulary(
        text_vocab_size=max(len(tokens), 1),
        codebook_size=int(cfg.get("codebook_size", 256)),
        n_streams=int(cfg.get("n_streams", 1)))
    tok2id = {t: i for i, t in enumerate(tokens)}

    def text_to_ids(text: str):
        # char-level with <space>; unknown chars -> id 0
        out = []
        for ch in text.strip():
            key = "<space>" if ch == " " else ch
            out.append(tok2id.get(key, 0))
        return out

    return vocab, text_to_ids


class SpeechLMTask(AbsTask):
    """Multi-stream token LM (speechlm task spine)."""

    name = "speechlm"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "vocab_sizes": [1024],
            "d_model": 256,
            "heads": 4,
            "units": 1024,
            "layers": 4,
            "use_preprocessor": False,
            # multi-task JSON mode (abs_task.py:996 --multi_task_dataset)
            "multi_task_dataset": None,       # [task1.json, ...]
            "valid_multi_task_dataset": None,
            "text_token_list": None,          # path or list
            "codebook_size": 256,
            "n_streams": 1,
            "delay_pattern": True,
        }

    # -- data --------------------------------------------------------------
    @classmethod
    def build_dataset(cls, cfg, train: bool):
        key = "multi_task_dataset" if train else "valid_multi_task_dataset"
        jsons = cfg.get(key)
        if not jsons and not train:
            jsons = cfg.get("multi_task_dataset")
        if jsons:
            from espnet_tpu.data.speechlm import MultiTaskSpeechLMDataset
            vocab, text_to_ids = build_vocab_from_cfg(cfg)
            if not train and cfg.get("valid_multi_task_dataset"):
                jsons = cfg["valid_multi_task_dataset"]
            return MultiTaskSpeechLMDataset(
                jsons, vocab, text_to_ids=text_to_ids,
                delay=cfg.get("delay_pattern", True))
        return super().build_dataset(cfg, train)

    # -- model -------------------------------------------------------------
    @classmethod
    def _vocab_sizes(cls, cfg):
        if cfg.get("multi_task_dataset"):
            vocab, _ = build_vocab_from_cfg(cfg)
            return vocab.vocab_sizes
        return tuple(cfg["vocab_sizes"])

    @classmethod
    def build_model(cls, cfg):
        from espnet_tpu.models.speechlm import SpeechLM
        return SpeechLM(vocab_sizes=cls._vocab_sizes(cfg),
                        d_model=cfg.get("d_model", 256),
                        heads=cfg.get("heads", 4),
                        units=cfg.get("units", 1024),
                        layers=cfg.get("layers", 4))

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        Q = len(cls._vocab_sizes(cfg))
        ex = {"tokens": np.zeros((1, 16, Q), np.int32),
              "token_lengths": np.asarray([16], np.int32)}
        if cfg.get("multi_task_dataset"):
            ex["loss_mask"] = np.ones((1, 16), np.float32)
        return ex

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)
