"""Thin task variants sharing the ASR/classification machinery.

- SLUTask: spoken language understanding — the reference trains SLU as
  seq2seq over transcript+intent token streams (espnet2/slu/); the model
  IS the ASR hybrid, so the task reuses ASRTask with its own name, and
  `Speech2Understand` (bin/slu_inference.py contract) aliases
  Speech2Text.
- S2TTask: OWSM-style multitask (espnet2/s2t/espnet_model.py): language/
  task/timestamp condition tokens live IN the token stream (the
  preprocessor emits them), so the hybrid CTC/attention model is reused
  unchanged; `text_prev` conditioning is modeled as ordinary prefix
  tokens.
- ASVSpoofTask: binary spoof detection = 2-class classification
  (espnet2/asvspoof/).
- SVSTask: singing voice synthesis on FastSpeech2 with score-derived
  durations/pitch (espnet2/svs/ naive path; VISinger-class models later).
"""

from __future__ import annotations

from espnet_tpu.tasks.asr import ASRTask
from espnet_tpu.tasks.spk import ClassificationTask
from espnet_tpu.tasks.tts import TTSTask


class SLUTask(ASRTask):
    name = "slu"


class S2TTask(ASRTask):
    """OWSM-style multitask S2T (espnet2/tasks/s2t.py): the model is the
    prev-conditioned S2TModel; text/text_prev/text_ctc share one
    tokenizer (S2TPreprocessor role); <sop>/<na> ids resolve from the
    token list when present."""

    name = "s2t"

    @classmethod
    def build_model(cls, cfg, stats_dir=None):
        from espnet_tpu.models.s2t import S2TModel
        from espnet_tpu.tasks.asr import read_token_list
        base = super().build_model(cfg, stats_dir)
        token_list = read_token_list(cfg["token_list"])
        kw = {f.name: getattr(base, f.name)
              for f in base.__dataclass_fields__.values()
              if f.name not in ("parent", "name")}
        kw["sop"] = token_list.index("<sop>") if "<sop>" in token_list \
            else None
        kw["na"] = token_list.index("<na>") if "<na>" in token_list else None
        return S2TModel(**kw)

    @classmethod
    def build_preprocess_fn(cls, cfg, train):
        fn = super().build_preprocess_fn(cfg, train)
        if fn is not None:
            fn.text_names = ("text", "text_prev", "text_ctc")
        return fn

    @classmethod
    def example_batch(cls, cfg):
        import numpy as np
        b = super().example_batch(cfg)
        b["text_prev"] = np.zeros((1, 4), np.int32)
        b["text_prev_lengths"] = np.asarray([4], np.int32)
        b["text_ctc"] = np.zeros((1, 8), np.int32)
        b["text_ctc_lengths"] = np.asarray([8], np.int32)
        return b


class ASVSpoofTask(ClassificationTask):
    name = "asvspoof"

    @classmethod
    def task_defaults(cls):
        d = super().task_defaults()
        d["n_classes"] = 2
        return d


from espnet_tpu.tasks.svs import SVSTask  # noqa: F401,E402 — real task
# (was a bare TTSTask alias in round 1; see tasks/svs.py)
