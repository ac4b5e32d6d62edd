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
    name = "s2t"


class ASVSpoofTask(ClassificationTask):
    name = "asvspoof"

    @classmethod
    def task_defaults(cls):
        d = super().task_defaults()
        d["n_classes"] = 2
        return d


from espnet_tpu.tasks.svs import SVSTask  # noqa: F401,E402 — real task
# (was a bare TTSTask alias in round 1; see tasks/svs.py)
