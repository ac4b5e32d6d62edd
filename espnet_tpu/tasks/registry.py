"""Task name registry (espnet2's 29 task-module inventory, one import
point — used by the multirun driver, bin/launch.py and pack tooling).

Imports are lazy per access so `registry` stays cheap to import.
"""

from __future__ import annotations

import importlib
from typing import Dict, Tuple

#: task name -> (module, class). Names match the reference bin names
#: (espnet2/bin/<name>_train.py).
_TASK_SPECS: Dict[str, Tuple[str, str]] = {
    "asr": ("espnet_tpu.tasks.asr", "ASRTask"),
    "asr_transducer": ("espnet_tpu.tasks.asr_transducer",
                       "ASRTransducerTask"),
    "lm": ("espnet_tpu.tasks.lm", "LMTask"),
    "tts": ("espnet_tpu.tasks.tts", "TTSTask"),
    "tts2": ("espnet_tpu.tasks.tts2", "TTS2Task"),
    "gan_tts": ("espnet_tpu.tasks.gan_tts", "GANTTSTask"),
    "gan_vocoder": ("espnet_tpu.tasks.gan_tts", "GANVocoderTask"),
    "enh": ("espnet_tpu.tasks.enh", "EnhancementTask"),
    "enh_s2t": ("espnet_tpu.tasks.enh", "EnhS2TTask"),
    "enh_tse": ("espnet_tpu.tasks.enh", "EnhTSETask"),
    "st": ("espnet_tpu.tasks.st", "STTask"),
    "mt": ("espnet_tpu.tasks.st", "MTTask"),
    "slu": ("espnet_tpu.tasks.misc", "SLUTask"),
    "s2t": ("espnet_tpu.tasks.misc", "S2TTask"),
    "s2t_ctc": ("espnet_tpu.tasks.misc", "S2TCTCTask"),
    "s2st": ("espnet_tpu.tasks.s2st", "S2STTask"),
    "speechlm": ("espnet_tpu.tasks.speechlm", "SpeechLMTask"),
    "spk": ("espnet_tpu.tasks.spk", "SpeakerTask"),
    "diar": ("espnet_tpu.tasks.spk", "DiarizationTask"),
    "cls": ("espnet_tpu.tasks.spk", "ClassificationTask"),
    "lid": ("espnet_tpu.tasks.spk", "LIDTask"),
    "asvspoof": ("espnet_tpu.tasks.misc", "ASVSpoofTask"),
    "uasr": ("espnet_tpu.tasks.uasr", "UASRTask"),
    "svs": ("espnet_tpu.tasks.svs", "SVSTask"),
    "gan_svs": ("espnet_tpu.tasks.svs", "GANSVSTask"),
    "hubert": ("espnet_tpu.tasks.ssl", "HubertTask"),
    "ssl": ("espnet_tpu.tasks.ssl", "HubertTask"),
    "beats": ("espnet_tpu.tasks.ssl", "BeatsTask"),
    "gan_codec": ("espnet_tpu.tasks.ssl", "CodecTask"),
}


class _LazyTasks:
    def __getitem__(self, name: str):
        try:
            mod, cls = _TASK_SPECS[name]
        except KeyError:
            raise KeyError(f"unknown task {name!r}; known: "
                           f"{sorted(_TASK_SPECS)}") from None
        return getattr(importlib.import_module(mod), cls)

    def __contains__(self, name):
        return name in _TASK_SPECS

    def __iter__(self):
        return iter(_TASK_SPECS)

    def keys(self):
        return _TASK_SPECS.keys()


TASKS = _LazyTasks()
