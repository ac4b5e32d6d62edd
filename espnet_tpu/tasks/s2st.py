"""S2ST and SpeechLM tasks.

Behavioral contract: espnet2/tasks/s2st.py (s2st_type selects the
synthesizer family) and the speechlm task spine (espnet2/speechlm/bin/
train.py). Both reuse the generic AbsTask config -> model -> Trainer
machinery; the model families live in models/s2st.py and
models/speechlm.py.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from espnet_tpu.tasks.abs_task import AbsTask


class S2STTask(AbsTask):
    """s2st_type='discrete_unit': hybrid attention model over target
    codec units (UnitTranslationModel); 'translatotron': direct spectral
    synthesis with aux ASR/ST heads (SpectralS2STModel)."""

    name = "s2st"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "s2st_type": "discrete_unit",
            "unit_vocab_size": 1000,
            "token_list": None,            # only for aux text heads
            "frontend_conf": {"n_fft": 512, "hop_length": 128,
                              "n_mels": 80},
            "encoder": "conformer",
            "encoder_conf": {},
            "decoder_conf": {},
            "synthesizer_conf": {},
            "tgt_feats_conf": None,
            "model_conf": {},
            "use_preprocessor": False,
        }

    @classmethod
    def build_model(cls, cfg):
        mc = dict(cfg.get("model_conf") or {})
        if cfg.get("s2st_type", "discrete_unit") == "translatotron":
            from espnet_tpu.models.s2st import SpectralS2STModel
            return SpectralS2STModel(
                src_vocab_size=mc.get("src_vocab_size", 0),
                tgt_vocab_size=mc.get("tgt_vocab_size", 0),
                frontend_conf=dict(cfg.get("frontend_conf") or {}),
                encoder=cfg.get("encoder", "conformer"),
                encoder_conf=dict(cfg.get("encoder_conf") or {}),
                synthesizer_conf=dict(cfg.get("synthesizer_conf") or {}),
                tgt_feats_conf=cfg.get("tgt_feats_conf"),
                asr_weight=mc.get("asr_weight", 0.3),
                st_weight=mc.get("st_weight", 0.3))
        from espnet_tpu.models.s2st import UnitTranslationModel
        # vocab = units + blank + sos/eos specials
        vocab = cfg.get("unit_vocab_size", 1000) + 2
        return UnitTranslationModel(
            vocab_size=vocab,
            frontend_conf=dict(cfg.get("frontend_conf") or {}),
            encoder=cfg.get("encoder", "conformer"),
            encoder_conf=dict(cfg.get("encoder_conf") or {}),
            decoder_conf=dict(cfg.get("decoder_conf") or {}),
            ctc_weight=mc.get("ctc_weight", 0.3),
            lsm_weight=mc.get("lsm_weight", 0.1))

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        if cfg.get("s2st_type", "discrete_unit") == "translatotron":
            b = {
                "src_speech": np.zeros((1, 2048), np.float32),
                "src_speech_lengths": np.asarray([2048], np.int32),
                "tgt_speech": np.zeros((1, 2048), np.float32),
                "tgt_speech_lengths": np.asarray([2048], np.int32),
            }
            mc = dict(cfg.get("model_conf") or {})
            if mc.get("tgt_vocab_size", 0) > 0:
                b["tgt_text"] = np.zeros((1, 6), np.int32)
                b["tgt_text_lengths"] = np.asarray([6], np.int32)
            if mc.get("src_vocab_size", 0) > 0:
                b["src_text"] = np.zeros((1, 6), np.int32)
                b["src_text_lengths"] = np.asarray([6], np.int32)
            return b
        return {
            "speech": np.zeros((1, 2048), np.float32),
            "speech_lengths": np.asarray([2048], np.int32),
            "text": np.ones((1, 8), np.int32),
            "text_lengths": np.asarray([8], np.int32),
        }

    @classmethod
    def model_rng_names(cls):
        return ("dropout", "prenet")


# SpeechLMTask grew its own module (multi-task JSON dataset mode);
# re-exported here for backward compatibility.
from espnet_tpu.tasks.speechlm import SpeechLMTask  # noqa: E402,F401
