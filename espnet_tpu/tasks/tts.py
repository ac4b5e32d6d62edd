"""TTS task (espnet2/tasks/tts.py contract): text+speech(+durations/
pitch/energy) -> FastSpeech2; GAN vocoder task for HiFiGAN."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.data.preprocessor import CommonPreprocessor
from espnet_tpu.models.tts.model import TTSModel
from espnet_tpu.tasks.abs_task import AbsTask
from espnet_tpu.tasks.asr import read_token_list


class TTSTask(AbsTask):
    name = "tts"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,
            "token_type": "char",
            "feats_extract": "fbank",
            "feats_extract_conf": {"fs": 22050, "n_fft": 1024,
                                   "hop_length": 256, "n_mels": 80},
            "normalize": None,
            "tts": "fastspeech2",
            "tts_conf": {},
            "spk_num": 0,     # >0: sids speaker conditioning (utt2spk)
        }

    @classmethod
    def build_model(cls, cfg: Dict[str, Any],
                    stats_dir: Optional[str] = None) -> TTSModel:
        token_list = read_token_list(cfg["token_list"])
        stats = None
        if cfg.get("normalize") == "global_mvn" and cfg.get("stats_file"):
            from espnet_tpu.frontends.default import GlobalMVN
            stats = GlobalMVN.from_file(cfg["stats_file"])
        tts_conf = dict(cfg.get("tts_conf") or {})
        if cfg.get("spk_num") and cfg.get("tts",
                                          "fastspeech2") == "fastspeech2":
            tts_conf.setdefault("spk_num", int(cfg["spk_num"]))
        return TTSModel(
            vocab_size=len(token_list),
            token_list=tuple(token_list),
            feats_conf=dict(cfg.get("feats_extract_conf") or {}),
            tts=cfg.get("tts", "fastspeech2"),
            tts_conf=tts_conf,
            normalize_stats=stats)

    @classmethod
    def build_preprocess_fn(cls, cfg: Dict[str, Any], train: bool):
        if cfg.get("token_list") is None:
            return None
        return CommonPreprocessor(
            train=train, token_type=cfg.get("token_type", "char"),
            token_list=read_token_list(cfg["token_list"]),
            bpemodel=cfg.get("bpemodel"),
            g2p_type=cfg.get("g2p"),
            text_cleaner=cfg.get("cleaner"))

    @classmethod
    def model_rng_names(cls):
        return ("dropout", "prenet", "diffusion")

    @classmethod
    def example_batch(cls, cfg: Dict[str, Any]) -> Dict[str, np.ndarray]:
        hop = (cfg.get("feats_extract_conf") or {}).get("hop_length", 256)
        b = {
            "text": np.ones((1, 6), np.int32),
            "text_lengths": np.asarray([6], np.int32),
            "speech": np.zeros((1, hop * 24), np.float32),
            "speech_lengths": np.asarray([hop * 24], np.int32),
            "durations": np.full((1, 6), 4, np.int32),
            "durations_lengths": np.asarray([6], np.int32),
        }
        if cfg.get("spk_num"):
            b["sids"] = np.zeros((1, 1), np.int32)
        return b
