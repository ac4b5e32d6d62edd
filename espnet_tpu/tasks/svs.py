"""Singing voice synthesis task.

Behavioral contract: espnet2/tasks/svs.py + espnet2/train/
preprocessor.py:1533 SVSPreprocessor — data is (wav.scp, score.scp);
the preprocessor expands score notes into phone/midi/duration streams
(durations in feature frames via fs/hop_length), the model is
XiaoiceSing-class on mel targets.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from espnet_tpu.models.svs import SVSModel
from espnet_tpu.tasks.abs_task import AbsTask
from espnet_tpu.tasks.asr import read_token_list
from espnet_tpu.tasks.gan_tts import GANTTSTask
from espnet_tpu.text.tokenizer import TokenIDConverter


class SVSPreprocessor:
    """score dict -> phone-level (text ids, midi, durations-in-frames).

    Each note contributes its "_"-joined `phn` entries (falling back to
    lyric characters); the note's frame span is split evenly across its
    phones (reference uses HTS-style label timing when available)."""

    def __init__(self, token_list, fs: int = 16000, hop_length: int = 128):
        self.converter = TokenIDConverter(token_list)
        self.fs = fs
        self.hop = hop_length

    def __call__(self, uid: str, data: dict) -> dict:
        out = {k: v for k, v in data.items() if k != "score"}
        score = data["score"]
        phones: List[str] = []
        midi: List[int] = []
        durs: List[int] = []
        for st, et, lyric, note_midi, phn in score["note"]:
            ph_list = [p for p in str(phn).split("_") if p] or \
                ([c for c in str(lyric)] if lyric else ["<rest>"])
            frames = max(int(round((float(et) - float(st)) * self.fs
                                   / self.hop)), 1)
            per = frames // len(ph_list)
            rem = frames - per * len(ph_list)
            for i, p in enumerate(ph_list):
                phones.append(p)
                midi.append(int(note_midi))
                durs.append(per + (1 if i < rem else 0))
        out["text"] = np.asarray(self.converter.tokens2ids(phones),
                                 np.int32)
        out["midi"] = np.asarray(midi, np.int32)
        out["durations"] = np.asarray(durs, np.int32)
        if "speech" in out:
            out["speech"] = np.asarray(out["speech"], np.float32)
        return out


class SVSTask(AbsTask):
    name = "svs"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,
            "feats_extract": "fbank",
            "feats_extract_conf": {"fs": 16000, "n_fft": 512,
                                   "hop_length": 128, "n_mels": 80},
            "svs": "xiaoice",
            "svs_conf": {},
            "normalize": None,
        }

    @classmethod
    def build_model(cls, cfg: Dict[str, Any], stats_dir=None) -> SVSModel:
        token_list = read_token_list(cfg["token_list"])
        stats = None
        if cfg.get("normalize") == "global_mvn" and cfg.get("stats_file"):
            from espnet_tpu.frontends.default import GlobalMVN
            stats = GlobalMVN.from_file(cfg["stats_file"])
        return SVSModel(
            vocab_size=len(token_list),
            token_list=tuple(token_list),
            feats_conf=dict(cfg.get("feats_extract_conf") or {}),
            svs=cfg.get("svs", "xiaoice"),
            svs_conf=dict(cfg.get("svs_conf") or {}),
            normalize_stats=stats)

    @classmethod
    def build_preprocess_fn(cls, cfg: Dict[str, Any], train: bool):
        fc = cfg.get("feats_extract_conf") or {}
        return SVSPreprocessor(
            token_list=read_token_list(cfg["token_list"]),
            fs=fc.get("fs", 16000), hop_length=fc.get("hop_length", 128))

    @classmethod
    def model_rng_names(cls):
        # "prenet" feeds the AR tacotron decoder's always-on prenet
        # dropout (singing_tacotron)
        return ("dropout", "prenet")

    @classmethod
    def example_batch(cls, cfg: Dict[str, Any]) -> Dict[str, np.ndarray]:
        hop = (cfg.get("feats_extract_conf") or {}).get("hop_length", 128)
        return {
            "text": np.ones((1, 6), np.int32),
            "text_lengths": np.asarray([6], np.int32),
            "speech": np.zeros((1, hop * 24), np.float32),
            "speech_lengths": np.asarray([hop * 24], np.int32),
            "midi": np.full((1, 6), 60, np.int32),
            "midi_lengths": np.asarray([6], np.int32),
            "durations": np.full((1, 6), 4, np.int32),
            "durations_lengths": np.asarray([6], np.int32),
        }


class GANSVSTask(GANTTSTask):
    """End-to-end GAN singing-voice synthesis (espnet2/tasks/gan_svs.py):
    the GAN-TTS spine (two optimizers, GANTrainer) with score
    conditioning — SVSPreprocessor expands the score into phone/midi/
    duration streams and the VISinger/VISinger2 generators consume the
    midi notes (prior conditioning; VISinger2 also derives its DDSP F0
    contour from them)."""

    name = "gan_svs"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        d = dict(GANTTSTask.task_defaults())
        d.update(tts="visinger", fs=16000, n_fft=512, hop_length=128)
        return d

    @classmethod
    def build_preprocess_fn(cls, cfg: Dict[str, Any], train: bool):
        from espnet_tpu.tasks.gan_tts import _np_linear_spec
        n_fft, hop = int(cfg["n_fft"]), int(cfg["hop_length"])
        svs_pre = SVSPreprocessor(
            token_list=read_token_list(cfg["token_list"]),
            fs=int(cfg["fs"]), hop_length=hop)

        def fn(uid, data):
            out = svs_pre(uid, data)
            w = np.asarray(out["speech"], np.float32)
            if len(w) < n_fft:
                w = np.pad(w, (0, n_fft - len(w)))
            return {"text": out["text"], "midi": out["midi"],
                    "durations": out["durations"], "speech": w,
                    "spec": _np_linear_spec(w, n_fft, hop)}

        return fn

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        b = dict(GANTTSTask.example_batch(cfg))
        B, L = b["text"].shape
        b["midi"] = np.full((B, L), 60, np.int32)
        b["midi_lengths"] = b["text_lengths"].copy()
        return b
