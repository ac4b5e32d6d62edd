"""SPK / diar / cls / lid tasks (espnet2/tasks/{spk,diar,cls,lid}.py)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from espnet_tpu.models.cls import ClassificationModel
from espnet_tpu.models.diar import DiarizationModel
from espnet_tpu.models.spk import SpeakerModel
from espnet_tpu.tasks.abs_task import AbsTask


class SpeakerTask(AbsTask):
    name = "spk"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "n_spk": 2,
            "frontend_conf": {"n_fft": 512, "hop_length": 160, "n_mels": 80},
            "encoder": "ecapa",     # ecapa | rawnet3 | ska_tdnn
            "encoder_conf": {"channels": 128, "num_blocks": 2},
            "embed_dim": 64,
            "model_conf": {"aam_margin": 0.2, "aam_scale": 30.0},
            # AAM margin warmup 0 -> aam_margin over this many epochs
            # (espnet2/train/spk_trainer.py margin-scheduler role)
            "margin_warmup_epochs": 0,
            "use_preprocessor": False,
        }

    @classmethod
    def build_model(cls, cfg, stats_dir=None) -> SpeakerModel:
        mc = dict(cfg.get("model_conf") or {})
        enc = cfg.get("encoder", "ecapa")
        # config deep-merge keeps the ecapa defaults around; restrict the
        # conf to the chosen encoder's actual fields
        import dataclasses

        from espnet_tpu.models.spk import SPK_ENCODERS
        fields = {f.name for f in dataclasses.fields(SPK_ENCODERS[enc])}
        ec = {k: v for k, v in dict(cfg.get("encoder_conf") or {}).items()
              if k in fields}
        return SpeakerModel(
            n_spk=cfg["n_spk"],
            frontend_conf=dict(cfg.get("frontend_conf") or {}),
            encoder_name=enc,
            encoder_conf=ec,
            embed_dim=cfg.get("embed_dim", 192),
            aam_margin=mc.get("aam_margin", 0.2),
            aam_scale=mc.get("aam_scale", 30.0))

    @classmethod
    def batch_extras_fn(cls, cfg):
        warm = int(cfg.get("margin_warmup_epochs") or 0)
        if warm <= 0:
            return None
        final = float(dict(cfg.get("model_conf") or {}).get(
            "aam_margin", 0.2))

        def fn(epoch: int):
            m = final * min(max(epoch - 1, 0) / warm, 1.0)
            return {"margin": np.asarray(m, np.float32)}

        return fn

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {"speech": np.zeros((2, 2048), np.float32),
                "speech_lengths": np.full((2,), 2048, np.int32),
                "spk_labels": np.asarray([0, 1], np.int32)}

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)

    @classmethod
    def build_extra_valid_fn(cls, cfg, model):
        """EER/minDCF over trial pairs every validation epoch
        (espnet2/train/spk_trainer.py validate_one_epoch role).

        cfg['valid_trial'] lines: ``label enroll_uttid test_uttid``;
        cfg['valid_trial_scp'] is the wav.scp the uttids resolve in.
        """
        trial_file = cfg.get("valid_trial")
        scp = cfg.get("valid_trial_scp")
        if not trial_file or not scp:
            return None
        import jax

        from espnet_tpu.data.fileio import SoundScpReader
        from espnet_tpu.utils.eer import compute_eer, compute_min_dcf

        trials = []
        for line in open(trial_file, encoding="utf-8"):
            parts = line.split()
            if len(parts) >= 3:
                trials.append((int(parts[0]), parts[1], parts[2]))
        reader = SoundScpReader(scp)
        utt_ids = sorted({u for _, e, t in trials for u in (e, t)})
        embed = jax.jit(lambda p, s, l: model.apply(
            p, s, l, method=model.extract_embedding))

        def fn(params, epoch):
            from espnet_tpu.data.batching import bucket_length
            embs = {}
            for u in utt_ids:
                _, wav = reader[u]
                wav = np.asarray(wav, np.float32)
                n = len(wav)
                # bucketed pad: one compile per bucket, not per length
                L = bucket_length(n, base=4096, growth=1.3)
                wav = np.pad(wav, (0, L - n))[None]
                e = np.asarray(embed(params, wav,
                                     np.asarray([n], np.int32)))[0]
                embs[u] = e / max(np.linalg.norm(e), 1e-9)
            labels = np.asarray([l for l, _, _ in trials])
            scores = np.asarray([float(embs[e] @ embs[t])
                                 for _, e, t in trials])
            eer, _thr = compute_eer(scores, labels)
            mdcf = compute_min_dcf(scores, labels)
            return {"eer": eer, "min_dcf": mdcf}

        return fn


class DiarizationTask(AbsTask):
    name = "diar"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "num_spk": 2,
            "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
            "encoder": "transformer",
            "encoder_conf": {},
            "use_preprocessor": False,
        }

    @classmethod
    def build_model(cls, cfg, stats_dir=None) -> DiarizationModel:
        return DiarizationModel(
            num_spk=cfg.get("num_spk", 2),
            frontend_conf=dict(cfg.get("frontend_conf") or {}),
            encoder=cfg.get("encoder", "transformer"),
            encoder_conf=dict(cfg.get("encoder_conf") or {}))

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {"speech": np.zeros((1, 4096), np.float32),
                "speech_lengths": np.asarray([4096], np.int32),
                "spk_labels": np.zeros((1, 16, cfg.get("num_spk", 2)),
                                       np.int32)}

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)


class ClassificationTask(AbsTask):
    name = "cls"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "n_classes": 10,
            "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 80},
            "encoder": "transformer",
            "encoder_conf": {},
            "multilabel": False,
            "use_preprocessor": False,
        }

    @classmethod
    def build_model(cls, cfg, stats_dir=None) -> ClassificationModel:
        return ClassificationModel(
            n_classes=cfg["n_classes"],
            frontend_conf=dict(cfg.get("frontend_conf") or {}),
            encoder=cfg.get("encoder", "transformer"),
            encoder_conf=dict(cfg.get("encoder_conf") or {}),
            multilabel=cfg.get("multilabel", False))

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        return {"speech": np.zeros((2, 2048), np.float32),
                "speech_lengths": np.full((2,), 2048, np.int32),
                "label": np.asarray([0, 1], np.int32)}

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)


# language ID == single-label classification over languages
class LIDTask(ClassificationTask):
    name = "lid"
