"""GAN vocoder task: two-optimizer training through the full Trainer
(espnet2/tasks/gan_tts.py num_optimizers=2 + gan_trainer contract),
specialized to HiFiGAN-family mel->wav vocoder training.

Data: speech (wav). Random fixed-size segments are cropped per access
in the preprocess fn (the reference crops in the model/collate for
vocoder efficiency); mel targets are computed ON DEVICE inside the GAN
step (one fused program — host stays light on the 1-core machine).
Fixed segment size means every batch has the same shape, so the K-step
dispatch-amortized scan applies cleanly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.gan_vocoder import HiFiGANVocoderGAN
from espnet_tpu.tasks.abs_task import AbsGANTask


def _np_linear_spec(wav: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Host-side linear magnitude spectrogram (the VITS posterior-
    encoder input; computed in preprocess like the reference's
    spectrogram_torch in data prep). (S,) -> (T, n_fft//2+1)."""
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    n = 1 + (max(len(wav) - n_fft, 0)) // hop
    frames = np.stack([wav[i * hop:i * hop + n_fft] for i in range(n)])
    return np.abs(np.fft.rfft(frames * win[None], axis=1)).astype(
        np.float32)


class GANTTSTask(AbsGANTask):
    """End-to-end GAN TTS (espnet2/tasks/gan_tts.py GANTTSTask,
    num_optimizers=2): text + waveform -> VITS adversarial training
    through the full GANTrainer spine. Data = (text, speech) pairs; the
    preprocess fn tokenizes text and computes the linear spectrogram the
    posterior encoder consumes."""

    name = "gan_tts"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "token_list": None,
            "token_type": "char",
            "fs": 22050, "n_fft": 1024, "hop_length": 256, "n_mels": 80,
            "tts": "vits",
            "tts_conf": {},
            "discriminator_conf": {},
            "max_wav_length": 0,       # optional host-side crop (samples)
            "use_preprocessor": True,
        }

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)

    @classmethod
    def build_model(cls, cfg, stats_dir=None):
        from espnet_tpu.tasks.asr import read_token_list
        token_list = read_token_list(cfg["token_list"])
        if cfg.get("tts") == "jets":
            # espnet2/tasks/gan_tts.py tts_choices 'jets' entry: E2E
            # FS2+HiFiGAN with MAS alignment learning — consumes (text,
            # speech) only; mels are featurized on device in the step
            from espnet_tpu.models.tts.jets_gan import JETSGan
            gan = JETSGan(
                vocab_size=len(token_list),
                fs=cfg["fs"], n_fft=cfg["n_fft"],
                hop_length=cfg["hop_length"], n_mels=cfg["n_mels"],
                jets_conf=dict(cfg.get("tts_conf") or {}),
                discriminator_conf=dict(cfg.get("discriminator_conf")
                                        or {}))

            class _JetsAdapter:
                def __init__(self, inner):
                    self.inner = inner
                    self.apply = inner.apply
                    self.decode = inner.decode

                def init(self, rng, **b):
                    return self.inner.init(rng, b["text"],
                                           b["text_lengths"], b["speech"])

            return _JetsAdapter(gan)
        from espnet_tpu.models.tts.vits_gan import VITSGan
        gan = VITSGan(
            vocab_size=len(token_list),
            fs=cfg["fs"], n_fft=cfg["n_fft"],
            hop_length=cfg["hop_length"], n_mels=cfg["n_mels"],
            tts=cfg.get("tts", "vits"),
            vits_conf=dict(cfg.get("tts_conf") or {}),
            discriminator_conf=dict(cfg.get("discriminator_conf") or {}))

        class _Adapter:
            """init(rng, **batch) shim over VITSGan's positional init
            (the AbsGANTask spine contract)."""

            def __init__(self, inner):
                self.inner = inner
                self.apply = inner.apply
                self.decode = inner.decode

            def init(self, rng, **b):
                midi = b.get("midi")
                if midi is not None:
                    midi = midi[:, :b["text"].shape[1]].astype("int32")
                return self.inner.init(
                    rng, b["text"], b["text_lengths"], b["spec"],
                    b["spec_lengths"], b["speech"], midi=midi)

        return _Adapter(gan)

    @classmethod
    def build_preprocess_fn(cls, cfg, train: bool):
        from espnet_tpu.data.preprocessor import CommonPreprocessor
        from espnet_tpu.tasks.asr import read_token_list
        tok = CommonPreprocessor(
            train=train, token_type=cfg.get("token_type", "char"),
            token_list=read_token_list(cfg["token_list"]),
            bpemodel=cfg.get("bpemodel"), g2p_type=cfg.get("g2p"),
            text_cleaner=cfg.get("cleaner"))
        n_fft, hop = int(cfg["n_fft"]), int(cfg["hop_length"])
        max_len = int(cfg.get("max_wav_length") or 0)
        crop_rng = np.random.RandomState(cfg.get("seed", 0))

        need_spec = cfg.get("tts") != "jets"   # jets featurizes on device

        def fn(uid, data):
            out = tok(uid, data)
            w = np.asarray(out["speech"], np.float32)
            if max_len and len(w) > max_len:
                s = crop_rng.randint(0, len(w) - max_len + 1) if train \
                    else 0
                w = w[s:s + max_len]
            if len(w) < n_fft:
                w = np.pad(w, (0, n_fft - len(w)))
            if not need_spec:
                return {"text": out["text"], "speech": w}
            spec = _np_linear_spec(w, n_fft, hop)
            return {"text": out["text"], "speech": w, "spec": spec}

        return fn

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        n_fft, hop = int(cfg["n_fft"]), int(cfg["hop_length"])
        seg_frames = dict(cfg.get("tts_conf") or {}).get(
            "segment_frames", 32)
        T = max(int(seg_frames) + 4, 36)
        S = (T - 1) * hop + n_fft
        return {
            "text": np.ones((2, 8), np.int32),
            "text_lengths": np.asarray([8, 6], np.int32),
            "spec": np.zeros((2, T, n_fft // 2 + 1), np.float32),
            "spec_lengths": np.asarray([T, T - 2], np.int32),
            "speech": np.zeros((2, S), np.float32),
        }


class GANVocoderTask(AbsGANTask):
    name = "gan_vocoder"

    @classmethod
    def task_defaults(cls) -> Dict[str, Any]:
        return {
            "fs": 22050, "n_fft": 1024, "hop_length": 256, "n_mels": 80,
            "generator": "hifigan",
            "generator_conf": {},
            "discriminator_conf": {},
            "segment_size": 8192,
            "batch_type": "unsorted",
            "use_preprocessor": True,
        }

    @classmethod
    def model_rng_names(cls):
        return ("dropout",)

    @classmethod
    def build_model(cls, cfg, stats_dir=None) -> HiFiGANVocoderGAN:
        return HiFiGANVocoderGAN(
            fs=cfg["fs"], n_fft=cfg["n_fft"], hop_length=cfg["hop_length"],
            n_mels=cfg["n_mels"],
            generator=cfg.get("generator", "hifigan"),
            generator_conf=dict(cfg.get("generator_conf") or {}),
            discriminator_conf=dict(cfg.get("discriminator_conf") or {}))

    @classmethod
    def build_preprocess_fn(cls, cfg, train: bool):
        seg = int(cfg["segment_size"])
        hop = int(cfg["hop_length"])
        crop_rng = np.random.RandomState(cfg.get("seed", 0) + (0 if train
                                                               else 1))

        def fn(uid, data):
            w = np.asarray(data["speech"], np.float32)
            feats = data.get("feats")
            if feats is not None:
                # finetune mode: (predicted-mel, wav) pairs — crop an
                # ALIGNED segment on mel-frame boundaries (reference
                # tts.sh teacher-forced vocoder finetuning stage)
                feats = np.asarray(feats, np.float32)
                S = min(len(w) // hop, len(feats)) * hop
                w = w[:S]
                seg_f = seg // hop
                if len(w) < seg:
                    w = np.pad(w, (0, seg - len(w)))
                    feats = np.pad(feats,
                                   ((0, seg_f - len(feats)), (0, 0)),
                                   mode="edge" if len(feats) else
                                   "constant")
                n_f = len(w) // hop
                if train:
                    s_f = crop_rng.randint(0, n_f - seg_f + 1)
                else:
                    s_f = (n_f - seg_f) // 2
                return {"speech": w[s_f * hop:s_f * hop + seg],
                        "feats": feats[s_f:s_f + seg_f]}
            if len(w) < seg:
                w = np.pad(w, (0, seg - len(w)))
            if train:
                s = crop_rng.randint(0, len(w) - seg + 1)
            else:
                s = (len(w) - seg) // 2  # deterministic valid crop
            return {"speech": w[s:s + seg]}

        return fn

    @classmethod
    def example_batch(cls, cfg) -> Dict[str, np.ndarray]:
        b = {"speech": np.zeros((1, int(cfg["segment_size"])),
                                np.float32)}
        triples = list(cfg.get("train_data_path_and_name_and_type") or [])
        if any(",feats," in str(t).replace(" ", "") or
               (isinstance(t, (list, tuple)) and len(t) > 1
                and t[1] == "feats") for t in triples):
            seg_f = int(cfg["segment_size"]) // int(cfg["hop_length"])
            b["feats"] = np.zeros((1, seg_f, int(cfg["n_mels"])),
                                  np.float32)
        return b
