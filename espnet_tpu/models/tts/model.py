"""TTS task model wrapper: feature extraction + acoustic model.

Behavioral contract: espnet2/tts/espnet_model.py — forward extracts
target feats (LogMelFbank) from speech, optional GlobalMVN, then calls
the acoustic model (FastSpeech2 here) with durations/pitch/energy;
`inference` returns generated features for the vocoder
(bin/tts_inference.py:196 contract).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.frontends.default import DefaultFrontend
from espnet_tpu.models.tts.fastspeech2 import FastSpeech2
from espnet_tpu.models.tts.tacotron2 import Tacotron2


class TTSModel(nn.Module):
    vocab_size: int
    token_list: tuple = ()
    feats_conf: dict = None      # fs/n_fft/hop_length/n_mels
    tts: str = "fastspeech2"
    tts_conf: dict = None
    normalize_stats: Any = None  # GlobalMVN for mels

    def setup(self):
        fc = dict(self.feats_conf or {})
        fc.setdefault("n_mels", 80)
        self._feats = DefaultFrontend(**fc)
        conf = dict(self.tts_conf or {})
        conf.setdefault("odim", fc["n_mels"])
        if self.tts == "fastspeech2":
            self.tts_mod = FastSpeech2(idim=self.vocab_size, **conf)
        elif self.tts == "tacotron2":
            self.tts_mod = Tacotron2(idim=self.vocab_size, **conf)
        elif self.tts == "transformer":
            from espnet_tpu.models.tts.transformer_tts import TransformerTTS
            self.tts_mod = TransformerTTS(idim=self.vocab_size, **conf)
        elif self.tts == "prodiff":
            from espnet_tpu.models.tts.prodiff import ProDiff
            self.tts_mod = ProDiff(idim=self.vocab_size, **conf)
        else:
            raise ValueError(f"unsupported tts model {self.tts}")

    def extract_feats(self, speech, speech_lengths):
        feats, feats_lengths = self._feats(speech, speech_lengths)
        if self.normalize_stats is not None:
            feats, feats_lengths = self.normalize_stats(feats, feats_lengths)
        return feats, feats_lengths

    def __call__(self, text, text_lengths, speech, speech_lengths,
                 durations=None, durations_lengths=None,
                 pitch=None, pitch_lengths=None,
                 energy=None, energy_lengths=None,
                 sids=None, sids_lengths=None, *, deterministic=True):
        del sids_lengths
        feats, feats_lengths = self.extract_feats(speech, speech_lengths)
        if self.tts in ("tacotron2", "transformer"):
            return self.tts_mod(text, text_lengths, feats, feats_lengths,
                                deterministic=deterministic)
        L = text.shape[1]
        if durations is None:
            # uniform-alignment fallback when no teacher/MFA durations are
            # in the data dir (reference recipes supply them via
            # durations.scp; uniform split keeps FS2 trainable for
            # smoke/recipe runs)
            tl = jnp.maximum(text_lengths, 1)
            feats_per_tok = (speech_lengths
                             // (self.feats_conf or {}).get("hop_length", 256)
                             ) // tl
            tok_mask = jnp.arange(L)[None, :] < text_lengths[:, None]
            durations = jnp.where(tok_mask, feats_per_tok[:, None], 0)
        durations = durations.astype(jnp.int32)[:, :L]
        # pitch/energy: given per-token from data, or extracted on the fly
        # (Dio/Energy feats_extract role) and token-averaged by durations
        from espnet_tpu.models.tts.feats import (extract_energy, extract_f0,
                                                 token_average)
        fc = dict(self.feats_conf or {})
        def standardize(x, lens):
            # on-the-fly extraction has no GlobalMVN stats dir (the
            # reference normalizes pitch/energy with their own stats,
            # tasks/tts.py:74-87) -> standardize over the valid region
            m = jnp.arange(x.shape[1])[None, :] < lens[:, None]
            n = jnp.maximum(jnp.sum(m, 1, keepdims=True), 1)
            mean = jnp.sum(jnp.where(m, x, 0.0), 1, keepdims=True) / n
            var = jnp.sum(jnp.where(m, (x - mean) ** 2, 0.0), 1,
                          keepdims=True) / n
            return jnp.where(m, (x - mean) * jax.lax.rsqrt(var + 1e-8), 0.0)

        if pitch is None:
            f0, _ = extract_f0(speech, speech_lengths,
                               fs=fc.get("fs", 16000),
                               frame_length=fc.get("n_fft", 1024),
                               hop_length=fc.get("hop_length", 256))
            T = min(f0.shape[1], feats.shape[1])
            pitch = token_average(f0[:, :T], durations)
            pitch = standardize(pitch, text_lengths)
        if energy is None:
            e, _ = extract_energy(speech, speech_lengths,
                                  n_fft=fc.get("n_fft", 1024),
                                  hop_length=fc.get("hop_length", 256))
            T = min(e.shape[1], feats.shape[1])
            energy = token_average(e[:, :T], durations)
            energy = standardize(energy, text_lengths)
        kw = {}
        if self.tts == "fastspeech2" and sids is not None:
            # collate pads the 1-element sid column to a bucket length
            kw["sids"] = sids[:, 0] if sids.ndim > 1 else sids
        return self.tts_mod(text, text_lengths, feats, feats_lengths,
                            durations, pitch[:, :L], energy[:, :L],
                            deterministic=deterministic, **kw)

    def teacher_forced_mel(self, text, text_lengths, speech,
                           speech_lengths, sids=None):
        """Ground-truth-aligned predicted mel (the reference tts.sh
        'vocoder finetuning with teacher-forced features' stage): run
        the acoustic model with the SAME durations/pitch/energy the
        training forward uses, return (after_postnet_mel, olens) aligned
        frame-for-frame with the ground-truth waveform — the pairs a
        vocoder finetunes on to close the predicted-mel domain gap."""
        if self.tts != "fastspeech2":
            raise NotImplementedError("teacher-forced dump is the "
                                      "fastspeech2 finetune path")
        feats, feats_lengths = self.extract_feats(speech, speech_lengths)
        L = text.shape[1]
        tl = jnp.maximum(text_lengths, 1)
        hop = (self.feats_conf or {}).get("hop_length", 256)
        feats_per_tok = (speech_lengths // hop) // tl
        tok_mask = jnp.arange(L)[None, :] < text_lengths[:, None]
        durations = jnp.where(tok_mask, feats_per_tok[:, None],
                              0).astype(jnp.int32)
        from espnet_tpu.models.tts.feats import (extract_energy,
                                                 extract_f0, token_average)
        fc = dict(self.feats_conf or {})

        def standardize(x, lens):
            m = jnp.arange(x.shape[1])[None, :] < lens[:, None]
            n = jnp.maximum(jnp.sum(m, 1, keepdims=True), 1)
            mean = jnp.sum(jnp.where(m, x, 0.0), 1, keepdims=True) / n
            var = jnp.sum(jnp.where(m, (x - mean) ** 2, 0.0), 1,
                          keepdims=True) / n
            return jnp.where(m, (x - mean) * jax.lax.rsqrt(var + 1e-8),
                             0.0)

        f0, _ = extract_f0(speech, speech_lengths, fs=fc.get("fs", 16000),
                           frame_length=fc.get("n_fft", 1024),
                           hop_length=fc.get("hop_length", 256))
        T = min(f0.shape[1], feats.shape[1])
        pitch = standardize(token_average(f0[:, :T], durations),
                            text_lengths)
        e, _ = extract_energy(speech, speech_lengths,
                              n_fft=fc.get("n_fft", 1024),
                              hop_length=fc.get("hop_length", 256))
        T = min(e.shape[1], feats.shape[1])
        energy = standardize(token_average(e[:, :T], durations),
                             text_lengths)
        _, after, _, _, _, olens = self.tts_mod._forward_core(
            text, text_lengths, durations, pitch[:, :L], energy[:, :L],
            feats.shape[1], deterministic=True, sids=sids)
        if self.normalize_stats is not None:
            after, _ = self.normalize_stats.inverse(after, olens)
        return after, jnp.minimum(olens, feats_lengths)

    def inference(self, text, text_lengths, out_len: Optional[int] = None,
                  speed: float = 1.0, sids=None):
        if self.tts in ("tacotron2", "transformer"):
            mel, olens = self.tts_mod.inference(text, text_lengths,
                                                max_frames=out_len)
        elif self.tts == "fastspeech2" and sids is not None:
            mel, olens = self.tts_mod.inference(text, text_lengths,
                                                out_len=out_len, speed=speed,
                                                sids=sids)
        else:
            mel, olens = self.tts_mod.inference(text, text_lengths,
                                                out_len=out_len, speed=speed)
        if self.normalize_stats is not None:
            mel, _ = self.normalize_stats.inverse(mel, olens)
        return mel, olens
