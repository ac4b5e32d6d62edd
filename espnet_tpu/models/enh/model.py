"""Enhancement model: encoder -> separator -> decoder with PIT loss.

Behavioral contract: espnet2/enh/espnet_model.py:28-408 — forward runs
forward_enhance (encode mix, mask, decode sources) then forward_loss
(criterion + PIT over refs). Encoder/decoder are STFT/iSTFT
(espnet2/enh/encoder/stft_encoder.py, decoder/stft_decoder.py); masks
apply to the complex spectrum (magnitude masking of real/imag).
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.enh.losses import CRITERIA, pit_loss
from espnet_tpu.models.enh.separators import SEPARATORS
from espnet_tpu.ops.stft import istft, stft


class EnhancementModel(nn.Module):
    num_spk: int = 2
    encoder: str = "stft"        # stft only (conv encoder later)
    n_fft: int = 512
    hop_length: int = 128
    separator: str = "rnn"
    separator_conf: dict = None
    loss_type: str = "si_snr"    # time-domain criterion on decoded wavs
    mask_feature: str = "magnitude"

    def setup(self):
        n_freq = self.n_fft // 2 + 1
        conf = dict(self.separator_conf or {})
        self.separator_mod = SEPARATORS[self.separator](
            input_dim=n_freq, num_spk=self.num_spk, **conf)

    def forward_enhance(self, speech_mix, speech_lengths, *,
                        deterministic=True):
        """-> (list of (B, S) est wavs, olens, masks).

        Separator output conventions (class attributes):
        - output="mask" (default): real masks on the magnitude
        - output="complex_mask": (mr, mi) complex ratio masks
        - output="spectrum": (er, ei) direct complex estimates
          (TF-GridNet family)
        `complex_input=True` separators receive (real, imag) instead of
        the magnitude."""
        real, imag, flens = stft(speech_mix, speech_lengths,
                                 n_fft=self.n_fft, hop_length=self.hop_length)
        sep = self.separator_mod
        if getattr(sep, "complex_input", False):
            feats = (real, imag)
        else:
            feats = jnp.sqrt(real * real + imag * imag + 1e-8)
        masks = sep(feats, deterministic=deterministic)
        out_kind = getattr(sep, "output", "mask")
        S = speech_mix.shape[1]
        ests = []
        for m in masks:
            if out_kind == "spectrum":
                er, ei = m
            elif out_kind == "complex_mask":
                mr, mi = m
                er = real * mr - imag * mi
                ei = real * mi + imag * mr
            else:
                er, ei = real * m, imag * m
            est = istft(er, ei, n_fft=self.n_fft,
                        hop_length=self.hop_length, length=S)
            ests.append(est)
        return ests, speech_lengths, masks

    def __call__(self, speech_mix, speech_mix_lengths, speech_ref1,
                 speech_ref2=None, *, deterministic=True, **kw):
        """Returns (loss, stats, weight). refs passed as speech_ref{n}
        (espnet2 data naming)."""
        refs = [speech_ref1]
        if speech_ref2 is not None and self.num_spk >= 2:
            refs.append(speech_ref2)
        ests, olens, _ = self.forward_enhance(
            speech_mix, speech_mix_lengths, deterministic=deterministic)
        loss_fn = CRITERIA[self.loss_type]
        if len(refs) > 1:
            per_utt, perm = pit_loss(loss_fn, ests[:len(refs)], refs,
                                     speech_mix_lengths)
        else:
            per_utt = loss_fn(ests[0], refs[0], speech_mix_lengths)
        loss = jnp.mean(per_utt)
        stats = {"loss": loss}
        if self.loss_type in ("si_snr", "snr"):
            stats["si_snr"] = -loss
        return loss, stats, jnp.asarray(speech_mix.shape[0], jnp.float32)
