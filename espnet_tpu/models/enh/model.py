"""Enhancement model: encoder -> separator -> decoder with PIT loss.

Behavioral contract: espnet2/enh/espnet_model.py:28-408 — forward runs
forward_enhance (encode mix, mask, decode sources) then forward_loss
(criterion + PIT over refs). Encoders/decoders:
- "stft": STFT/iSTFT (espnet2/enh/encoder/stft_encoder.py,
  decoder/stft_decoder.py); masks apply to the complex spectrum
  (magnitude masking of real/imag).
- "conv": learned time-domain filterbank (Conv-TasNet proper —
  espnet2/enh/encoder/conv_encoder.py + decoder/conv_decoder.py): a
  strided 1-D conv + ReLU analysis bank, masks on the learned
  representation, transposed-conv overlap-add synthesis. One big
  batched conv each way — MXU-shaped, no FFT on the hot path.
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
    encoder: str = "stft"        # "stft" | "conv" (learned filterbank)
    n_fft: int = 512
    hop_length: int = 128
    conv_channels: int = 256     # N: learned filters (conv encoder)
    conv_kernel: int = 32        # L: filter length in samples
    conv_stride: int = 16        # hop (L//2 in the paper)
    separator: str = "rnn"
    separator_conf: dict = None
    loss_type: str = "si_snr"    # time-domain criterion on decoded wavs
    mask_feature: str = "magnitude"

    def setup(self):
        conf = dict(self.separator_conf or {})
        if self.encoder == "conv":
            in_dim = self.conv_channels
            self.enc_conv = nn.Conv(
                self.conv_channels, (self.conv_kernel,),
                strides=(self.conv_stride,), padding="VALID",
                use_bias=False, name="filterbank")
            self.dec_conv = nn.ConvTranspose(
                1, (self.conv_kernel,), strides=(self.conv_stride,),
                padding="VALID", use_bias=False, name="basis")
        else:
            in_dim = self.n_fft // 2 + 1
        self.separator_mod = SEPARATORS[self.separator](
            input_dim=in_dim, num_spk=self.num_spk, **conf)
        if self.encoder == "conv":
            # the learned-basis path masks a real representation; complex
            # separators only make sense on the STFT encoder (ADVICE r3)
            sep = self.separator_mod
            if getattr(sep, "complex_input", False) or \
                    getattr(sep, "output", "mask") != "mask" or \
                    getattr(sep, "needs_ref_spectra", False):
                raise ValueError(
                    f"encoder='conv' requires a real-mask separator; "
                    f"'{self.separator}' uses complex_input/"
                    f"output={getattr(sep, 'output', 'mask')!r} — use "
                    f"encoder='stft' for it")

    def forward_enhance(self, speech_mix, speech_lengths, *,
                        deterministic=True, refs=None):
        """-> (list of (B, S) est wavs, olens, masks).

        Separator output conventions (class attributes):
        - output="mask" (default): real masks on the magnitude
        - output="complex_mask": (mr, mi) complex ratio masks
        - output="spectrum": (er, ei) direct complex estimates
          (TF-GridNet family)
        - output="dpcl": T-F bin embedding -> binary masks via on-device
          k-means (deep clustering inference)
        `complex_input=True` separators receive (real, imag) instead of
        the magnitude. `needs_ref_spectra=True` separators (DAN) get the
        reference magnitudes when `refs` (list of (B, S) wavs) is given
        — the training path; without refs they fall back to k-means
        attractors."""
        if getattr(self.separator_mod, "time_domain", False):
            # all-in-one time-domain separators (FaSNet/SVoice): raw
            # (B, S) or multi-channel (B, S, C) in, waveforms out
            ests = self.separator_mod(speech_mix, speech_lengths,
                                      deterministic=deterministic)
            return ests, speech_lengths, None
        multi_ch = getattr(self.separator_mod, "multichannel_input", False)
        if speech_mix.ndim == 3 and not multi_ch:
            # multi-channel mixture on a single-channel separator:
            # reference channel 0 (espnet_model.py ref_channel default)
            speech_mix = speech_mix[..., 0]
        if self.encoder == "conv":
            return self._enhance_time_domain(
                speech_mix, speech_lengths, deterministic=deterministic)
        if speech_mix.ndim == 3:
            # per-channel STFT -> (B, T, F, C) for multichannel
            # separators (iNeuBe / TF-GridNetV2 n_imics>1)
            parts = [stft(speech_mix[..., c], speech_lengths,
                          n_fft=self.n_fft, hop_length=self.hop_length)
                     for c in range(speech_mix.shape[-1])]
            real = jnp.stack([p[0] for p in parts], axis=-1)
            imag = jnp.stack([p[1] for p in parts], axis=-1)
            flens = parts[0][2]
            speech_mix = speech_mix[..., 0]   # istft length reference
        else:
            real, imag, flens = stft(speech_mix, speech_lengths,
                                     n_fft=self.n_fft,
                                     hop_length=self.hop_length)
        sep = self.separator_mod
        if getattr(sep, "complex_input", False):
            feats = (real, imag)
        else:
            feats = jnp.sqrt(real * real + imag * imag + 1e-8)
        kw = {}
        if getattr(sep, "needs_ref_spectra", False) and refs is not None:
            kw["refs_mag"] = [self._ref_mag(r) for r in refs]
        masks = sep(feats, deterministic=deterministic, **kw)
        out_kind = getattr(sep, "output", "mask")
        if real.ndim == 4:
            # mask-output multichannel separators (USES2): masks apply
            # to the reference channel's spectrum
            ref = getattr(sep, "ref_channel", 0)
            real, imag = real[..., ref], imag[..., ref]
        if out_kind == "dpcl":
            # cluster bin embeddings into hard binary masks
            from espnet_tpu.models.enh.separators import kmeans_tf_bins
            emb = masks                                # (B, T, F, D)
            B, T, F, _ = emb.shape
            lab, _ = kmeans_tf_bins(emb.reshape(B, T * F, -1), self.num_spk)
            lab = lab.reshape(B, T, F)
            masks = [(lab == s).astype(real.dtype)
                     for s in range(self.num_spk)]
            out_kind = "mask"
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

    def _ref_mag(self, ref):
        r, i, _ = stft(ref, None, n_fft=self.n_fft,
                       hop_length=self.hop_length)
        return jnp.sqrt(r * r + i * i + 1e-8)

    def _enhance_time_domain(self, speech_mix, speech_lengths, *,
                             deterministic=True):
        """Conv-TasNet path: mask the learned representation, overlap-
        add back to waveform with the learned basis."""
        S = speech_mix.shape[1]
        K, st = self.conv_kernel, self.conv_stride
        # pad so the VALID analysis conv covers every sample:
        # (T-1)*stride + kernel >= S
        T = max(-(-max(S - K, 0) // st) + 1, 1)
        Sp = (T - 1) * st + K
        x = jnp.pad(speech_mix, ((0, 0), (0, Sp - S)))[:, :, None]
        feats = jax.nn.relu(self.enc_conv(x))          # (B, T, N)
        masks = self.separator_mod(feats, deterministic=deterministic)
        ests = []
        for m in masks:
            est = self.dec_conv(feats * m)[:, :S, 0]   # (B, S)
            ests.append(est)
        return ests, speech_lengths, masks

    def __call__(self, speech_mix, speech_mix_lengths, speech_ref1,
                 speech_ref2=None, *, deterministic=True, **kw):
        """Returns (loss, stats, weight). refs passed as speech_ref{n}
        (espnet2 data naming)."""
        refs = [speech_ref1]
        if speech_ref2 is not None and self.num_spk >= 2:
            refs.append(speech_ref2)
        if self.loss_type == "dpcl":
            # deep-clustering training: affinity loss on the embedding
            # (no source reconstruction; inference clusters with k-means)
            from espnet_tpu.models.enh.separators import dpcl_loss
            real, imag, _ = stft(speech_mix, speech_mix_lengths,
                                 n_fft=self.n_fft,
                                 hop_length=self.hop_length)
            mag = jnp.sqrt(real * real + imag * imag + 1e-8)
            emb = self.separator_mod(mag, deterministic=deterministic)
            per_utt = dpcl_loss(emb, [self._ref_mag(r) for r in refs])
            loss = jnp.mean(per_utt)
            return loss, {"loss": loss}, jnp.asarray(
                speech_mix.shape[0], jnp.float32)
        ests, olens, _ = self.forward_enhance(
            speech_mix, speech_mix_lengths, deterministic=deterministic,
            refs=refs)
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
