"""Mask-based MVDR neural beamformer for multichannel enhancement.

Behavioral contract: espnet2/enh/separator/neural_beamformer.py and the
legacy frontend chain (legacy/nets/pytorch_backend/frontends/
frontend.py): a mask-estimation net predicts speech/noise TF masks per
channel; spatial covariance matrices are mask-weighted outer products;
the MVDR filter w = (Phi_n^-1 Phi_s u) / tr(Phi_n^-1 Phi_s) is applied
per frequency. Complex math is expressed as real/imag pairs — JAX
complex64 solves ride the MXU fine on TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.enh.separators import RNNSeparator
from espnet_tpu.ops.stft import istft, stft
from espnet_tpu.utils.masks import make_non_pad_mask


def spatial_covariance(spec: jnp.ndarray, mask: jnp.ndarray,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """spec: (B, T, C, F) complex; mask: (B, T, F); -> (B, F, C, C)."""
    m = (mask * valid[:, :, None])[:, :, None, :]  # (B, T, 1, F)
    sm = spec * m
    psd = jnp.einsum("btcf,btdf->bfcd", sm, jnp.conj(spec))
    norm = jnp.maximum(jnp.sum(mask * valid[:, :, None], axis=1), 1e-6)
    return psd / norm[:, :, None, None]


def mvdr_filter(psd_s: jnp.ndarray, psd_n: jnp.ndarray,
                ref_ch: int = 0, diag_load: float = 1e-6) -> jnp.ndarray:
    """-> (B, F, C) MVDR weights w = Phi_n^-1 Phi_s u / tr(Phi_n^-1 Phi_s)."""
    C = psd_n.shape[-1]
    eye = jnp.eye(C, dtype=psd_n.dtype)
    load = diag_load * jnp.trace(psd_n, axis1=-2, axis2=-1).real[
        ..., None, None] / C + 1e-10
    psd_n = psd_n + load * eye
    num = jnp.linalg.solve(psd_n, psd_s)          # (B, F, C, C)
    tr = jnp.trace(num, axis1=-2, axis2=-1)[..., None]
    w = num[..., ref_ch] / jnp.maximum(jnp.abs(tr), 1e-10)
    return w  # (B, F, C)


class NeuralBeamformer(nn.Module):
    """Multichannel in (B, S, C) -> single-channel enhanced wav."""

    n_fft: int = 512
    hop_length: int = 128
    mask_hidden: int = 128
    mask_layers: int = 2
    ref_channel: int = 0

    def setup(self):
        n_freq = self.n_fft // 2 + 1
        self.mask_net = RNNSeparator(input_dim=n_freq, num_spk=2,
                                     rnn_hidden=self.mask_hidden,
                                     num_layers=self.mask_layers)

    def __call__(self, speech_mix, speech_mix_lengths, speech_ref1=None, *,
                 deterministic=True, **kw):
        ests, olens = self.enhance(speech_mix, speech_mix_lengths,
                                   deterministic=deterministic)
        if speech_ref1 is None:
            return ests, olens
        from espnet_tpu.models.enh.losses import si_snr_loss
        loss = jnp.mean(si_snr_loss(ests, speech_ref1, speech_mix_lengths))
        return loss, {"loss": loss, "si_snr": -loss}, \
            jnp.asarray(speech_mix.shape[0], jnp.float32)

    def enhance(self, speech_mix, speech_mix_lengths, *, deterministic=True):
        """speech_mix: (B, S, C)."""
        B, S, C = speech_mix.shape
        # stft over channels: (B*C, S)
        flat = speech_mix.transpose(0, 2, 1).reshape(B * C, S)
        re, im, _ = stft(flat, None, n_fft=self.n_fft,
                         hop_length=self.hop_length)
        T, F = re.shape[1], re.shape[2]
        spec = (re + 1j * im).reshape(B, C, T, F).transpose(0, 2, 1, 3)
        feat_lens = (speech_mix_lengths + 2 * (self.n_fft // 2)
                     - self.n_fft) // self.hop_length + 1
        valid = make_non_pad_mask(feat_lens, T)
        # masks from the reference channel magnitude
        mag_ref = jnp.abs(spec[:, :, self.ref_channel])
        masks = self.mask_net(mag_ref, deterministic=deterministic)
        mask_s, mask_n = masks[0], masks[1]
        psd_s = spatial_covariance(spec, mask_s, valid)
        psd_n = spatial_covariance(spec, mask_n, valid)
        w = mvdr_filter(psd_s, psd_n, self.ref_channel)  # (B, F, C)
        enh = jnp.einsum("bfc,btcf->btf", jnp.conj(w), spec)
        wav = istft(enh.real, enh.imag, n_fft=self.n_fft,
                    hop_length=self.hop_length, length=S)
        return wav, speech_mix_lengths
