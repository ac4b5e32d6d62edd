"""Target speaker extraction (TSE).

Behavioral contract: espnet2/enh/espnet_model_tse.py +
bin/enh_tse_inference.py (SeparateSpeech with enrollment): an
enrollment utterance of the target speaker conditions a masking network
that extracts only that speaker from the mixture (SpeakerBeam-style —
the speaker embedding multiplicatively adapts the separator features).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.enh.losses import si_snr_loss
from espnet_tpu.models.enh.separators import BLSTM
from espnet_tpu.ops.stft import istft, stft
from espnet_tpu.utils.masks import make_non_pad_mask


class TSEModel(nn.Module):
    n_fft: int = 512
    hop_length: int = 128
    hidden: int = 128
    num_layers: int = 2
    emb_dim: int = 64

    def setup(self):
        n_freq = self.n_fft // 2 + 1
        self.aux_net = nn.Dense(self.emb_dim)       # enrollment encoder head
        self.aux_blstm = BLSTM(self.hidden // 2)
        self.adapt = nn.Dense(2 * self.hidden)      # emb -> feature scaling
        self.blstms = [BLSTM(self.hidden, name=f"blstm{i}")
                       for i in range(self.num_layers)]
        self.mask_out = nn.Dense(n_freq)

    def _spec_mag(self, wav, lengths):
        re, im, flens = stft(wav, lengths, n_fft=self.n_fft,
                             hop_length=self.hop_length)
        return re, im, jnp.sqrt(re * re + im * im + 1e-8), flens

    def embed_speaker(self, enroll, enroll_lengths):
        _, _, mag, flens = self._spec_mag(enroll, enroll_lengths)
        h = self.aux_blstm(mag)
        mask = make_non_pad_mask(flens, h.shape[1])[:, :, None]
        pooled = jnp.sum(jnp.where(mask, h, 0.0), axis=1) / \
            jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        return self.aux_net(pooled)  # (B, emb)

    def extract(self, speech_mix, speech_mix_lengths, enroll,
                enroll_lengths):
        emb = self.embed_speaker(enroll, enroll_lengths)
        re, im, mag, flens = self._spec_mag(speech_mix, speech_mix_lengths)
        h = mag
        scale = self.adapt(emb)[:, None, :]  # (B, 1, 2*hidden)
        for i, blstm in enumerate(self.blstms):
            h = blstm(h)
            if i == 0:  # multiplicative speaker adaptation after layer 1
                h = h * jax.nn.sigmoid(scale)
        m = jax.nn.sigmoid(self.mask_out(h))
        S = speech_mix.shape[1]
        return istft(re * m, im * m, n_fft=self.n_fft,
                     hop_length=self.hop_length, length=S)

    def __call__(self, speech_mix, speech_mix_lengths, enroll_ref1,
                 speech_ref1, enroll_ref1_lengths=None, *,
                 deterministic=True, **kw):
        if enroll_ref1_lengths is None:
            enroll_ref1_lengths = jnp.full((enroll_ref1.shape[0],),
                                           enroll_ref1.shape[1], jnp.int32)
        est = self.extract(speech_mix, speech_mix_lengths, enroll_ref1,
                           enroll_ref1_lengths)
        loss = jnp.mean(si_snr_loss(est, speech_ref1, speech_mix_lengths))
        return loss, {"loss": loss, "si_snr": -loss}, \
            jnp.asarray(speech_mix.shape[0], jnp.float32)
