"""JETS: jointly-trained FastSpeech2 + HiFiGAN with alignment learning.

Behavioral contract: espnet2/gan_tts/jets/ (jets.py, alignments.py —
E2E text-to-waveform; durations are LEARNED via monotonic alignment
search over a text/mel similarity matrix instead of external teachers;
generator = FS2-style encoder/variance/decoder + HiFiGAN upsampler on
random windows; adversarial + mel + duration + alignment losses).

Simplification: the forward-sum alignment objective is replaced by the
Viterbi-path log-likelihood of the MAS alignment (its hard-EM
counterpart); pitch/energy adaptors are optional and off by default.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.fastspeech2 import (VariancePredictor,
                                               length_regulator)
from espnet_tpu.models.tts.hifigan import HiFiGANGenerator
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.ops.monotonic_align import maximum_path
from espnet_tpu.utils.masks import make_non_pad_mask


class JETSGenerator(nn.Module):
    vocab_size: int
    n_mels: int = 80
    adim: int = 192
    aheads: int = 2
    elayers: int = 2
    dlayers: int = 2
    units: int = 768
    segment_frames: int = 16
    hop_length: int = 256
    generator_conf: dict = None
    dropout_rate: float = 0.1

    def setup(self):
        self.encoder = TransformerEncoder(
            input_size=self.vocab_size, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.units,
            num_blocks=self.elayers, input_layer="embed",
            dropout_rate=self.dropout_rate)
        self.mel_proj = nn.Dense(self.adim)
        self.duration_predictor = VariancePredictor(chans=self.adim)
        self.decoder = TransformerEncoder(
            input_size=self.adim, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.units,
            num_blocks=self.dlayers, input_layer="linear",
            dropout_rate=self.dropout_rate)
        gc = dict(self.generator_conf or {})
        gc.setdefault("in_channels", self.adim)
        self.vocoder = HiFiGANGenerator(**gc)

    def align(self, h_text, text_lengths, mel, mel_lengths):
        """MAS over a gaussian text/mel similarity -> durations + the
        alignment log-likelihood (jets/alignments.py role)."""
        h_mel = self.mel_proj(mel)  # (B, T, D)
        # log-lik: negative scaled squared distance
        d2 = (jnp.sum(h_text ** 2, -1)[:, :, None]
              - 2 * jnp.einsum("bsd,btd->bst", h_text, h_mel)
              + jnp.sum(h_mel ** 2, -1)[:, None, :])
        loglik = -d2 / jnp.sqrt(jnp.asarray(self.adim, jnp.float32))
        path = jax.lax.stop_gradient(
            maximum_path(loglik, text_lengths, mel_lengths))  # (B, S, T)
        durations = jnp.sum(path, axis=2).astype(jnp.int32)
        # Viterbi-path likelihood (maximize chosen-cell similarity)
        n = jnp.maximum(jnp.sum(path), 1.0)
        align_loss = -jnp.sum(path * loglik) / n
        return durations, align_loss

    def __call__(self, text, text_lengths, mel, mel_lengths, wav, rng, *,
                 deterministic=True):
        h_text, _ = self.encoder(text, text_lengths,
                                 deterministic=deterministic)
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        durations, align_loss = self.align(h_text, text_lengths, mel,
                                           mel_lengths)
        d_pred = self.duration_predictor(h_text, tmask,
                                         deterministic=deterministic)
        log_d = jnp.log(durations.astype(jnp.float32) + 1.0)
        dur_loss = jnp.sum(jnp.where(tmask, (d_pred - log_d) ** 2, 0.0)) / \
            jnp.maximum(jnp.sum(tmask), 1)
        hs, total = length_regulator(h_text, durations, mel.shape[1])
        olens = jnp.minimum(total, mel.shape[1]).astype(jnp.int32)
        h, _ = self.decoder(hs, olens, deterministic=deterministic)
        # random window -> waveform
        B = text.shape[0]
        seg = self.segment_frames
        max_start = jnp.maximum(olens - seg, 1)
        starts = jax.random.randint(rng, (B,), 0, 2 ** 30) % max_start
        h_seg = jax.vmap(lambda hb, s: jax.lax.dynamic_slice_in_dim(
            hb, s, seg, axis=0))(h, starts)
        wav_hat = self.vocoder(h_seg)
        return {"wav_hat": wav_hat, "starts": starts,
                "dur_loss": dur_loss, "align_loss": align_loss}

    def inference(self, text, text_lengths, max_frames: int = 512,
                  speed: float = 1.0):
        h_text, _ = self.encoder(text, text_lengths, deterministic=True)
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(h_text, tmask, deterministic=True)
        durations = jnp.clip(jnp.round((jnp.exp(d_pred) - 1.0) / speed),
                             0, None).astype(jnp.int32)
        durations = jnp.where(tmask, durations, 0)
        hs, total = length_regulator(h_text, durations, max_frames)
        olens = jnp.minimum(total, max_frames).astype(jnp.int32)
        h, _ = self.decoder(hs, olens, deterministic=True)
        return self.vocoder(h), olens
