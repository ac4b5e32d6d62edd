"""FastSpeech2 non-autoregressive TTS.

Behavioral contract: espnet2/tts/fastspeech2/fastspeech2.py — text
encoder -> variance adaptor (duration/pitch/energy predictors, length
regulator) -> decoder -> mel (+ postnet); training with teacher
durations/pitch/energy; inference expands by predicted durations
(:830). Loss = L1(mel) + MSE(log-dur) + MSE(pitch) + MSE(energy)
(espnet2/tts/fastspeech2/loss.py).

TPU-first: the length regulator is a static-shape gather — frame t maps
to token searchsorted(cumsum(dur), t); inference output length is padded
to a bucketed Tmax so the whole synthesis is one XLA program (the
reference needed XPU shape-bucketing retrofits for this,
fastspeech2.py:43,150-153 — here it is the design).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.utils.masks import make_non_pad_mask, mask_fill


class VariancePredictor(nn.Module):
    """Conv stack predicting a scalar per token
    (legacy/nets/pytorch_backend/fastspeech/duration_predictor.py)."""

    layers: int = 2
    chans: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, valid_mask, *, deterministic=True):
        h = x
        for i in range(self.layers):
            h = nn.Conv(self.chans, (self.kernel_size,), padding="SAME",
                        name=f"conv{i}")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(name=f"norm{i}")(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        out = nn.Dense(1, name="linear")(h)[..., 0]
        return jnp.where(valid_mask, out, 0.0)


def length_regulator(hs: jnp.ndarray, durations: jnp.ndarray,
                     out_len: int):
    """Expand token states by integer durations into (B, out_len, D).

    frame t <- token argmax(cumsum(dur) > t); frames beyond total
    duration are zeros. Pure gather, static shapes.
    """
    B, L, D = hs.shape
    ends = jnp.cumsum(durations, axis=1)  # (B, L)
    t = jnp.arange(out_len)[None, :, None]  # (1, T, 1)
    # index of first token whose cumulative end exceeds t
    tok_idx = jnp.sum(t >= ends[:, None, :], axis=2)  # (B, T)
    valid = tok_idx < L
    gathered = jnp.take_along_axis(hs, jnp.clip(tok_idx, 0, L - 1)[:, :, None],
                                   axis=1)
    return jnp.where(valid[:, :, None], gathered, 0.0), ends[:, -1]


class Postnet(nn.Module):
    """5-layer conv postnet (tacotron2 style, shared by FS2)."""

    odim: int
    layers: int = 5
    chans: int = 256
    kernel_size: int = 5
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        h = x
        for i in range(self.layers - 1):
            h = nn.Conv(self.chans, (self.kernel_size,), padding="SAME",
                        name=f"conv{i}")(h)
            h = jnp.tanh(nn.LayerNorm(name=f"norm{i}")(h))
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Conv(self.odim, (self.kernel_size,), padding="SAME",
                    name=f"conv_out")(h)
        return h


class FastSpeech2(nn.Module):
    idim: int                      # vocab size
    odim: int = 80                 # mel dims
    adim: int = 256
    aheads: int = 2
    elayers: int = 4
    eunits: int = 1024
    dlayers: int = 4
    dunits: int = 1024
    positionwise_conv_kernel_size: int = 1
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 256
    pitch_embed_kernel_size: int = 9
    use_postnet: bool = True
    postnet_layers: int = 5
    postnet_chans: int = 256
    dropout_rate: float = 0.2
    max_frames: int = 2048         # static inference frame bucket
    spk_num: int = 0               # >0: speaker-ID conditioning (sids)

    def setup(self):
        self.encoder = TransformerEncoder(
            input_size=self.idim, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.eunits,
            num_blocks=self.elayers, input_layer="embed",
            dropout_rate=self.dropout_rate)
        self.duration_predictor = VariancePredictor(
            self.duration_predictor_layers, self.duration_predictor_chans,
            dropout_rate=self.dropout_rate)
        self.pitch_predictor = VariancePredictor(
            self.duration_predictor_layers, self.duration_predictor_chans,
            kernel_size=5, dropout_rate=self.dropout_rate)
        self.energy_predictor = VariancePredictor(
            self.duration_predictor_layers, self.duration_predictor_chans,
            kernel_size=3, dropout_rate=self.dropout_rate)
        self.pitch_embed = nn.Conv(self.adim,
                                   (self.pitch_embed_kernel_size,),
                                   padding="SAME")
        self.energy_embed = nn.Conv(self.adim, (self.pitch_embed_kernel_size,),
                                    padding="SAME")
        self.decoder = TransformerEncoder(
            input_size=self.adim, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.dunits,
            num_blocks=self.dlayers, input_layer="linear",
            dropout_rate=self.dropout_rate)
        self.feat_out = nn.Dense(self.odim)
        if self.spk_num > 0:
            # speaker-ID embedding integrated after the encoder
            # (reference fastspeech2.py sids/spk_embed_integration)
            self.sid_embed = nn.Embed(self.spk_num, self.adim)
        if self.use_postnet:
            self.postnet = Postnet(self.odim, self.postnet_layers,
                                   self.postnet_chans,
                                   dropout_rate=self.dropout_rate)

    def _forward_core(self, text, text_lengths, durations, pitch, energy,
                      out_len, *, deterministic=True, sids=None):
        hs, hlens = self.encoder(text, text_lengths,
                                 deterministic=deterministic)
        if self.spk_num > 0 and sids is not None:
            sid_vec = sids[:, 0] if sids.ndim > 1 else sids
            hs = hs + self.sid_embed(sid_vec)[:, None, :]
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(hs, tmask,
                                         deterministic=deterministic)
        p_pred = self.pitch_predictor(hs, tmask, deterministic=deterministic)
        e_pred = self.energy_predictor(hs, tmask, deterministic=deterministic)
        use_p = pitch if pitch is not None else p_pred
        use_e = energy if energy is not None else e_pred
        hs = hs + self.pitch_embed(use_p[:, :, None]) \
            + self.energy_embed(use_e[:, :, None])
        hs_exp, total = length_regulator(hs, durations, out_len)
        olens = jnp.minimum(total, out_len).astype(jnp.int32)
        h, _ = self.decoder(hs_exp, olens, deterministic=deterministic)
        before = self.feat_out(h)
        if self.use_postnet:
            after = before + self.postnet(before, deterministic=deterministic)
        else:
            after = before
        return before, after, d_pred, p_pred, e_pred, olens

    def __call__(self, text, text_lengths, feats, feats_lengths,
                 durations, pitch, energy, *, deterministic=True,
                 sids=None):
        """Training forward -> (loss, stats, weight)."""
        out_len = feats.shape[1]
        before, after, d_pred, p_pred, e_pred, olens = self._forward_core(
            text, text_lengths, durations, pitch, energy, out_len,
            deterministic=deterministic, sids=sids)
        fmask = make_non_pad_mask(feats_lengths, out_len)[:, :, None]
        n_frames = jnp.maximum(jnp.sum(fmask), 1.0)
        l1 = jnp.sum(jnp.abs(jnp.where(fmask, before - feats, 0.0))) / \
            (n_frames * self.odim)
        l1_post = jnp.sum(jnp.abs(jnp.where(fmask, after - feats, 0.0))) / \
            (n_frames * self.odim)
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        n_tok = jnp.maximum(jnp.sum(tmask), 1.0)
        log_d_tgt = jnp.log(durations.astype(jnp.float32) + 1.0)
        # duration predictor outputs log(d+1) domain (reference offset=1)
        dur_loss = jnp.sum(jnp.where(tmask, (d_pred - log_d_tgt) ** 2,
                                     0.0)) / n_tok
        pitch_loss = jnp.sum(jnp.where(tmask, (p_pred - pitch) ** 2,
                                       0.0)) / n_tok
        energy_loss = jnp.sum(jnp.where(tmask, (e_pred - energy) ** 2,
                                        0.0)) / n_tok
        loss = l1 + l1_post + dur_loss + pitch_loss + energy_loss
        stats = {"loss": loss, "l1_loss": l1 + l1_post,
                 "duration_loss": dur_loss, "pitch_loss": pitch_loss,
                 "energy_loss": energy_loss}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(self, text, text_lengths, *, speed: float = 1.0,
                  out_len: Optional[int] = None, sids=None):
        """-> (mel (B, Tmax, odim), olens). Durations from predictor
        (log(d+1) domain -> round(exp-1)), fastspeech2.py:830."""
        out_len = out_len or self.max_frames
        hs, hlens = self.encoder(text, text_lengths, deterministic=True)
        if self.spk_num > 0 and sids is not None:
            sid_vec = sids[:, 0] if sids.ndim > 1 else sids
            hs = hs + self.sid_embed(sid_vec)[:, None, :]
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(hs, tmask, deterministic=True)
        durations = jnp.clip(
            jnp.round((jnp.exp(d_pred) - 1.0) / speed), 0, None
        ).astype(jnp.int32)
        durations = jnp.where(tmask, durations, 0)
        before, after, d_pred, p_pred, e_pred, olens = self._forward_core(
            text, text_lengths, durations, None, None, out_len,
            deterministic=True, sids=sids)
        return after, olens
