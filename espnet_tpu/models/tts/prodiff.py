"""ProDiff: progressive fast diffusion TTS.

Behavioral contract: espnet2/tts/prodiff/ — prodiff.py:44 (FastSpeech2
backbone: text encoder + duration/pitch/energy variance adaptor + length
regulator) with a diffusion mel decoder (denoiser.py:150
SpectogramDenoiser: WaveNet-style gated residual conv stack conditioned
on a sinusoidal diffusion-step embedding; VPSDE/cosine beta schedule,
denoiser.py:33) trained as a GENERATOR (x0-prediction) at few timesteps
(ProDiff, Huang et al. 2022 — 4-step sampling).

TPU-first: the sampler is a `lax.fori_loop` over the (static, tiny)
timestep count — 4 denoiser forwards in one jitted program; q-sampling
draws per-batch timesteps on device so the train step stays one fused
dispatch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.fastspeech2 import (VariancePredictor,
                                               length_regulator)
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.utils.masks import make_non_pad_mask


def noise_schedule(timesteps: int, schedule: str = "vpsde",
                   min_beta: float = 0.1, max_beta: float = 40.0,
                   s: float = 8e-3) -> np.ndarray:
    """betas (timesteps,) — vpsde (denoiser.py:16) or cosine (:59)."""
    if schedule == "cosine":
        x = np.arange(timesteps + 1)
        ac = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = 1.0 - (ac[1:] / ac[:-1])
        return np.clip(betas, 0.0, 0.999).astype(np.float64)
    t = np.arange(1, timesteps + 1)
    coef = 2 * t - 1.0
    betas = 1.0 - np.exp(-min_beta / timesteps
                         - 0.5 * (max_beta - min_beta)
                         * coef / (timesteps ** 2))
    return betas.astype(np.float64)


class GatedResBlock(nn.Module):
    """WaveNet-style gated residual block (denoiser.py:100): dilated
    conv on x + projected condition + step embedding, tanh*sigmoid gate,
    residual/skip split."""

    channels: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, cond, step_emb):
        # x (B, T, C), cond (B, T, C), step_emb (B, C)
        h = x + step_emb[:, None, :]
        h = nn.Conv(2 * self.channels, (3,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    name="dconv")(h)
        h = h + nn.Dense(2 * self.channels, name="cond_proj")(cond)
        a, g = jnp.split(h, 2, axis=-1)
        h = jnp.tanh(a) * nn.sigmoid(g)
        out = nn.Dense(2 * self.channels, name="out_proj")(h)
        res, skip = jnp.split(out, 2, axis=-1)
        return (x + res) / jnp.sqrt(2.0), skip


class SpectrogramDenoiser(nn.Module):
    """x_t + diffusion step + encoder condition -> x0 prediction
    (denoiser.py:150 SpectogramDenoiser, x0 parameterization)."""

    odim: int
    channels: int = 128
    layers: int = 8
    cycle: int = 4          # dilation cycle length

    @nn.compact
    def __call__(self, x_t, cond, t_frac):
        # x_t (B, T, odim); cond (B, T, adim); t_frac (B,) in [0, 1]
        B = x_t.shape[0]
        C = self.channels
        # sinusoidal step embedding -> 2-layer MLP (Mish-ish via gelu)
        half = C // 2
        freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
        ang = t_frac[:, None] * 100.0 * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        emb = nn.Dense(4 * C, name="step_mlp1")(emb)
        emb = nn.gelu(emb)
        emb = nn.Dense(C, name="step_mlp2")(emb)
        h = nn.relu(nn.Conv(C, (1,), name="in_proj")(x_t))
        cond_c = nn.Conv(C, (1,), name="cond_in")(cond)
        skips = 0.0
        for i in range(self.layers):
            h, skip = GatedResBlock(C, dilation=2 ** (i % self.cycle),
                                    name=f"block{i}")(h, cond_c, emb)
            skips = skips + skip
        out = skips / jnp.sqrt(float(self.layers))
        out = nn.relu(nn.Conv(C, (1,), name="mid_proj")(out))
        return nn.Conv(self.odim, (1,), name="out")(out)


class ProDiff(nn.Module):
    """FastSpeech2 backbone + diffusion mel decoder (prodiff.py:44)."""

    idim: int
    odim: int = 80
    adim: int = 256
    aheads: int = 2
    elayers: int = 4
    eunits: int = 1024
    denoiser_layers: int = 8
    denoiser_channels: int = 128
    diffusion_steps: int = 4
    schedule: str = "vpsde"
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 256
    dropout_rate: float = 0.2
    max_frames: int = 2048

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
        self.pitch_embed = nn.Conv(self.adim, (9,), padding="SAME")
        self.energy_embed = nn.Conv(self.adim, (9,), padding="SAME")
        self.denoiser = SpectrogramDenoiser(
            self.odim, channels=self.denoiser_channels,
            layers=self.denoiser_layers)
        betas = noise_schedule(self.diffusion_steps, self.schedule)
        ac = np.cumprod(1.0 - betas)
        self._betas = jnp.asarray(betas, jnp.float32)
        self._alphas_cumprod = jnp.asarray(ac, jnp.float32)
        self._alphas_cumprod_prev = jnp.asarray(
            np.concatenate([[1.0], ac[:-1]]), jnp.float32)

    def _condition(self, text, text_lengths, durations, pitch, energy,
                   out_len, *, deterministic=True):
        hs, _ = self.encoder(text, text_lengths,
                             deterministic=deterministic)
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(hs, tmask,
                                         deterministic=deterministic)
        p_pred = self.pitch_predictor(hs, tmask,
                                      deterministic=deterministic)
        e_pred = self.energy_predictor(hs, tmask,
                                       deterministic=deterministic)
        use_p = pitch if pitch is not None else p_pred
        use_e = energy if energy is not None else e_pred
        hs = hs + self.pitch_embed(use_p[:, :, None]) \
            + self.energy_embed(use_e[:, :, None])
        hs_exp, total = length_regulator(hs, durations, out_len)
        olens = jnp.minimum(total, out_len).astype(jnp.int32)
        return hs_exp, olens, d_pred, p_pred, e_pred

    def __call__(self, text, text_lengths, feats, feats_lengths,
                 durations, pitch, energy, *, deterministic=True):
        """Training: sample t, q-noise the target mel, predict x0.
        Returns (loss, stats, weight) like every acoustic model."""
        B, Tf, M = feats.shape
        cond, olens, d_pred, p_pred, e_pred = self._condition(
            text, text_lengths, durations, pitch, energy, Tf,
            deterministic=deterministic)
        rng = self.make_rng("diffusion") if not deterministic else \
            jax.random.PRNGKey(0)
        rt, rn = jax.random.split(rng)
        t = jax.random.randint(rt, (B,), 0, self.diffusion_steps)
        ac_t = self._alphas_cumprod[t][:, None, None]
        eps = jax.random.normal(rn, feats.shape)
        x_t = jnp.sqrt(ac_t) * feats + jnp.sqrt(1.0 - ac_t) * eps
        x0_hat = self.denoiser(
            x_t, cond, (t.astype(jnp.float32) + 1.0)
            / self.diffusion_steps)
        fmask = make_non_pad_mask(feats_lengths, Tf)[:, :, None]
        n = jnp.maximum(jnp.sum(fmask), 1.0) * M
        l1 = jnp.sum(jnp.abs(jnp.where(fmask, x0_hat - feats, 0.0))) / n
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        n_tok = jnp.maximum(jnp.sum(tmask), 1.0)
        log_d = jnp.log(durations.astype(jnp.float32) + 1.0)
        dur_l = jnp.sum(jnp.where(tmask, (d_pred - log_d) ** 2, 0.0)) / n_tok
        p_l = jnp.sum(jnp.where(tmask, (p_pred - pitch) ** 2, 0.0)) / n_tok
        e_l = jnp.sum(jnp.where(tmask, (e_pred - energy) ** 2, 0.0)) / n_tok
        loss = l1 + dur_l + p_l + e_l
        stats = {"loss": loss, "diff_l1_loss": l1, "duration_loss": dur_l,
                 "pitch_loss": p_l, "energy_loss": e_l}
        return loss, stats, jnp.asarray(B, jnp.float32)

    def denoise_sample(self, cond, rng, out_len):
        """Few-step x0-parameterized ancestral sampling
        (denoiser.py inference contract): x_{t-1} from the q-posterior
        mean around the predicted x0 — `fori_loop` over the static
        timestep count, one jitted program."""
        B = cond.shape[0]
        M = self.odim
        T = self.diffusion_steps
        x = jax.random.normal(rng, (B, out_len, M))

        def body(i, carry):
            x, rng = carry
            t = T - 1 - i
            tf = (jnp.asarray(t, jnp.float32) + 1.0) / T
            x0 = self.denoiser(x, cond, jnp.full((B,), tf))
            beta = self._betas[t]
            ac = self._alphas_cumprod[t]
            ac_prev = self._alphas_cumprod_prev[t]
            coef0 = beta * jnp.sqrt(ac_prev) / (1.0 - ac)
            coefT = (1.0 - ac_prev) * jnp.sqrt(1.0 - beta) / (1.0 - ac)
            mean = coef0 * x0 + coefT * x
            var = beta * (1.0 - ac_prev) / (1.0 - ac)
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, x.shape)
            x = jnp.where(t > 0, mean + jnp.sqrt(var) * noise, x0)
            return (x, rng)

        x, _ = jax.lax.fori_loop(0, T, body, (x, rng))
        return x

    def inference(self, text, text_lengths, out_len: Optional[int] = None,
                  speed: float = 1.0):
        """-> (mel (B, T, odim), olens)."""
        out_len = int(out_len or self.max_frames)
        hs, _ = self.encoder(text, text_lengths, deterministic=True)
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(hs, tmask, deterministic=True)
        dur = jnp.round((jnp.exp(d_pred) - 1.0) / speed)
        dur = jnp.maximum(jnp.where(tmask, dur, 0.0), 0.0).astype(jnp.int32)
        p_pred = self.pitch_predictor(hs, tmask, deterministic=True)
        e_pred = self.energy_predictor(hs, tmask, deterministic=True)
        hs = hs + self.pitch_embed(p_pred[:, :, None]) \
            + self.energy_embed(e_pred[:, :, None])
        hs_exp, total = length_regulator(hs, dur, out_len)
        olens = jnp.minimum(total, out_len).astype(jnp.int32)
        mel = self.denoise_sample(hs_exp, jax.random.PRNGKey(0), out_len)
        return mel, olens
