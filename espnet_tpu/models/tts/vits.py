"""VITS: end-to-end text-to-waveform with MAS, flows, and GAN training.

Behavioral contract: espnet2/gan_tts/vits/vits.py (+ generator.py,
posterior_encoder.py, residual_coupling.py, text_encoder.py) — text
encoder emits prior stats; posterior encoder encodes linear spectrogram;
a residual-coupling flow maps posterior z to the prior space; monotonic
alignment search (espnet2/gan_tts/vits/monotonic_align/core.pyx — here
ops/monotonic_align.py) aligns text to frames; HiFiGAN decodes random
windows of z to waveform; training is adversarial + mel + KL + duration
losses with two optimizers. `inference` (vits.py:560) samples the prior,
inverts the flow, and decodes.

Duration model: either the reference's stochastic flow duration
predictor (gan_tts/vits/duration_predictor.py:25 — see
stochastic_duration.py; `use_sdp=True`) or a deterministic log-MSE
predictor (the JETS-sibling simplification; `use_sdp=False`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.fastspeech2 import VariancePredictor, length_regulator
from espnet_tpu.models.tts.hifigan import HiFiGANGenerator, ResBlock
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.ops.monotonic_align import maximum_path
from espnet_tpu.utils.masks import make_non_pad_mask


class PosteriorEncoder(nn.Module):
    """Conv stack: linear spec -> (m, logs) -> sampled z
    (vits/posterior_encoder.py WaveNet-lite)."""

    out_channels: int = 96
    hidden: int = 96
    layers: int = 4
    kernel: int = 5

    @nn.compact
    def __call__(self, spec, valid_mask, rng):
        # LayerNorm kills the raw linear-spec scale (bins reach ~20+)
        # and gated-tanh residual units keep the stream bounded — the
        # WaveNet-posterior property (vits/posterior_encoder.py) that
        # makes z come out near unit scale. Without it z inherits the
        # input scale, MAS scores are swamped by per-dim noise, the
        # alignment never locks on, and the KL settles in the
        # degenerate wide-q = wide-p equilibrium (measured: sigma_q ~ 4,
        # residual ~ 4, KL/dim ~ 0.02, yet the prior carries no
        # content).
        h = nn.LayerNorm(name="pre_norm")(
            nn.Conv(self.hidden, (1,), name="pre")(spec))
        for i in range(self.layers):
            g = nn.Conv(2 * self.hidden, (self.kernel,), padding="SAME",
                        kernel_dilation=(2 ** (i % 3),), name=f"conv{i}")(h)
            a, b = jnp.split(g, 2, axis=-1)
            u = jnp.tanh(a) * jax.nn.sigmoid(b)      # gated tanh unit
            h = h + nn.Conv(self.hidden, (1,), name=f"res{i}")(u)
            h = jnp.where(valid_mask[:, :, None], h, 0.0)
        h = nn.LayerNorm(name="post_norm")(h)
        stats = nn.Conv(2 * self.out_channels, (1,), name="proj")(h)
        m, logs = jnp.split(stats, 2, axis=-1)
        logs = jnp.clip(logs, -7.0, 7.0)
        z = m + jnp.exp(logs) * jax.random.normal(rng, m.shape)
        return jnp.where(valid_mask[:, :, None], z, 0.0), m, logs


class ResidualCouplingLayer(nn.Module):
    """Affine(mean-only) coupling over channel halves
    (vits/residual_coupling.py, mean_only=True)."""

    hidden: int = 96
    kernel: int = 5
    layers: int = 3

    @nn.compact
    def __call__(self, x, valid_mask, reverse: bool = False):
        # precision="highest": the inverse must reproduce the forward's
        # shift m(xa) bitwise-closely; TPU default bf16 matmul rounding
        # amplifies tiny input perturbations across stacked couplings
        # (measured: 0.11 roundtrip error at 4 flows vs 2e-7 exact).
        xa, xb = jnp.split(x, 2, axis=-1)
        h = nn.Conv(self.hidden, (1,), name="pre",
                    precision="highest")(xa)
        for i in range(self.layers):
            h = h + nn.Conv(self.hidden, (self.kernel,), padding="SAME",
                            name=f"conv{i}", precision="highest")(
                nn.gelu(h))
            h = jnp.where(valid_mask[:, :, None], h, 0.0)
        m = nn.Conv(xb.shape[-1], (1,), name="proj",
                    precision="highest")(h)
        if not reverse:
            xb = xb + m
        else:
            xb = xb - m
        out = jnp.concatenate([xa, xb], axis=-1)
        return jnp.where(valid_mask[:, :, None], out, 0.0)


class ResidualCouplingFlow(nn.Module):
    flows: int = 4
    hidden: int = 96

    def setup(self):
        self.layers = [ResidualCouplingLayer(self.hidden, name=f"flow{i}")
                       for i in range(self.flows)]

    def __call__(self, x, valid_mask, reverse: bool = False):
        # forward is (flip . L_i) composed left-to-right, so the inverse
        # must unflip BEFORE each inverted coupling: (flip . L)^-1 =
        # L^-1 . flip  (flip is an involution)
        if not reverse:
            for layer in self.layers:
                x = layer(x, valid_mask, reverse=False)
                x = x[..., ::-1]  # channel flip between couplings
        else:
            for layer in reversed(self.layers):
                x = x[..., ::-1]
                x = layer(x, valid_mask, reverse=True)
        return x


class VITS(nn.Module):
    """Generator side; pair with HiFiGANMultiDiscriminator via
    models/tts/gan_vocoder.py-style GAN training."""

    vocab_size: int
    z_channels: int = 96
    hidden: int = 96
    spec_channels: int = 65        # n_fft//2+1 of the linear spec
    segment_frames: int = 16       # random window decoded by HiFiGAN
    hop_length: int = 64
    text_encoder_conf: dict = None
    generator_conf: dict = None
    use_sdp: bool = False          # stochastic flow duration predictor
    sdp_conf: dict = None

    def _build_text_encoder(self):
        tc = dict(self.text_encoder_conf or {})
        tc.setdefault("output_size", self.hidden)
        tc.setdefault("input_layer", "embed")
        return TransformerEncoder(input_size=self.vocab_size, **tc)

    def setup(self):
        self.text_encoder = self._build_text_encoder()
        self.text_proj = nn.Dense(2 * self.z_channels)
        self.posterior = PosteriorEncoder(self.z_channels, self.hidden)
        self.flow = ResidualCouplingFlow(hidden=self.hidden)
        gc = dict(self.generator_conf or {})
        gc.setdefault("in_channels", self.z_channels)
        self.decoder = self._build_decoder(gc)
        if self.use_sdp:
            from espnet_tpu.models.tts.stochastic_duration import \
                StochasticDurationPredictor
            sc = dict(self.sdp_conf or {})
            sc.setdefault("filter_channels", self.hidden)
            self.duration_predictor = StochasticDurationPredictor(**sc)
        else:
            self.duration_predictor = VariancePredictor(chans=self.hidden)

    def _build_decoder(self, gc):
        return HiFiGANGenerator(**gc)

    def _decode(self, z, *, f0=None, rng=None):
        """Waveform decode hook; subclasses may consume f0/rng (DDSP)."""
        return self.decoder(z)

    def _prior(self, text, text_lengths, midi=None, *,
               deterministic=True):
        h, hlens = self.text_encoder(text, text_lengths,
                                     deterministic=deterministic)
        stats = self.text_proj(h)
        m_p, logs_p = jnp.split(stats, 2, axis=-1)
        logs_p = jnp.clip(logs_p, -7.0, 7.0)
        return h, m_p, logs_p, hlens

    def __call__(self, text, text_lengths, spec, spec_lengths, rng,
                 midi=None, *, deterministic=True):
        """Training forward: returns pieces for the GAN wrapper.

        Returns dict: wav_seg_hat, segment start indices, kl_loss,
        dur_loss, z slices.
        """
        B, S = text.shape
        h_text, m_p, logs_p, _ = self._prior(text, text_lengths, midi,
                                             deterministic=deterministic)
        t_mask = make_non_pad_mask(text_lengths, S)
        f_mask = make_non_pad_mask(spec_lengths, spec.shape[1])
        r1, r2, r3 = jax.random.split(rng, 3)
        z, m_q, logs_q = self.posterior(spec, f_mask, r1)
        z_p = self.flow(z, f_mask, reverse=False)

        # MAS in the prior space: value[s, t] = log N(z_p[t]; m_p[s], logs_p[s])
        neg_cent = (
            -0.5 * jnp.einsum("btd,bsd->bst", z_p ** 2,
                              jnp.exp(-2 * logs_p))
            + jnp.einsum("btd,bsd->bst", z_p, m_p * jnp.exp(-2 * logs_p))
            - 0.5 * jnp.sum(m_p ** 2 * jnp.exp(-2 * logs_p) + 2 * logs_p,
                            axis=-1)[:, :, None]
            - 0.5 * jnp.log(2 * jnp.pi) * self.z_channels)
        path = jax.lax.stop_gradient(
            maximum_path(neg_cent, text_lengths, spec_lengths))  # (B,S,T)

        durations = jnp.sum(path, axis=2)  # (B, S)
        if self.use_sdp:
            r_dur, r2 = jax.random.split(r2)
            nll = self.duration_predictor(
                h_text, t_mask, durations, r_dur, reverse=False,
                deterministic=deterministic)  # (B,)
            dur_loss = jnp.sum(nll) / jnp.maximum(jnp.sum(t_mask), 1)
        else:
            d_pred = self.duration_predictor(h_text, t_mask,
                                             deterministic=deterministic)
            log_d_tgt = jnp.log(durations + 1.0)
            dur_loss = jnp.sum(
                jnp.where(t_mask, (d_pred - log_d_tgt) ** 2,
                          0.0)) / jnp.maximum(jnp.sum(t_mask), 1)

        # expand prior stats to frames via the path
        m_p_f = jnp.einsum("bst,bsd->btd", path, m_p)
        logs_p_f = jnp.einsum("bst,bsd->btd", path, logs_p)
        # KL(q||p) via the z_p sample (vits/losses.py kl_loss: the
        # sample already carries q's variance, so no exp(2*logs_q)
        # term), summed over channels and averaged over frames — NOT
        # per-dim: per-dim normalization silently scales lambda_kl by
        # 1/z_channels and the prior never learns the content.
        kl = (logs_p_f - logs_q - 0.5
              + 0.5 * (z_p - m_p_f) ** 2 * jnp.exp(-2 * logs_p_f))
        kl = jnp.sum(jnp.where(f_mask[:, :, None], kl, 0.0)) / jnp.maximum(
            jnp.sum(f_mask), 1)

        # random segment of z -> waveform
        T = z.shape[1]
        seg = self.segment_frames
        max_start = jnp.maximum(spec_lengths - seg, 1)
        starts = jax.random.randint(r2, (B,), 0, 2 ** 30) % max_start
        z_seg = jax.vmap(
            lambda zb, s: jax.lax.dynamic_slice_in_dim(zb, s, seg, axis=0))(
            z, starts)
        f0_seg = None
        if midi is not None:
            # frame-level F0 from the score notes through the MAS path
            f0 = 440.0 * 2.0 ** ((midi.astype(jnp.float32) - 69.0) / 12.0)
            f0_f = jnp.einsum("bst,bs->bt", path, f0)
            f0_seg = jax.vmap(
                lambda fb, s: jax.lax.dynamic_slice_in_dim(
                    fb, s, seg, axis=0))(f0_f, starts)
        wav_hat = self._decode(z_seg, f0=f0_seg, rng=r3)  # (B, seg*hop)
        return {"wav_hat": wav_hat, "starts": starts, "kl_loss": kl,
                "dur_loss": dur_loss}

    def inference(self, text, text_lengths, rng=None, midi=None,
                  score_durations=None, *, noise_scale: float = 0.667,
                  max_frames: int = 512, speed: float = 1.0):
        """-> (wav (B, max_frames*hop), feat frame lengths). Score
        durations (frames per note) override the predictor when given
        (the VISinger singing path follows the score's timing)."""
        h_text, m_p, logs_p, _ = self._prior(text, text_lengths, midi)
        t_mask = make_non_pad_mask(text_lengths, text.shape[1])
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if score_durations is not None:
            durations = score_durations.astype(jnp.int32)
        elif self.use_sdp:
            r_dur, rng = jax.random.split(rng)
            # reference vits.py:560 inference: w = exp(logw) / speed, ceil
            logw = self.duration_predictor(
                h_text, t_mask, None, r_dur, reverse=True,
                noise_scale=0.8, deterministic=True)
            durations = jnp.clip(
                jnp.ceil(jnp.exp(logw) / speed), 0, None).astype(jnp.int32)
        else:
            d_pred = self.duration_predictor(h_text, t_mask,
                                             deterministic=True)
            durations = jnp.clip(
                jnp.round((jnp.exp(d_pred) - 1.0) / speed),
                0, None).astype(jnp.int32)
        durations = jnp.where(t_mask, durations, 0)
        m_p_f, total = length_regulator(m_p, durations, max_frames)
        logs_p_f, _ = length_regulator(logs_p, durations, max_frames)
        olens = jnp.minimum(total, max_frames).astype(jnp.int32)
        f_mask = make_non_pad_mask(olens, max_frames)
        ra, rb = jax.random.split(rng)
        z_p = m_p_f + jnp.exp(logs_p_f) * noise_scale * \
            jax.random.normal(ra, m_p_f.shape)
        z = self.flow(z_p, f_mask, reverse=True)
        f0_f = None
        if midi is not None:
            f0 = 440.0 * 2.0 ** ((midi.astype(jnp.float32) - 69.0) / 12.0)
            f0_f, _ = length_regulator(f0[..., None], durations, max_frames)
            f0_f = f0_f[..., 0] * f_mask
        wav = self._decode(z, f0=f0_f, rng=rb)
        return wav, olens


class VISinger(VITS):
    """VISinger: VITS conditioned on the musical score
    (espnet2/gan_svs/vits/ — phone + MIDI-pitch embeddings feed the
    prior text encoder; posterior, flow, MAS, HiFiGAN decoding, and the
    two-optimizer GAN training are the unchanged VITS machinery; at
    inference the score durations drive timing exactly).

    Train with the same GAN wrapper as VITS (models/tts/vits_gan.py) by
    adding `midi` to the batch.
    """

    midi_vocab: int = 129    # MIDI note ids, 128 = rest/unknown

    def setup(self):
        super().setup()
        self.phone_embed = nn.Embed(self.vocab_size, self.hidden)
        self.midi_embed = nn.Embed(self.midi_vocab, self.hidden)

    def _build_text_encoder(self):
        # the encoder input is the summed phone+midi embedding sequence
        # instead of raw token ids
        tc = dict(self.text_encoder_conf or {})
        tc.setdefault("output_size", self.hidden)
        tc["input_layer"] = "linear"
        return TransformerEncoder(input_size=self.hidden, **tc)

    def _prior(self, text, text_lengths, midi=None, *,
               deterministic=True):
        x = self.phone_embed(text)
        if midi is not None:
            x = x + self.midi_embed(jnp.clip(midi, 0, self.midi_vocab - 1))
        h, hlens = self.text_encoder(x, text_lengths,
                                     deterministic=deterministic)
        stats = self.text_proj(h)
        m_p, logs_p = jnp.split(stats, 2, axis=-1)
        return h, m_p, jnp.clip(logs_p, -7.0, 7.0), hlens


class DDSPSynthesizer(nn.Module):
    """VISinger2's differentiable-DSP branch (espnet2/gan_svs/visinger2/
    ddsp.py + visinger2_vocoder.py Generator_Harm / Generator_Noise):
    a bank of F0-driven harmonic sinusoids with per-frame amplitude
    envelopes predicted from the latent, plus frame-wise FIR-filtered
    white noise. Both are synthesized at sample rate with static shapes
    (zero-order-hold frame upsampling; harmonics above Nyquist are
    masked instead of resampled — the anti-aliasing role)."""

    hop_length: int
    n_harmonics: int = 8
    noise_taps: int = 32
    sr: int = 16000

    @nn.compact
    def __call__(self, h, f0, rng):
        """h (B, T, D) frame latent, f0 (B, T) Hz -> (B, T*hop, 2)
        stacked [harmonic, noise] waveform components."""
        B, T, D = h.shape
        hop = self.hop_length
        amps = nn.softplus(nn.Dense(self.n_harmonics, name="harm_amp")(h))
        amps = amps / (jnp.sum(amps, -1, keepdims=True) + 1e-6)
        gain = nn.sigmoid(nn.Dense(1, name="harm_gain")(h))
        amps = amps * gain
        f0_s = jnp.repeat(f0, hop, axis=1)                  # (B, S)
        amps_s = jnp.repeat(amps, hop, axis=1)              # (B, S, H)
        k = jnp.arange(1, self.n_harmonics + 1, dtype=jnp.float32)
        phase = 2.0 * jnp.pi * jnp.cumsum(f0_s, axis=1) / self.sr
        alias = (f0_s[..., None] * k < self.sr / 2).astype(h.dtype)
        voiced = (f0_s > 1.0).astype(h.dtype)
        harm = jnp.sum(jnp.sin(phase[..., None] * k) * amps_s * alias,
                       -1) * voiced
        # noise: per-frame FIR over white noise (one unfold einsum)
        filt = nn.Dense(self.noise_taps, name="noise_filt")(h)  # (B,T,K)
        noise = jax.random.uniform(
            rng, (B, T, hop + self.noise_taps - 1), minval=-1.0,
            maxval=1.0)
        idx = jnp.arange(hop)[:, None] + jnp.arange(self.noise_taps)[None]
        filtered = jnp.einsum("bthk,btk->bth", noise[:, :, idx], filt)
        return jnp.stack([harm, filtered.reshape(B, T * hop)], axis=-1)


class VISinger2Generator(nn.Module):
    """HiFiGAN-family upsampler with DDSP conditioning (espnet2/gan_svs/
    visinger2/visinger2_vocoder.py VISinger2VocoderGenerator): at each
    upsampling resolution the harmonic+noise waveforms are average-
    pooled down to that rate and injected into the feature stack."""

    in_channels: int = 96
    channels: int = 256
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 4, 4)
    upsample_kernel_sizes: Sequence[int] = (16, 8, 8)
    resblock_kernel_sizes: Sequence[int] = (3, 7)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3), (1, 3))

    @nn.compact
    def __call__(self, z, ddsp):
        """z (B, T, C) latent; ddsp (B, T*prod(scales), 2)."""
        total = 1
        for s in self.upsample_scales:
            total *= s
        h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    name="conv_pre")(z)
        ch = self.channels
        rate = 1
        for i, (s, k) in enumerate(zip(self.upsample_scales,
                                       self.upsample_kernel_sizes)):
            ch = ch // 2
            rate *= s
            h = nn.leaky_relu(h, 0.1)
            h = nn.ConvTranspose(ch, (k,), strides=(s,), padding="SAME",
                                 name=f"upsample{i}")(h)
            # pool the ddsp components down to this resolution
            f = total // rate
            B, S, C2 = ddsp.shape
            d = ddsp.reshape(B, S // f, f, C2).mean(axis=2)
            h = h + nn.Conv(ch, (1,), name=f"ddsp_proj{i}")(d)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilations)):
                r = ResBlock(ch, rk, rd, name=f"resblock{i}_{j}")(h)
                acc = r if acc is None else acc + r
            h = acc / len(self.resblock_kernel_sizes)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Conv(1, (self.kernel_size,), padding="SAME",
                    name="conv_post")(h)
        # the DDSP harmonic source is summed in at the output — the
        # generator learns the residual (visinger2_vocoder.py contract)
        return jnp.tanh(h)[..., 0] + 0.1 * ddsp[..., 0]


class VISinger2(VISinger):
    """VISinger2 (Zhang et al. 2022; espnet2/gan_svs/visinger2/): the
    VISinger latent pipeline with a DDSP synthesizer — score-F0-driven
    harmonic oscillator bank + filtered noise — conditioning the
    waveform decoder at every resolution. The score midi supplies the
    F0 contour (expanded to frames by the MAS path in training, by the
    score durations at inference)."""

    n_harmonics: int = 8
    noise_taps: int = 32
    fs: int = 16000

    def setup(self):
        super().setup()
        self.ddsp = DDSPSynthesizer(hop_length=self.hop_length,
                                    n_harmonics=self.n_harmonics,
                                    noise_taps=self.noise_taps,
                                    sr=self.fs)

    def _build_decoder(self, gc):
        gc = dict(gc)
        for key in ("out_channels",):
            gc.pop(key, None)
        return VISinger2Generator(**gc)

    def _decode(self, z, *, f0=None, rng=None):
        if f0 is None:
            f0 = jnp.zeros(z.shape[:2], z.dtype)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        comps = self.ddsp(z, f0, rng)
        return self.decoder(z, comps)
