"""Score-based diffusion speech enhancement (SGMSE+ style).

Behavioral contract: espnet2/enh/diffusion/ — score_based_diffusion.py
(ScoreModel: DSM training + reverse-SDE sampling), sdes.py (OUVE SDE:
mean-reverting Ornstein-Uhlenbeck drift towards the noisy speech y with
variance-exploding diffusion), and the NCSN++ score network. Operates
in the complex STFT domain.

TPU-first: the score network is a compact conv U-Net over (T, F, 2)
real/imag channels with Fourier time embeddings; the reverse
predictor-corrector sampler is one `lax.scan` over N steps, so
enhancement is a single device program. Training draws (t, z) per
utterance and minimizes the standard denoising-score-matching loss
|| sigma(t) * s_theta(x_t, y, t) + z ||^2.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.stft import istft, stft


class FourierTimeEmbedding(nn.Module):
    dim: int = 64

    @nn.compact
    def __call__(self, t):
        """t: (B,) in [0,1] -> (B, dim)."""
        half = self.dim // 2
        freqs = jnp.exp(jnp.linspace(0.0, 6.0, half))
        ang = t[:, None] * freqs[None, :] * 2 * jnp.pi
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        emb = nn.Dense(self.dim)(emb)
        return nn.swish(emb)


class UNetBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=min(8, self.ch))(x)
        h = nn.swish(h)
        h = nn.Conv(self.ch, (3, 3), padding="SAME")(h)
        h = h + nn.Dense(self.ch)(temb)[:, None, None, :]
        h = nn.GroupNorm(num_groups=min(8, self.ch))(h)
        h = nn.swish(h)
        h = nn.Conv(self.ch, (3, 3), padding="SAME")(h)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1))(x)
        return x + h


class ScoreUNet(nn.Module):
    """Score network s_theta(x_t, y, t) over (B, T, F, C) spectrogram
    stacks; x_t and y are concatenated channelwise (4 channels in)."""

    channels: Sequence[int] = (32, 64, 96)
    temb_dim: int = 64

    @nn.compact
    def __call__(self, x_t, y, t):
        temb = FourierTimeEmbedding(self.temb_dim)(t)
        h = jnp.concatenate([x_t, y], axis=-1)
        h = nn.Conv(self.channels[0], (3, 3), padding="SAME")(h)
        skips = []
        for i, ch in enumerate(self.channels):
            h = UNetBlock(ch, name=f"down{i}")(h, temb)
            skips.append(h)
            if i < len(self.channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            name=f"pool{i}")(h)
        for i in reversed(range(len(self.channels) - 1)):
            B, Tq, Fq, _ = skips[i].shape
            h = jax.image.resize(h, (B, Tq, Fq, h.shape[-1]),
                                 method="nearest")
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = UNetBlock(self.channels[i], name=f"up{i}")(h, temb)
        return nn.Conv(2, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros, name="out")(h)


class SGMSEEnhancer(nn.Module):
    """Diffusion enhancement model with the OUVE SDE
    (espnet2/enh/diffusion/sdes.py):

        dx = theta * (y - x) dt + sigma_min (sigma_max/sigma_min)^t
             * sqrt(2 log(sigma_max/sigma_min)) dW
    """

    n_fft: int = 512
    hop_length: int = 128
    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    t_eps: float = 0.03
    channels: Sequence[int] = (32, 64, 96)
    spec_scale: float = 0.15    # spectrogram magnitude compression scale

    def setup(self):
        self.score = ScoreUNet(self.channels)

    # -- SDE helpers ---------------------------------------------------
    def _mean_scale(self, t):
        """OUVE marginal: x_t = mu(t) interpolation + sigma(t) z.
        mean = exp(-theta t) x0 + (1 - exp(-theta t)) y."""
        return jnp.exp(-self.theta * t)

    def _sigma(self, t):
        # closed-form OUVE std (Richter et al. eq. 29)
        s_min, s_max = self.sigma_min, self.sigma_max
        logr = jnp.log(s_max / s_min)
        var = (s_min ** 2) * (
            (s_max / s_min) ** (2 * t) - jnp.exp(-2 * self.theta * t)
        ) * logr / (self.theta + logr)
        return jnp.sqrt(jnp.maximum(var, 1e-10))

    def _to_spec(self, wav):
        """STFT + sqrt magnitude compression c = x * |x|^-0.5 / scale
        (SGMSE+ spectral transform; phase preserved)."""
        real, imag, olens = stft(wav, n_fft=self.n_fft,
                                 hop_length=self.hop_length)
        spec = jnp.stack([real, imag], axis=-1)
        mag = jnp.sqrt(jnp.sum(spec ** 2, -1, keepdims=True) + 1e-9)
        return spec * (mag ** -0.5) / self.spec_scale, olens

    def _to_wav(self, spec, length):
        """Invert the compression: x = c*scale * |c*scale|."""
        c = spec * self.spec_scale
        mag_c = jnp.sqrt(jnp.sum(c ** 2, -1, keepdims=True) + 1e-9)
        dec = c * mag_c
        return istft(dec[..., 0], dec[..., 1], n_fft=self.n_fft,
                     hop_length=self.hop_length, length=length)

    # -- training ------------------------------------------------------
    def __call__(self, speech_mix, speech_ref1, speech_lengths=None, *,
                 deterministic=True):
        """DSM loss. speech_mix/speech_ref1: (B, S)."""
        y, _ = self._to_spec(speech_mix)
        x0, _ = self._to_spec(speech_ref1)
        B = y.shape[0]
        rng = self.make_rng("diffusion")
        k_t, k_z = jax.random.split(rng)
        t = jax.random.uniform(k_t, (B,), minval=self.t_eps, maxval=1.0)
        z = jax.random.normal(k_z, x0.shape)
        m = self._mean_scale(t)[:, None, None, None]
        sig = self._sigma(t)[:, None, None, None]
        x_t = m * x0 + (1 - m) * y + sig * z
        s = self.score(x_t, y, t)
        # target score = -z / sigma; loss weighted by sigma^2:
        # || sigma * s + z ||^2
        loss = jnp.mean(jnp.sum((sig * s + z) ** 2, axis=(1, 2, 3))
                        / np.prod(x0.shape[1:]))
        stats = {"loss": loss}
        return loss, stats, jnp.asarray(B, jnp.float32)

    # -- inference: reverse predictor-corrector sampler -----------------
    def enhance(self, speech_mix, n_steps: int = 30, snr: float = 0.5,
                rng=None):
        """(B, S) noisy -> (B, S) enhanced, one lax.scan."""
        y, _ = self._to_spec(speech_mix)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        B = y.shape[0]
        ts = jnp.linspace(1.0, self.t_eps, n_steps)
        dt = (1.0 - self.t_eps) / (n_steps - 1)
        k0, rng = jax.random.split(rng)
        x_init = y + self._sigma(jnp.asarray(1.0)) * jax.random.normal(
            k0, y.shape)
        logr = float(np.log(self.sigma_max / self.sigma_min))

        def g(t):
            return self.sigma_min * (self.sigma_max / self.sigma_min
                                     ) ** t * jnp.sqrt(2 * logr)

        def step(carry, t):
            x, rng = carry
            rng, k1, k2 = jax.random.split(rng, 3)
            tb = jnp.full((B,), t)
            s = self.score(x, y, tb)
            # corrector (annealed Langevin)
            noise = jax.random.normal(k1, x.shape)
            s_norm = jnp.sqrt(jnp.mean(s ** 2) + 1e-12)
            eps = 2 * (snr / (s_norm + 1e-12)) ** 2 * jnp.mean(noise ** 2)
            x = x + eps * s + jnp.sqrt(2 * eps) * noise
            # predictor: reverse-SDE Euler-Maruyama, integrating from
            # t=1 down to t_eps (time step -dt)
            s = self.score(x, y, jnp.full((B,), t))
            drift = self.theta * (y - x) - g(t) ** 2 * s
            noise = jax.random.normal(k2, x.shape)
            x = x - drift * dt + g(t) * jnp.sqrt(dt) * noise
            return (x, rng), None

        (x, _), _ = jax.lax.scan(step, (x_init, rng), ts)
        return self._to_wav(x, speech_mix.shape[1])
