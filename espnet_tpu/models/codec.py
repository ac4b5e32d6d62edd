"""Neural audio codecs: SoundStream, Encodec, DAC variants with
residual vector quantization.

Behavioral contract: espnet2/gan_codec/{soundstream,encodec,dac}/ —
strided conv encoder, RVQ with straight-through estimator + commitment
loss, mirrored transposed-conv decoder; GAN + reconstruction training;
codec encode/decode API of bin/gan_codec_inference.py. Family
differences implemented here:

- SoundStream: plain strided convs, ELU, single-scale mel loss.
- Encodec: dilated residual units per stage + LSTM bottleneck
  (gan_codec/encodec/encodec.py SEANet), multi-scale STFT loss.
- DAC: snake activation (x + sin^2(ax)/a), dilated residual units,
  factorized low-dim L2-normalized codebooks
  (gan_codec/dac/dac.py / descript-audio-codec), multi-scale STFT loss.

TPU-first: the RVQ codebook lookup is an argmin over an (N, K) distance
matrix per stage — one MXU matmul per stage; straight-through gradients
via stop_gradient identity; all losses computed in the same jitted
program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.ops.mel import log_mel
from espnet_tpu.ops.stft import stft_power


def snake(x, alpha):
    """Snake activation x + sin^2(alpha x)/alpha (DAC)."""
    return x + jnp.sin(alpha * x) ** 2 / jnp.maximum(alpha, 1e-9)


class Snake(nn.Module):
    """Channelwise learnable-frequency snake."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
        return snake(x, alpha)


class ResidualUnit(nn.Module):
    """Dilated conv residual unit (SEANet / DAC block)."""

    channels: int
    dilation: int = 1
    kernel: int = 7
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        h = Snake()(x) if self.activation == "snake" else nn.elu(x)
        h = nn.Conv(self.channels, (self.kernel,),
                    kernel_dilation=(self.dilation,), padding="SAME")(h)
        h = Snake()(h) if self.activation == "snake" else nn.elu(h)
        h = nn.Conv(self.channels, (1,))(h)
        return x + h


class ResidualVQ(nn.Module):
    """num_quantizers codebooks applied to successive residuals.

    proj_dim (DAC factorization): inputs are projected to a small
    L2-normalized lookup space per quantizer, codes decode through an
    output projection — codebook collapse resistance at large K.
    """

    num_quantizers: int = 4
    codebook_size: int = 256
    dim: int = 128
    proj_dim: Optional[int] = None

    def setup(self):
        d = self.proj_dim or self.dim
        self.codebooks = self.param(
            "codebooks", nn.initializers.normal(1.0),
            (self.num_quantizers, self.codebook_size, d))
        if self.proj_dim is not None:
            self.proj_in = [nn.Dense(self.proj_dim, name=f"in{q}")
                            for q in range(self.num_quantizers)]
            self.proj_out = [nn.Dense(self.dim, name=f"out{q}")
                             for q in range(self.num_quantizers)]

    def _norm(self, v):
        if self.proj_dim is None:
            return v
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    def _codebook(self, q):
        return self._norm(self.codebooks[q])

    def __call__(self, z):
        """z: (B, T, D) -> (quantized, codes (B, T, Q), commit_loss)."""
        residual = z
        quantized = jnp.zeros_like(z)
        codes = []
        commit = 0.0
        for q in range(self.num_quantizers):
            cb = self._codebook(q)  # (K, d)
            r = self._norm(self.proj_in[q](residual)) \
                if self.proj_dim is not None else residual
            d = (jnp.sum(r ** 2, -1, keepdims=True)
                 - 2 * jnp.einsum("btd,kd->btk", r, cb)
                 + jnp.sum(cb ** 2, -1)[None, None, :])
            idx = jnp.argmin(d, axis=-1)  # (B, T)
            sel = cb[idx]                 # (B, T, d)
            codes.append(idx)
            commit = commit + jnp.mean(
                (r - jax.lax.stop_gradient(sel)) ** 2)
            # codebook pull term (no EMA): move codebook toward inputs
            commit = commit + jnp.mean(
                (jax.lax.stop_gradient(r) - sel) ** 2)
            sel_d = self.proj_out[q](sel) if self.proj_dim is not None \
                else sel
            quantized = quantized + sel_d
            residual = residual - jax.lax.stop_gradient(sel_d)
        # straight-through: gradient flows to z
        quantized = z + jax.lax.stop_gradient(quantized - z)
        return quantized, jnp.stack(codes, axis=-1), commit

    def lookup(self, codes):
        """codes (B, T, Q) -> summed codebook vectors (B, T, D)."""
        z = jnp.zeros(codes.shape[:2] + (self.dim,))
        for q in range(self.num_quantizers):
            sel = self._codebook(q)[codes[..., q]]
            z = z + (self.proj_out[q](sel) if self.proj_dim is not None
                     else sel)
        return z


class ConvEncoder(nn.Module):
    channels: int = 32
    strides: Sequence[int] = (2, 4, 5, 8)
    dim: int = 128
    activation: str = "elu"           # elu | snake
    unit_dilations: Sequence[int] = ()  # per-stage residual units
    use_lstm: bool = False            # Encodec bottleneck

    @nn.compact
    def __call__(self, wav):
        h = wav[:, :, None]
        ch = self.channels
        for i, s in enumerate(self.strides):
            for j, dil in enumerate(self.unit_dilations):
                h = ResidualUnit(h.shape[-1], dil,
                                 activation=self.activation,
                                 name=f"res{i}_{j}")(h)
            h = nn.Conv(ch, (2 * s,), strides=(s,), padding="SAME",
                        name=f"down{i}")(h)
            h = Snake()(h) if self.activation == "snake" else nn.elu(h)
            ch = min(ch * 2, 512)
        if self.use_lstm:
            h = h + nn.RNN(nn.OptimizedLSTMCell(h.shape[-1]),
                           name="lstm")(h)
        return nn.Conv(self.dim, (3,), padding="SAME", name="proj")(h)


class ConvDecoder(nn.Module):
    channels: int = 32
    strides: Sequence[int] = (2, 4, 5, 8)
    activation: str = "elu"
    unit_dilations: Sequence[int] = ()
    use_lstm: bool = False

    @nn.compact
    def __call__(self, z):
        ch = min(self.channels * 2 ** (len(self.strides) - 1), 512)
        h = nn.Conv(ch, (3,), padding="SAME", name="proj")(z)
        if self.use_lstm:
            h = h + nn.RNN(nn.OptimizedLSTMCell(ch), name="lstm")(h)
        for i, s in enumerate(reversed(self.strides)):
            h = Snake()(h) if self.activation == "snake" else nn.elu(h)
            h = nn.ConvTranspose(max(ch // 2, self.channels), (2 * s,),
                                 strides=(s,), padding="SAME",
                                 name=f"up{i}")(h)
            ch = max(ch // 2, self.channels)
            for j, dil in enumerate(self.unit_dilations):
                h = ResidualUnit(ch, dil, activation=self.activation,
                                 name=f"res{i}_{j}")(h)
        return jnp.tanh(nn.Conv(1, (3,), padding="SAME",
                                name="out")(h))[..., 0]


_CODEC_DEFAULTS = {
    # activation, unit_dilations, use_lstm, proj_dim, multi_scale_stft
    "soundstream": ("elu", (), False, None, False),
    "encodec": ("elu", (1, 3), True, None, True),
    "dac": ("snake", (1, 3, 9), False, 8, True),
}


class CodecModel(nn.Module):
    """Full codec with reconstruction (+mel) + commitment objective; GAN
    discriminators can wrap this exactly like the vocoder GAN."""

    fs: int = 16000
    codec_type: str = "soundstream"   # soundstream | encodec | dac
    channels: int = 32
    strides: Sequence[int] = (2, 4, 5, 8)
    code_dim: int = 128
    num_quantizers: int = 4
    codebook_size: int = 256
    lambda_commit: float = 0.25
    lambda_mel: float = 1.0

    def setup(self):
        act, dils, lstm, proj, self._ms_stft = _CODEC_DEFAULTS[
            self.codec_type]
        self.encoder = ConvEncoder(self.channels, self.strides,
                                   self.code_dim, activation=act,
                                   unit_dilations=dils, use_lstm=lstm)
        self.rvq = ResidualVQ(self.num_quantizers, self.codebook_size,
                              self.code_dim, proj_dim=proj)
        self.decoder = ConvDecoder(self.channels, self.strides,
                                   activation=act, unit_dilations=dils,
                                   use_lstm=lstm)

    @property
    def hop(self):
        h = 1
        for s in self.strides:
            h *= s
        return h

    def encode(self, wav):
        """(B, S) -> codes (B, T, Q)."""
        z = self.encoder(wav)
        _, codes, _ = self.rvq(z)
        return codes

    def decode(self, codes):
        """codes (B, T, Q) -> (B, S)."""
        return self.decoder(self.rvq.lookup(codes))

    def _spectral_loss(self, recon, wav):
        if not self._ms_stft:
            p1, _ = stft_power(recon, None, n_fft=256, hop_length=64)
            p2, _ = stft_power(wav, None, n_fft=256, hop_length=64)
            m1 = log_mel(p1, fs=self.fs, n_fft=256, n_mels=40)
            m2 = log_mel(p2, fs=self.fs, n_fft=256, n_mels=40)
            return jnp.mean(jnp.abs(m1 - m2))
        # multi-scale STFT (encodec/dac loss)
        total = 0.0
        for n_fft in (128, 256, 512):
            p1, _ = stft_power(recon, None, n_fft=n_fft,
                               hop_length=n_fft // 4)
            p2, _ = stft_power(wav, None, n_fft=n_fft,
                               hop_length=n_fft // 4)
            a1 = jnp.sqrt(jnp.maximum(p1, 1e-10))
            a2 = jnp.sqrt(jnp.maximum(p2, 1e-10))
            total = total + jnp.mean(jnp.abs(a1 - a2)) \
                + jnp.mean(jnp.abs(jnp.log(a1) - jnp.log(a2)))
        return total / 3.0

    def __call__(self, speech, speech_lengths=None, *, deterministic=True):
        wav = speech
        S = wav.shape[1]
        S_trim = (S // self.hop) * self.hop
        wav = wav[:, :S_trim]
        z = self.encoder(wav)
        zq, codes, commit = self.rvq(z)
        recon = self.decoder(zq)
        n = min(recon.shape[1], wav.shape[1])
        recon, wav = recon[:, :n], wav[:, :n]
        l_time = jnp.mean(jnp.abs(recon - wav))
        l_mel = self._spectral_loss(recon, wav)
        loss = l_time + self.lambda_mel * l_mel + self.lambda_commit * commit
        stats = {"loss": loss, "recon_l1": l_time, "mel_l1": l_mel,
                 "commit": commit}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)
