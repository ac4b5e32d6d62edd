"""Neural audio codec: SoundStream/Encodec-style conv codec with
residual vector quantization.

Behavioral contract: espnet2/gan_codec/ (SoundStream, Encodec, DAC —
strided conv encoder, RVQ with straight-through estimator + commitment
loss, mirrored transposed-conv decoder; GAN + reconstruction training;
codec encode/decode API of bin/gan_codec_inference.py).

TPU-first: the RVQ codebook lookup is an argmin over an (N, K) distance
matrix per stage — one MXU matmul per stage; straight-through gradients
via stop_gradient identity.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.ops.mel import log_mel
from espnet_tpu.ops.stft import stft_power


class ResidualVQ(nn.Module):
    """num_quantizers codebooks applied to successive residuals."""

    num_quantizers: int = 4
    codebook_size: int = 256
    dim: int = 128

    def setup(self):
        self.codebooks = self.param(
            "codebooks", nn.initializers.normal(1.0),
            (self.num_quantizers, self.codebook_size, self.dim))

    def __call__(self, z):
        """z: (B, T, D) -> (quantized, codes (B, T, Q), commit_loss)."""
        books = self.codebooks
        residual = z
        quantized = jnp.zeros_like(z)
        codes = []
        commit = 0.0
        for q in range(self.num_quantizers):
            cb = books[q]  # (K, D)
            d = (jnp.sum(residual ** 2, -1, keepdims=True)
                 - 2 * jnp.einsum("btd,kd->btk", residual, cb)
                 + jnp.sum(cb ** 2, -1)[None, None, :])
            idx = jnp.argmin(d, axis=-1)  # (B, T)
            sel = cb[idx]                 # (B, T, D)
            codes.append(idx)
            commit = commit + jnp.mean(
                (residual - jax.lax.stop_gradient(sel)) ** 2)
            # codebook pull term (no EMA): move codebook toward inputs
            commit = commit + jnp.mean(
                (jax.lax.stop_gradient(residual) - sel) ** 2)
            quantized = quantized + sel
            residual = residual - jax.lax.stop_gradient(sel)
        # straight-through: gradient flows to z
        quantized = z + jax.lax.stop_gradient(quantized - z)
        return quantized, jnp.stack(codes, axis=-1), commit

    def lookup(self, codes):
        """codes (B, T, Q) -> summed codebook vectors (B, T, D)."""
        z = jnp.zeros(codes.shape[:2] + (self.dim,))
        for q in range(self.num_quantizers):
            z = z + self.codebooks[q][codes[..., q]]
        return z


class ConvEncoder(nn.Module):
    channels: int = 32
    strides: Sequence[int] = (2, 4, 5, 8)
    dim: int = 128

    @nn.compact
    def __call__(self, wav):
        h = wav[:, :, None]
        ch = self.channels
        for i, s in enumerate(self.strides):
            h = nn.Conv(ch, (2 * s,), strides=(s,), padding="SAME",
                        name=f"down{i}")(h)
            h = nn.elu(h)
            ch = min(ch * 2, 512)
        return nn.Conv(self.dim, (3,), padding="SAME", name="proj")(h)


class ConvDecoder(nn.Module):
    channels: int = 32
    strides: Sequence[int] = (2, 4, 5, 8)

    @nn.compact
    def __call__(self, z):
        ch = min(self.channels * 2 ** (len(self.strides) - 1), 512)
        h = nn.Conv(ch, (3,), padding="SAME", name="proj")(z)
        for i, s in enumerate(reversed(self.strides)):
            h = nn.elu(h)
            h = nn.ConvTranspose(max(ch // 2, self.channels), (2 * s,),
                                 strides=(s,), padding="SAME",
                                 name=f"up{i}")(h)
            ch = max(ch // 2, self.channels)
        return jnp.tanh(nn.Conv(1, (3,), padding="SAME",
                                name="out")(h))[..., 0]


class CodecModel(nn.Module):
    """Full codec with reconstruction (+mel) + commitment objective; GAN
    discriminators can wrap this exactly like the vocoder GAN."""

    fs: int = 16000
    channels: int = 32
    strides: Sequence[int] = (2, 4, 5, 8)
    code_dim: int = 128
    num_quantizers: int = 4
    codebook_size: int = 256
    lambda_commit: float = 0.25
    lambda_mel: float = 1.0

    def setup(self):
        self.encoder = ConvEncoder(self.channels, self.strides,
                                   self.code_dim)
        self.rvq = ResidualVQ(self.num_quantizers, self.codebook_size,
                              self.code_dim)
        self.decoder = ConvDecoder(self.channels, self.strides)

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
        p1, _ = stft_power(recon, None, n_fft=256, hop_length=64)
        p2, _ = stft_power(wav, None, n_fft=256, hop_length=64)
        m1 = log_mel(p1, fs=self.fs, n_fft=256, n_mels=40)
        m2 = log_mel(p2, fs=self.fs, n_fft=256, n_mels=40)
        l_mel = jnp.mean(jnp.abs(m1 - m2))
        loss = l_time + self.lambda_mel * l_mel + self.lambda_commit * commit
        stats = {"loss": loss, "recon_l1": l_time, "mel_l1": l_mel,
                 "commit": commit}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)
