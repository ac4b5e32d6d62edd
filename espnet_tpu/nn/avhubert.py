"""Audio-visual encoder (AVHubert family).

Behavioral contract: espnet2/asr/encoder/avhubert_encoder.py
(FairseqAVHubertEncoder) — two modality stems (audio features; lip-ROI
video frames through a conv stem), frame-rate alignment, modality
dropout during training (either stream can be zeroed so the model
learns audio-only / video-only / AV operation, :240-260 role), fusion
by channel concat, then a shared transformer stack. The reference
loads fairseq checkpoints (offline-blocked here); this encoder trains
from scratch and keeps the same interface so AVSR recipes are
config-only.

Video arrives as an extra `video` batch stream (npy loader): (B, Tv,
H, W) grayscale lip crops, any frame rate — embeddings are resampled
to the audio frame axis with a static gather.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.nn.transformer import TransformerEncoder


class VideoStem(nn.Module):
    """Per-frame 2-D conv stem over lip ROIs -> frame embeddings (the
    reference's modified-ResNet front3D role, compacted to three conv
    stages; each stage halves H/W)."""

    output_size: int = 128
    channels: int = 32

    @nn.compact
    def __call__(self, video):
        B, T, H, W = video.shape
        x = video.reshape(B * T, H, W, 1)
        ch = self.channels
        for i in range(3):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.relu(nn.LayerNorm(name=f"norm{i}")(x))
            ch *= 2
        x = jnp.mean(x, axis=(1, 2))               # global average pool
        x = nn.Dense(self.output_size, name="proj")(x)
        return x.reshape(B, T, self.output_size)


class AVHubertEncoder(nn.Module):
    """input: audio feats (B, Ta, F) [+ video (B, Tv, H, W)] ->
    (B, Ta, output_size). Conforms to the shared encoder contract
    (feats, lens, deterministic, return_intermediates)."""

    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 4
    dropout_rate: float = 0.1
    video_stem_channels: int = 32
    modality_dropout: float = 0.1

    def setup(self):
        self.audio_proj = nn.Dense(self.output_size)
        self.video_stem = VideoStem(self.output_size,
                                    self.video_stem_channels)
        self.fuse = nn.Dense(self.output_size)
        self.backbone = TransformerEncoder(
            input_size=self.output_size, output_size=self.output_size,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units, num_blocks=self.num_blocks,
            dropout_rate=self.dropout_rate, input_layer="linear")

    def __call__(self, feats, feat_lens, *, video=None,
                 video_lengths=None, deterministic=True,
                 return_intermediates=False):
        B, Ta, _ = feats.shape
        a = self.audio_proj(feats)
        if video is not None:
            v = self.video_stem(video)
            Tv = v.shape[1]
            # resample video embeddings onto the audio frame axis
            idx = (jnp.arange(Ta) * Tv) // Ta
            v = jnp.take(v, idx, axis=1)
        else:
            v = jnp.zeros_like(a)
        if not deterministic and self.modality_dropout > 0:
            r = self.make_rng("dropout")
            ra, rv = jax.random.split(r)
            keep_a = (jax.random.uniform(ra, (B, 1, 1))
                      > self.modality_dropout).astype(a.dtype)
            keep_v = (jax.random.uniform(rv, (B, 1, 1))
                      > self.modality_dropout).astype(a.dtype)
            # never drop both: if both sampled out, keep audio
            keep_a = jnp.maximum(keep_a, 1.0 - keep_v)
            a = a * keep_a
            v = v * keep_v
        h = self.fuse(jnp.concatenate([a, v], axis=-1))
        out = self.backbone(h, feat_lens, deterministic=deterministic,
                            return_intermediates=return_intermediates)
        return out
