"""Sliding-window and fused frontends.

Behavioral contracts:
- SlidingWindowFrontend: espnet2/asr/frontend/windowing.py — frames the
  raw waveform (win_length, hop_length) with no window function, for
  raw-audio preencoders (Sinc convs). Trailing samples are discarded
  (the reference documents the same).
- FusedFrontends: espnet2/asr/frontend/fused.py — run several frontends
  on the same audio, project each to proj_dim with a learned linear
  layer ("linear_projection" align method), truncate to the shortest
  frame count, and concatenate along features. Offline environment:
  sub-frontends are limited to 'default' (the reference also supports
  s3prl, which needs hub downloads).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.frontends.default import DefaultFrontend
from espnet_tpu.ops.stft import frame_signal


@dataclasses.dataclass
class SlidingWindowFrontend:
    """Stateless raw-audio framing: (B, S) -> (B, T, win_length)."""

    win_length: int = 400
    hop_length: int = 160
    channels: int = 1
    fs: int | None = None

    @property
    def output_size(self) -> int:
        return self.win_length * self.channels

    def __call__(self, speech: jnp.ndarray, lengths: jnp.ndarray):
        if speech.ndim == 3:  # (B, S, C) multi-channel -> stack channels
            B, S, C = speech.shape
            frames = frame_signal(speech.transpose(0, 2, 1).reshape(B * C, S),
                                  self.win_length, self.hop_length)
            T = frames.shape[1]
            frames = frames.reshape(B, C, T, self.win_length)
            frames = frames.transpose(0, 2, 1, 3).reshape(B, T, -1)
        else:
            frames = frame_signal(speech, self.win_length, self.hop_length)
        olens = None
        if lengths is not None:
            olens = jnp.maximum(
                (lengths - self.win_length) // self.hop_length + 1, 0)
        return frames, olens


class FusedFrontends(nn.Module):
    """Learned fusion of several feature frontends."""

    frontends: tuple = ()          # tuple of dicts, each a frontend conf
    align_method: str = "linear_projection"
    proj_dim: int = 100
    fs: int = 16000

    @property
    def output_size(self) -> int:
        return self.proj_dim * max(len(self.frontends), 1)

    @nn.compact
    def __call__(self, speech, lengths):
        if self.align_method != "linear_projection":
            raise ValueError(
                f"unsupported align_method: {self.align_method}")
        outs, lens = [], []
        for i, conf in enumerate(self.frontends):
            c = dict(conf)
            ftype = c.pop("frontend_type", "default")
            if ftype != "default":
                raise ValueError(
                    f"offline build supports frontend_type='default' only "
                    f"(got {ftype!r}; the reference's s3prl sub-frontend "
                    f"needs hub downloads)")
            c.setdefault("fs", self.fs)
            feats, flens = DefaultFrontend(**c)(speech, lengths)
            outs.append(feats)
            lens.append(flens)
        t_min = min(f.shape[1] for f in outs)
        projected = [nn.Dense(self.proj_dim, name=f"proj{i}")(f[:, :t_min])
                     for i, f in enumerate(outs)]
        feats = jnp.concatenate(projected, axis=-1)
        olens = None
        if lengths is not None:
            olens = jnp.minimum(jnp.stack(lens, 0).min(0), t_min)
        return feats, olens
