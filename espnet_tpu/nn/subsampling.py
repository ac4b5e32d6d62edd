"""Convolutional subsampling front blocks.

Behavioral contract: espnet2/legacy/nets/pytorch_backend/transformer/
subsampling.py:386-783 (Conv2dSubsampling x2/x4/x6/x8 — two/three conv
layers, kernel 3 or 5, stride 2 or 3, ReLU, then a linear projection of
the flattened (channel, freq') axis). Length math mirrors the reference's
slicing semantics so feat lengths match decode-side expectations.

TPU notes: the (B, T, F) input is treated as a 1-channel image; convs are
MXU-eligible via XLA. Output T' is static given bucketed input T.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def sub_out_len(lengths, kernel: int, stride: int):
    """Length after one valid conv: floor((L - (k-1) - 1)/s) + 1."""
    return (lengths - kernel + stride) // stride


class _PhaseConv2d(nn.Module):
    """Strided VALID 2-D conv as k*k shifted strided-slice matmuls.

    A stride-s conv's WEIGHT gradient lowers on TPU to a window-dilated
    convolution, which the compiler handles far less efficiently than a
    plain matmul (the second subsampling conv is ~40% of the flagship
    train step's FLOPs, so its backward dominates the bwd/fwd ratio).
    Here output (i, j) = sum_{ki,kj} x[s*i+ki, s*j+kj] @ W[ki,kj]: each
    (ki, kj) term is a strided slice (free layout op) times a (C, O)
    matmul, so forward, input-grad, and weight-grad are all MXU matmuls.
    Parameter tree matches nn.Conv (kernel (k, k, C, O), bias (O,)) —
    checkpoints are interchangeable."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (2, 2)
    padding: str = "VALID"

    @nn.compact
    def __call__(self, x):
        kt, kf = self.kernel_size
        st, sf = self.strides
        B, T, F, C = x.shape
        O = self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kt, kf, C, O))
        b = self.param("bias", nn.initializers.zeros, (O,))
        To = (T - kt) // st + 1
        Fo = (F - kf) // sf + 1
        y = None
        for ki in range(kt):
            for kj in range(kf):
                sl = jax.lax.slice(
                    x, (0, ki, kj, 0),
                    (B, ki + (To - 1) * st + 1, kj + (Fo - 1) * sf + 1, C),
                    (1, st, sf, 1))
                part = jnp.einsum("btfc,co->btfo", sl, w[ki, kj],
                                  preferred_element_type=x.dtype)
                y = part if y is None else y + part
        return y + b.astype(y.dtype)


class Conv2dSubsampling(nn.Module):
    """1/4-rate subsampling: two (k=3, s=2) convs (subsampling.py:386)."""

    odim: int
    dropout_rate: float = 0.0
    rate: int = 4  # 2, 4, 6, or 8

    @nn.compact
    def __call__(self, x, lengths, *, deterministic=True):
        """(B, T, F) -> (B, T', odim), lengths'."""
        B, T, F = x.shape
        h = x[:, :, :, None]  # NHWC: (B, T, F, 1)
        if self.rate == 2:
            convs = [(3, 2), (3, 1)]
        elif self.rate == 4:
            convs = [(3, 2), (3, 2)]
        elif self.rate == 6:
            convs = [(3, 2), (5, 3)]
        elif self.rate == 8:
            convs = [(3, 2), (3, 2), (3, 2)]
        else:
            raise ValueError(f"rate {self.rate}")
        olens = lengths
        fdim = F
        for i, (k, s) in enumerate(convs):
            conv = _PhaseConv2d if s > 1 else nn.Conv
            h = conv(self.odim, (k, k), strides=(s, s), padding="VALID",
                     name=f"conv{i}")(h)
            h = nn.relu(h)
            olens = sub_out_len(olens, k, s)
            fdim = (fdim - k + s) // s
        Bo, To, Fo, C = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(Bo, To, C * Fo)
        h = nn.Dense(self.odim, name="out")(h)
        return h, jnp.maximum(olens, 0)
