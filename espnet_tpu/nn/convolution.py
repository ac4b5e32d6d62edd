"""Depthwise 1-D convolution with a TPU-efficient backward.

XLA lowers the weight-gradient of nn.Conv(feature_group_count=C) to a
batch_group_count=C grouped convolution, which the TPU compiler either
rejects outright ("output feature dimension size ... multiple of batch
group count", seen on v5e AOT) or lowers to a catastrophically slow
kernel. For the small kernels used across conformer/cgMLP/TCN stacks
(K = 3..31) the convolution is just K shifted multiply-adds, which XLA
fuses into ONE elementwise kernel in both forward and backward.

Parameter tree matches nn.Conv exactly (kernel (K, 1, C), bias (C,)),
so checkpoints trained with the nn.Conv version load unchanged.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DepthwiseConv1d(nn.Module):
    """Drop-in for ``nn.Conv(C, (K,), feature_group_count=C)``.

    Supports stride-1 SAME / CAUSAL padding and kernel dilation — the
    configurations used by the conformer ConvolutionModule, cgMLP,
    DDSConv, and TCN separator stacks.
    """

    features: int
    kernel_size: int
    kernel_dilation: int = 1
    use_bias: bool = True
    padding: str = "SAME"          # "SAME" | "CAUSAL" | "VALID"

    @nn.compact
    def __call__(self, x):
        K, d, C = self.kernel_size, int(self.kernel_dilation), self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (K, 1, C))
        span = d * (K - 1)
        if self.padding == "CAUSAL":
            pad_l, pad_r = span, 0
        elif self.padding == "VALID":
            pad_l = pad_r = 0
        else:  # lax "SAME" split for stride 1
            pad_l = span // 2
            pad_r = span - pad_l
        xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
        T = x.shape[1] if self.padding != "VALID" else x.shape[1] - span
        w = w.astype(x.dtype)
        y = xp[:, 0:T, :] * w[0, 0]
        for k in range(1, K):
            y = y + xp[:, k * d:k * d + T, :] * w[k, 0]
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (C,))
            y = y + b.astype(x.dtype)
        return y
