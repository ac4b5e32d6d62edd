"""Enhancement separators: RNN TF-masking + TCN (Conv-TasNet).

Behavioral contract: espnet2/enh/separator/rnn_separator.py (BLSTM over
TF magnitude -> per-source sigmoid masks) and tcn_separator.py
(Conv-TasNet temporal conv network, Luo & Mesgarani 2019). The
encoder/separator/decoder triad matches espnet2/enh/espnet_model.py:28.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BLSTM(nn.Module):
    """Bidirectional LSTM layer via nn.RNN over both directions."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class RNNSeparator(nn.Module):
    """(B, T, F) magnitude/feature -> num_spk masks (B, T, F) in [0,1]."""

    input_dim: int
    num_spk: int = 2
    rnn_hidden: int = 128
    num_layers: int = 2
    nonlinear: str = "sigmoid"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        h = x
        for i in range(self.num_layers):
            h = BLSTM(self.rnn_hidden, name=f"blstm{i}")(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        masks = []
        for s in range(self.num_spk):
            m = nn.Dense(self.input_dim, name=f"mask{s}")(h)
            m = {"sigmoid": nn.sigmoid, "relu": nn.relu,
                 "tanh": nn.tanh}[self.nonlinear](m)
            masks.append(m)
        return masks


class TCNBlock(nn.Module):
    bottleneck: int
    hidden: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.hidden, (1,), name="conv1x1")(x)
        h = nn.PReLU()(h)
        h = nn.LayerNorm(name="norm1")(h)
        h = nn.Conv(self.hidden, (self.kernel,),
                    kernel_dilation=(self.dilation,),
                    feature_group_count=self.hidden, padding="SAME",
                    name="dconv")(h)
        h = nn.PReLU()(h)
        h = nn.LayerNorm(name="norm2")(h)
        h = nn.Conv(self.bottleneck, (1,), name="res_out")(h)
        return x + h


class TCNSeparator(nn.Module):
    """Conv-TasNet TCN (tcn_separator.py): stacked dilated conv blocks."""

    input_dim: int
    num_spk: int = 2
    layers: int = 4      # X: blocks per repeat
    stacks: int = 2      # R: repeats
    bottleneck_dim: int = 64
    hidden_dim: int = 128
    kernel: int = 3
    nonlinear: str = "relu"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        h = nn.LayerNorm(name="norm_in")(x)
        h = nn.Conv(self.bottleneck_dim, (1,), name="bottleneck")(h)
        for r in range(self.stacks):
            for i in range(self.layers):
                h = TCNBlock(self.bottleneck_dim, self.hidden_dim,
                             self.kernel, 2 ** i, name=f"tcn{r}_{i}")(h)
        h = nn.PReLU()(h)
        m = nn.Conv(self.num_spk * self.input_dim, (1,), name="mask_out")(h)
        B, T, _ = m.shape
        m = m.reshape(B, T, self.num_spk, self.input_dim)
        m = {"relu": nn.relu, "sigmoid": nn.sigmoid,
             "softmax": lambda z: jax.nn.softmax(z, axis=2)}[self.nonlinear](m)
        return [m[:, :, s] for s in range(self.num_spk)]


SEPARATORS = {"rnn": RNNSeparator, "tcn": TCNSeparator}
