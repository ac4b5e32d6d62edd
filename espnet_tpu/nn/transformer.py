"""Transformer encoder (ASR/ST/LM shared).

Behavioral contract: espnet2/asr/encoder/transformer_encoder.py (embed
choices conv2d/linear/embed + N pre-norm encoder layers + final norm) and
the encoder layer of espnet2/legacy/nets/pytorch_backend/transformer/
encoder_layer.py (self-attn + position-wise FF with residuals,
normalize_before).

TPU notes: layers are stacked with nn.scan-free explicit python loop (N
is small and static; XLA pipelines the layer stack), all masks are
additive biases, dropout keys via flax rngs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.nn.attention import MultiHeadedAttention
from espnet_tpu.nn.embedding import PositionalEncoding
from espnet_tpu.nn.subsampling import Conv2dSubsampling
from espnet_tpu.utils.masks import make_non_pad_mask


class PositionwiseFeedForward(nn.Module):
    hidden_units: int
    dropout_rate: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        d = x.shape[-1]
        act = {"relu": nn.relu, "swish": nn.swish, "gelu": nn.gelu,
               "selu": nn.selu}[self.activation]
        h = nn.Dense(self.hidden_units, name="w_1")(x)
        h = act(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d, name="w_2")(h)


class HoulsbyAdapter(nn.Module):
    """Bottleneck adapter (Houlsby et al.; espnet2/layers/
    houlsby_adapter_layer.py via create_adapter.py): down-project ->
    nonlinearity -> up-project with residual; up-projection
    zero-initialized so an injected adapter starts as identity."""

    bottleneck: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(self.bottleneck, name="down")(x)
        h = nn.gelu(h)
        h = nn.Dense(d, name="up",
                     kernel_init=nn.initializers.zeros)(h)
        return x + h


class TransformerEncoderLayer(nn.Module):
    attention_heads: int
    d_model: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    adapter_dim: int = 0   # >0: Houlsby adapters after attn + FFN

    @nn.compact
    def __call__(self, x, mask, *, deterministic=True, window=None,
                 valid=None):
        drop = nn.Dropout(self.dropout_rate)
        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(name="norm1")(x)
        h = drop(
            MultiHeadedAttention(self.attention_heads, self.d_model,
                                 self.attention_dropout_rate, name="self_attn")(
                x, x, x, mask, deterministic=deterministic, window=window,
                valid=valid),
            deterministic=deterministic)
        if self.adapter_dim > 0:
            h = HoulsbyAdapter(self.adapter_dim, name="houlsby_attn")(h)
        x = residual + h
        if not self.normalize_before:
            x = nn.LayerNorm(name="norm1")(x)
        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(name="norm2")(x)
        h = drop(
            PositionwiseFeedForward(self.linear_units, self.dropout_rate,
                                    name="feed_forward")(
                x, deterministic=deterministic),
            deterministic=deterministic)
        if self.adapter_dim > 0:
            h = HoulsbyAdapter(self.adapter_dim, name="houlsby_ffn")(h)
        x = residual + h
        if not self.normalize_before:
            x = nn.LayerNorm(name="norm2")(x)
        return x


class TransformerEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = "conv2d"  # conv2d{,2,6,8} | linear | embed | none
    normalize_before: bool = True
    padding_idx: int = -1
    interctc_layer_idx: tuple = ()
    adapter_dim: int = 0   # Houlsby adapter bottleneck (0 = off)
    attention_window: Optional[int] = None  # Longformer-style banded attn
    # (espnet2/asr/encoder/longformer_encoder.py role: local window of
    # +-attention_window frames bounds the T^2 score matrix for long
    # inputs; None = full attention)

    @nn.compact
    def __call__(self, xs, ilens, *, deterministic=True, return_intermediates=False):
        """(B, T, F) or (B, T) int -> (B, T', D), olens[, intermediates]."""
        if self.input_layer in ("conv2d", "conv2d2", "conv2d6", "conv2d8"):
            rate = {"conv2d": 4, "conv2d2": 2, "conv2d6": 6, "conv2d8": 8}[
                self.input_layer]
            xs, olens = Conv2dSubsampling(self.output_size, self.dropout_rate,
                                          rate=rate, name="embed")(
                xs, ilens, deterministic=deterministic)
            xs = PositionalEncoding(self.output_size,
                                    self.positional_dropout_rate,
                                    name="pos_enc")(xs, deterministic=deterministic)
        elif self.input_layer == "linear":
            xs = nn.Dense(self.output_size, name="embed")(xs)
            xs = nn.LayerNorm(name="embed_norm")(xs)
            xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
            xs = nn.relu(xs)
            xs = PositionalEncoding(self.output_size,
                                    self.positional_dropout_rate,
                                    name="pos_enc")(xs, deterministic=deterministic)
            olens = ilens
        elif self.input_layer == "embed":
            xs = nn.Embed(self.input_size, self.output_size, name="embed")(xs)
            xs = PositionalEncoding(self.output_size,
                                    self.positional_dropout_rate,
                                    name="pos_enc")(xs, deterministic=deterministic)
            olens = ilens
        elif self.input_layer is None or self.input_layer == "none":
            olens = ilens
        else:
            raise ValueError(f"unknown input_layer: {self.input_layer}")

        valid = make_non_pad_mask(olens, xs.shape[1])     # (B, T)
        mask = valid[:, None, :]                          # (B, 1, T)
        window = self.attention_window
        if window is not None:
            # the band reaches the attention op as (window, valid) and is
            # computed block-sparsely by the splash kernel on TPU; the
            # XLA fallback applies the same band as a mask
            T = xs.shape[1]
            band = jnp.abs(jnp.arange(T)[:, None] - jnp.arange(T)[None, :]
                           ) <= window
            mask = mask & band[None]
        intermediates = []
        # single shared instance: intermediates and the final output go
        # through the SAME after_norm params (creating it twice raises
        # NameInUseError in compact modules)
        after_norm = (nn.LayerNorm(name="after_norm")
                      if self.normalize_before else None)
        for i in range(self.num_blocks):
            xs = TransformerEncoderLayer(
                self.attention_heads, self.output_size, self.linear_units,
                self.dropout_rate, self.attention_dropout_rate,
                self.normalize_before, adapter_dim=self.adapter_dim,
                name=f"layer{i}")(
                xs, mask, deterministic=deterministic, window=window,
                valid=valid)
            if (i + 1) in self.interctc_layer_idx:
                intermediates.append(
                    (i + 1, after_norm(xs) if after_norm else xs))
        if after_norm is not None:
            xs = after_norm(xs)
        if return_intermediates:
            return xs, olens, intermediates
        return xs, olens
