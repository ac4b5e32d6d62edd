"""Conformer encoder.

Behavioral contract: espnet2/asr/encoder/conformer_encoder.py:53-408
(macaron FF -> rel-pos MHSA -> conv module -> FF, half-step residuals,
final LayerNorm; interCTC taps) and espnet2/legacy/nets/pytorch_backend/
conformer/convolution.py:13 (pointwise->GLU->depthwise->norm->swish->
pointwise).

TPU notes: depthwise conv via feature_group_count; BatchNorm of the
reference is replaced by LayerNorm over channels (a standard, batch-size-
independent choice that avoids cross-device batch stats — reference
semantics preserved within training-noise; groupnorm-style) — selectable
via `conv_norm`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.nn.attention import RelPositionMultiHeadedAttention
from espnet_tpu.nn.convolution import DepthwiseConv1d
from espnet_tpu.nn.embedding import RelPositionalEncoding
from espnet_tpu.nn.subsampling import Conv2dSubsampling
from espnet_tpu.nn.transformer import PositionwiseFeedForward
from espnet_tpu.utils.masks import make_non_pad_mask


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 31
    conv_norm: str = "layer"  # "layer" | "batch"-like stats-free

    @nn.compact
    def __call__(self, x, valid_mask=None, *, deterministic=True):
        """(B, T, D) -> (B, T, D); valid_mask (B, T) True=valid."""
        if valid_mask is not None:
            x = jnp.where(valid_mask[:, :, None], x, 0.0)
        h = nn.Dense(2 * self.channels, name="pointwise_conv1")(x)
        h = nn.glu(h, axis=-1)
        # depthwise 1D conv, 'SAME' padding (shift-mul-add form: the
        # grouped-conv weight-grad is TPU-hostile — nn/convolution.py)
        h = DepthwiseConv1d(self.channels, self.kernel_size,
                            name="depthwise_conv")(h)
        h = nn.LayerNorm(name="norm")(h)
        h = nn.swish(h)
        h = nn.Dense(self.channels, name="pointwise_conv2")(h)
        if valid_mask is not None:
            h = jnp.where(valid_mask[:, :, None], h, 0.0)
        return h


class ConformerEncoderLayer(nn.Module):
    attention_heads: int
    d_model: int
    linear_units: int
    cnn_kernel: int = 31
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    macaron: bool = True
    # "conv" (conformer ConvolutionModule) | "multicgmlp" (the
    # Multiconvformer replacement, asr/layers/multiconv_cgmlp.py)
    conv_module_type: str = "conv"
    multicgmlp_kernel_sizes: tuple = (7, 15, 23, 31)
    multicgmlp_type: str = "concat_fusion"
    multicgmlp_linear_units: int = 0   # 0 -> 6*d_model (ref default)

    @nn.compact
    def __call__(self, x, pos_emb, mask, valid_mask, *, deterministic=True):
        drop = nn.Dropout(self.dropout_rate)
        if self.macaron:
            residual = x
            x = nn.LayerNorm(name="norm_ff_macaron")(x)
            x = residual + 0.5 * drop(
                PositionwiseFeedForward(self.linear_units, self.dropout_rate,
                                        activation="swish",
                                        name="feed_forward_macaron")(
                    x, deterministic=deterministic),
                deterministic=deterministic)
        residual = x
        x = nn.LayerNorm(name="norm_mha")(x)
        x = residual + drop(
            RelPositionMultiHeadedAttention(
                self.attention_heads, self.d_model,
                self.attention_dropout_rate, name="self_attn")(
                x, x, x, pos_emb, mask, deterministic=deterministic),
            deterministic=deterministic)
        residual = x
        x = nn.LayerNorm(name="norm_conv")(x)
        if self.conv_module_type == "multicgmlp":
            from espnet_tpu.nn.branchformer import \
                MultiConvolutionalGatingMLP
            conv_out = MultiConvolutionalGatingMLP(
                self.multicgmlp_linear_units or 6 * self.d_model,
                kernel_sizes=self.multicgmlp_kernel_sizes,
                arch_type=self.multicgmlp_type,
                dropout_rate=self.dropout_rate, name="conv_module")(
                x, valid_mask, deterministic=deterministic)
        else:
            conv_out = ConvolutionModule(
                self.d_model, self.cnn_kernel, name="conv_module")(
                x, valid_mask, deterministic=deterministic)
        x = residual + drop(conv_out, deterministic=deterministic)
        residual = x
        x = nn.LayerNorm(name="norm_ff")(x)
        x = residual + (0.5 if self.macaron else 1.0) * drop(
            PositionwiseFeedForward(self.linear_units, self.dropout_rate,
                                    activation="swish", name="feed_forward")(
                x, deterministic=deterministic),
            deterministic=deterministic)
        return nn.LayerNorm(name="norm_final")(x)


class ConformerEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    cnn_module_kernel: int = 31
    macaron_style: bool = True
    interctc_layer_idx: tuple = ()
    conv_module_type: str = "conv"     # "conv" | "multicgmlp"
    multicgmlp_kernel_sizes: tuple = (7, 15, 23, 31)
    multicgmlp_type: str = "concat_fusion"
    multicgmlp_linear_units: int = 0

    @nn.compact
    def __call__(self, xs, ilens, *, deterministic=True,
                 return_intermediates=False):
        if self.input_layer in ("conv2d", "conv2d2", "conv2d6", "conv2d8"):
            rate = {"conv2d": 4, "conv2d2": 2, "conv2d6": 6, "conv2d8": 8}[
                self.input_layer]
            xs, olens = Conv2dSubsampling(self.output_size, self.dropout_rate,
                                          rate=rate, name="embed")(
                xs, ilens, deterministic=deterministic)
        elif self.input_layer == "linear":
            xs = nn.Dense(self.output_size, name="embed")(xs)
            olens = ilens
        else:
            raise ValueError(f"unknown input_layer: {self.input_layer}")
        xs, pos_emb = RelPositionalEncoding(
            self.output_size, self.positional_dropout_rate, name="pos_enc")(
            xs, deterministic=deterministic)
        valid = make_non_pad_mask(olens, xs.shape[1])
        mask = valid[:, None, :]
        intermediates = []
        for i in range(self.num_blocks):
            xs = ConformerEncoderLayer(
                self.attention_heads, self.output_size, self.linear_units,
                self.cnn_module_kernel, self.dropout_rate,
                self.attention_dropout_rate, self.macaron_style,
                conv_module_type=self.conv_module_type,
                multicgmlp_kernel_sizes=self.multicgmlp_kernel_sizes,
                multicgmlp_type=self.multicgmlp_type,
                multicgmlp_linear_units=self.multicgmlp_linear_units,
                name=f"layer{i}")(xs, pos_emb, mask, valid,
                                  deterministic=deterministic)
            if (i + 1) in self.interctc_layer_idx:
                intermediates.append((i + 1, xs))
        xs = nn.LayerNorm(name="after_norm")(xs)
        if return_intermediates:
            return xs, olens, intermediates
        return xs, olens
