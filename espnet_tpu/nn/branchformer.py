"""Branchformer and E-Branchformer encoders.

Behavioral contract: espnet2/asr/encoder/branchformer_encoder.py (two
parallel branches — rel-pos MHSA and cgMLP (convolutional gating MLP,
espnet2/asr/layers/cgmlp.py) — merged by concat+proj) and
e_branchformer_encoder.py (E-Branchformer: branches merged with a
depthwise-conv merge module + macaron feed-forwards; Kim et al. 2023).
These are the reference's headline WER models (BASELINE.md).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.nn.convolution import DepthwiseConv1d
from espnet_tpu.nn.attention import RelPositionMultiHeadedAttention
from espnet_tpu.nn.embedding import RelPositionalEncoding
from espnet_tpu.nn.subsampling import Conv2dSubsampling
from espnet_tpu.nn.transformer import PositionwiseFeedForward
from espnet_tpu.utils.masks import make_non_pad_mask


class ConvolutionalGatingMLP(nn.Module):
    """cgMLP: channel proj -> split -> depthwise conv gate -> proj
    (espnet2/asr/layers/cgmlp.py ConvolutionalSpatialGatingUnit)."""

    linear_units: int
    kernel_size: int = 31
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, valid_mask=None, *, deterministic=True):
        d = x.shape[-1]
        h = nn.Dense(self.linear_units, name="channel_proj1")(x)
        h = nn.gelu(h)
        # spatial gating unit: split channels, gate half with depthwise conv
        a, b = jnp.split(h, 2, axis=-1)
        b = nn.LayerNorm(name="sgu_norm")(b)
        if valid_mask is not None:
            b = jnp.where(valid_mask[:, :, None], b, 0.0)
        b = DepthwiseConv1d(b.shape[-1], self.kernel_size,
                            name="sgu_conv")(b)
        h = a * b
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d, name="channel_proj2")(h)


class MultiConvolutionalGatingMLP(nn.Module):
    """M-CGMLP (espnet2/asr/layers/multiconv_cgmlp.py:172): the cgMLP
    spatial gate runs SEVERAL depthwise convs of different kernel sizes
    in parallel, merged by `arch_type`:
      sum | weighted_sum (softmax kernel gate from pooled features) |
      concat (each conv emits C/K channels) | concat_fusion (concat +
      depthwise merge conv) — multiconv_cgmlp.py:42-95 contract."""

    linear_units: int
    kernel_sizes: tuple = (7, 15, 23, 31)
    arch_type: str = "concat_fusion"
    merge_conv_kernel: int = 31
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, valid_mask=None, *, deterministic=True):
        d = x.shape[-1]
        h = nn.Dense(self.linear_units, name="channel_proj1")(x)
        h = nn.gelu(h)
        a, b = jnp.split(h, 2, axis=-1)
        C = b.shape[-1]
        K = len(self.kernel_sizes)
        b = nn.LayerNorm(name="sgu_norm")(b)
        if valid_mask is not None:
            b = jnp.where(valid_mask[:, :, None], b, 0.0)
        if self.arch_type in ("sum", "weighted_sum"):
            outs = [DepthwiseConv1d(C, k, name=f"conv{i}")(b)
                    for i, k in enumerate(self.kernel_sizes)]
            if self.arch_type == "weighted_sum":
                pooled = jnp.concatenate(
                    [jnp.mean(o, axis=1) for o in outs], axis=-1)
                w = jax.nn.softmax(
                    nn.Dense(K, name="kernel_prob")(pooled), axis=-1)
                b = sum(w[:, None, i:i + 1] * o
                        for i, o in enumerate(outs))
            else:
                b = sum(outs)
        elif self.arch_type in ("concat", "concat_fusion"):
            outs = [DepthwiseConv1d(C // K, k, name=f"conv{i}")(
                        b[..., i * (C // K):(i + 1) * (C // K)])
                    for i, k in enumerate(self.kernel_sizes)]
            b = jnp.concatenate(outs, axis=-1)
            if self.arch_type == "concat_fusion":
                b = DepthwiseConv1d(C, self.merge_conv_kernel,
                                    name="merge_conv")(b)
        else:
            raise ValueError(self.arch_type)
        h = a * b
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d, name="channel_proj2")(h)


class EBranchformerLayer(nn.Module):
    d_model: int
    attention_heads: int
    linear_units: int          # macaron FF units
    cgmlp_linear_units: int
    cgmlp_kernel: int = 31
    merge_kernel: int = 3
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    macaron: bool = True

    @nn.compact
    def __call__(self, x, pos_emb, mask, valid_mask, *, deterministic=True):
        drop = nn.Dropout(self.dropout_rate)
        if self.macaron:
            residual = x
            h = nn.LayerNorm(name="norm_ff1")(x)
            x = residual + 0.5 * drop(
                PositionwiseFeedForward(self.linear_units, self.dropout_rate,
                                        activation="swish", name="ff1")(
                    h, deterministic=deterministic),
                deterministic=deterministic)
        # branch 1: global attention
        h1 = nn.LayerNorm(name="norm_mha")(x)
        h1 = RelPositionMultiHeadedAttention(
            self.attention_heads, self.d_model, self.attention_dropout_rate,
            name="attn")(h1, h1, h1, pos_emb, mask,
                         deterministic=deterministic)
        h1 = drop(h1, deterministic=deterministic)
        # branch 2: local cgMLP
        h2 = nn.LayerNorm(name="norm_mlp")(x)
        h2 = ConvolutionalGatingMLP(self.cgmlp_linear_units,
                                    self.cgmlp_kernel, self.dropout_rate,
                                    name="cgmlp")(
            h2, valid_mask, deterministic=deterministic)
        h2 = drop(h2, deterministic=deterministic)
        # merge: concat -> depthwise conv -> proj (E-Branchformer merge)
        cat = jnp.concatenate([h1, h2], axis=-1)
        m = DepthwiseConv1d(2 * self.d_model, self.merge_kernel,
                            name="merge_conv")(cat)
        x = x + drop(nn.Dense(self.d_model, name="merge_proj")(cat + m),
                     deterministic=deterministic)
        if self.macaron:
            residual = x
            h = nn.LayerNorm(name="norm_ff2")(x)
            x = residual + 0.5 * drop(
                PositionwiseFeedForward(self.linear_units, self.dropout_rate,
                                        activation="swish", name="ff2")(
                    h, deterministic=deterministic),
                deterministic=deterministic)
        return nn.LayerNorm(name="norm_final")(x)


class BranchformerLayer(nn.Module):
    """Original Branchformer: concat merge, no macaron FFs."""

    d_model: int
    attention_heads: int
    cgmlp_linear_units: int
    cgmlp_kernel: int = 31
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, pos_emb, mask, valid_mask, *, deterministic=True):
        drop = nn.Dropout(self.dropout_rate)
        h1 = nn.LayerNorm(name="norm_mha")(x)
        h1 = RelPositionMultiHeadedAttention(
            self.attention_heads, self.d_model, self.attention_dropout_rate,
            name="attn")(h1, h1, h1, pos_emb, mask,
                         deterministic=deterministic)
        h1 = drop(h1, deterministic=deterministic)
        h2 = nn.LayerNorm(name="norm_mlp")(x)
        h2 = ConvolutionalGatingMLP(self.cgmlp_linear_units,
                                    self.cgmlp_kernel, self.dropout_rate,
                                    name="cgmlp")(
            h2, valid_mask, deterministic=deterministic)
        h2 = drop(h2, deterministic=deterministic)
        cat = jnp.concatenate([h1, h2], axis=-1)
        x = x + drop(nn.Dense(self.d_model, name="merge_proj")(cat),
                     deterministic=deterministic)
        return nn.LayerNorm(name="norm_final")(x)


class EBranchformerEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    num_blocks: int = 12
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    merge_conv_kernel: int = 3
    macaron: bool = True
    interctc_layer_idx: tuple = ()

    @nn.compact
    def __call__(self, xs, ilens, *, deterministic=True,
                 return_intermediates=False):
        if self.input_layer in ("conv2d", "conv2d2", "conv2d6", "conv2d8"):
            rate = {"conv2d": 4, "conv2d2": 2, "conv2d6": 6,
                    "conv2d8": 8}[self.input_layer]
            xs, olens = Conv2dSubsampling(self.output_size, self.dropout_rate,
                                          rate=rate, name="embed")(
                xs, ilens, deterministic=deterministic)
        elif self.input_layer == "linear":
            xs = nn.Dense(self.output_size, name="embed")(xs)
            olens = ilens
        else:
            raise ValueError(self.input_layer)
        xs, pos_emb = RelPositionalEncoding(
            self.output_size, self.positional_dropout_rate, name="pos_enc")(
            xs, deterministic=deterministic)
        valid = make_non_pad_mask(olens, xs.shape[1])
        mask = valid[:, None, :]
        intermediates = []
        for i in range(self.num_blocks):
            xs = EBranchformerLayer(
                self.output_size, self.attention_heads, self.linear_units,
                self.cgmlp_linear_units, self.cgmlp_conv_kernel,
                self.merge_conv_kernel, self.dropout_rate,
                self.attention_dropout_rate, self.macaron,
                name=f"layer{i}")(xs, pos_emb, mask, valid,
                                  deterministic=deterministic)
            if (i + 1) in self.interctc_layer_idx:
                intermediates.append((i + 1, xs))
        xs = nn.LayerNorm(name="after_norm")(xs)
        if return_intermediates:
            return xs, olens, intermediates
        return xs, olens


class BranchformerEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    num_blocks: int = 12
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    interctc_layer_idx: tuple = ()

    @nn.compact
    def __call__(self, xs, ilens, *, deterministic=True,
                 return_intermediates=False):
        if self.input_layer in ("conv2d", "conv2d2", "conv2d6", "conv2d8"):
            rate = {"conv2d": 4, "conv2d2": 2, "conv2d6": 6,
                    "conv2d8": 8}[self.input_layer]
            xs, olens = Conv2dSubsampling(self.output_size, self.dropout_rate,
                                          rate=rate, name="embed")(
                xs, ilens, deterministic=deterministic)
        elif self.input_layer == "linear":
            xs = nn.Dense(self.output_size, name="embed")(xs)
            olens = ilens
        else:
            raise ValueError(self.input_layer)
        xs, pos_emb = RelPositionalEncoding(
            self.output_size, self.positional_dropout_rate, name="pos_enc")(
            xs, deterministic=deterministic)
        valid = make_non_pad_mask(olens, xs.shape[1])
        mask = valid[:, None, :]
        intermediates = []
        for i in range(self.num_blocks):
            xs = BranchformerLayer(
                self.output_size, self.attention_heads,
                self.cgmlp_linear_units, self.cgmlp_conv_kernel,
                self.dropout_rate, self.attention_dropout_rate,
                name=f"layer{i}")(xs, pos_emb, mask, valid,
                                  deterministic=deterministic)
            if (i + 1) in self.interctc_layer_idx:
                intermediates.append((i + 1, xs))
        xs = nn.LayerNorm(name="after_norm")(xs)
        if return_intermediates:
            return xs, olens, intermediates
        return xs, olens
