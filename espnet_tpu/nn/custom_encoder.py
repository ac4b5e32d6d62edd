"""Custom (heterogeneous) transducer encoder built from a block DSL.

Behavioral contract: espnet2/asr_transducer/encoder/building.py — the
`body_conf` list of block dicts stacks Conformer / Branchformer /
E-Branchformer / Conv1d blocks in any order, with Conv1d blocks allowed
to change the time resolution and feature dim mid-stack. Each attention
block family reuses the shared TPU-first layer implementations
(nn/conformer.py, nn/branchformer.py); relative positions and masks are
rebuilt after every resolution change.

Config example (asr_transducer task `encoder_conf.body_conf`):

    body_conf:
      - {block_type: conformer, linear_units: 1024}
      - {block_type: conv1d, kernel: 3, stride: 2}
      - {block_type: ebranchformer, cgmlp_linear_units: 1024}
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.nn.branchformer import BranchformerLayer, EBranchformerLayer
from espnet_tpu.nn.conformer import ConformerEncoderLayer
from espnet_tpu.nn.embedding import RelPositionalEncoding
from espnet_tpu.nn.subsampling import Conv2dSubsampling
from espnet_tpu.utils.masks import make_non_pad_mask


class Conv1dBlock(nn.Module):
    """Strided conv block (encoder/blocks/conv1d.py role): optional
    time downsampling + dim change mid-stack."""

    channels: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, lengths, *, deterministic=True):
        x = nn.Conv(self.channels, (self.kernel,), strides=(self.stride,),
                    padding="SAME")(x)
        x = nn.LayerNorm()(x)
        x = nn.silu(x)
        if self.stride > 1:
            lengths = (lengths + self.stride - 1) // self.stride
        return x, lengths


class CustomEncoder(nn.Module):
    """Heterogeneous block stack for the transducer task."""

    input_size: int
    output_size: int = 256
    body_conf: Sequence[dict] = ()
    attention_heads: int = 4
    linear_units: int = 1024
    cnn_module_kernel: int = 15
    dropout_rate: float = 0.1
    input_layer: str = "conv2d"

    @nn.compact
    def __call__(self, xs, ilens, *, deterministic=True,
                 return_intermediates=False):
        if self.input_layer.startswith("conv2d"):
            rate = {"conv2d": 4, "conv2d2": 2, "conv2d6": 6,
                    "conv2d8": 8}[self.input_layer]
            xs, olens = Conv2dSubsampling(
                self.output_size, self.dropout_rate, rate=rate,
                name="embed")(xs, ilens, deterministic=deterministic)
        else:
            xs = nn.Dense(self.output_size, name="embed")(xs)
            olens = ilens

        pos_emb = None
        valid = mask = None
        need_geom = True   # recompute pos/mask after resolution changes

        for i, conf in enumerate(self.body_conf):
            conf = dict(conf)
            btype = conf.pop("block_type")
            if need_geom and btype != "conv1d":
                xs, pos_emb = RelPositionalEncoding(
                    xs.shape[-1], self.dropout_rate,
                    name=f"pos_enc{i}")(xs, deterministic=deterministic)
                valid = make_non_pad_mask(olens, xs.shape[1])
                mask = valid[:, None, :]
                need_geom = False
            if btype == "conformer":
                xs = ConformerEncoderLayer(
                    conf.pop("attention_heads", self.attention_heads),
                    xs.shape[-1],
                    conf.pop("linear_units", self.linear_units),
                    conf.pop("cnn_module_kernel", self.cnn_module_kernel),
                    self.dropout_rate, name=f"block{i}", **conf)(
                    xs, pos_emb, mask, valid, deterministic=deterministic)
            elif btype == "branchformer":
                xs = BranchformerLayer(
                    xs.shape[-1],
                    conf.pop("attention_heads", self.attention_heads),
                    conf.pop("cgmlp_linear_units", self.linear_units),
                    dropout_rate=self.dropout_rate,
                    name=f"block{i}", **conf)(
                    xs, pos_emb, mask, valid, deterministic=deterministic)
            elif btype == "ebranchformer":
                xs = EBranchformerLayer(
                    xs.shape[-1],
                    conf.pop("attention_heads", self.attention_heads),
                    conf.pop("linear_units", self.linear_units),
                    conf.pop("cgmlp_linear_units", self.linear_units),
                    dropout_rate=self.dropout_rate,
                    name=f"block{i}", **conf)(
                    xs, pos_emb, mask, valid, deterministic=deterministic)
            elif btype == "conv1d":
                xs, olens = Conv1dBlock(
                    conf.pop("channels", xs.shape[-1]),
                    conf.pop("kernel", 3), conf.pop("stride", 1),
                    name=f"block{i}")(xs, olens,
                                      deterministic=deterministic)
                need_geom = True
            else:
                raise ValueError(f"unknown block_type {btype!r}")
        xs = nn.LayerNorm(name="after_norm")(xs)
        if return_intermediates:
            return xs, olens, []
        return xs, olens
