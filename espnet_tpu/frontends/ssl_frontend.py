"""Pretrained SSL feature frontend (wav2vec2/HuBERT) + torch->flax.

Behavioral contract: espnet2/asr/frontend/s3prl.py — an ASR frontend
whose features come from a pretrained self-supervised model; the
reference's best WERs ride on WavLM/HuBERT features
(egs2/librispeech/asr1/README.md:133-170). Offline there are no
released weights, so this module provides:

- `Wav2Vec2Frontend`: a flax implementation matching the HuggingFace
  Wav2Vec2/HuBERT architecture (conv feature extractor + feature
  projection + conv positional embedding + post-LN transformer), with
  an S3PRL-style learnable layer-weighted sum over hidden states.
- `convert_wav2vec2_torch(module_or_state_dict)`: maps HF torch weights
  onto the flax parameter tree, so released checkpoints drop in the
  moment they are available (random-weight parity is unit-tested
  against `transformers.Wav2Vec2Model`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _ConvFeatureExtractor(nn.Module):
    conv_dim: Tuple[int, ...]
    conv_kernel: Tuple[int, ...]
    conv_stride: Tuple[int, ...]
    feat_extract_norm: str = "group"

    @nn.compact
    def __call__(self, x):
        # x: (B, S) -> (B, T, C); VALID padding, matching HF Conv1d
        h = x[:, :, None]
        for i, (c, k, s) in enumerate(zip(self.conv_dim, self.conv_kernel,
                                          self.conv_stride)):
            h = nn.Conv(c, (k,), strides=(s,), padding="VALID",
                        use_bias=False, name=f"conv{i}")(h)
            if i == 0 and self.feat_extract_norm == "group":
                h = nn.GroupNorm(num_groups=c, epsilon=1e-5,
                                 name="group_norm")(h)
            elif self.feat_extract_norm == "layer":
                h = nn.LayerNorm(epsilon=1e-5, name=f"layer_norm{i}")(h)
            h = nn.gelu(h, approximate=False)
        return h

    @staticmethod
    def out_length(lengths, conv_kernel, conv_stride):
        L = lengths
        for k, s in zip(conv_kernel, conv_stride):
            L = (L - k) // s + 1
        return jnp.maximum(L, 0)


class _EncoderLayer(nn.Module):
    """HF post-LN transformer layer (do_stable_layer_norm=False)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int

    @nn.compact
    def __call__(self, x, mask):
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.hidden_size,
            deterministic=True, name="attention")(x, x, mask=mask)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x + att)
        h = nn.Dense(self.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, name="output")(h)
        return nn.LayerNorm(epsilon=1e-5,
                            name="final_layer_norm")(x + h)


class Wav2Vec2Frontend(nn.Module):
    """wav2vec2/HuBERT feature frontend; returns either the last hidden
    state or an S3PRL-style learnable weighted sum over all layers."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_groups: int = 16
    feat_extract_norm: str = "group"
    layer_selection: str = "weighted_sum"  # or "last"

    def setup(self):
        self.feature_extractor = _ConvFeatureExtractor(
            self.conv_dim, self.conv_kernel, self.conv_stride,
            self.feat_extract_norm)
        self.fp_layer_norm = nn.LayerNorm(epsilon=1e-5)
        self.fp_projection = nn.Dense(self.hidden_size)
        self.pos_conv = nn.Conv(
            self.hidden_size, (self.num_conv_pos_embeddings,),
            padding=self.num_conv_pos_embeddings // 2,
            feature_group_count=self.num_conv_pos_groups, name="pos_conv")
        self.enc_layer_norm = nn.LayerNorm(epsilon=1e-5)
        self.layers = [_EncoderLayer(self.hidden_size, self.num_heads,
                                     self.intermediate_size,
                                     name=f"layer{i}")
                       for i in range(self.num_layers)]
        if self.layer_selection == "weighted_sum":
            self.layer_weights = self.param(
                "layer_weights", nn.initializers.zeros,
                (self.num_layers + 1,))

    def __call__(self, speech, speech_lengths, *, deterministic=True):
        h = self.feature_extractor(speech)
        out_lens = _ConvFeatureExtractor.out_length(
            speech_lengths, self.conv_kernel, self.conv_stride)
        h = self.fp_projection(self.fp_layer_norm(h))
        pos = self.pos_conv(h)
        if self.num_conv_pos_embeddings % 2 == 0:
            pos = pos[:, :-1]  # HF SamePadLayer trims one for even kernels
        h = h + nn.gelu(pos[:, :h.shape[1]], approximate=False)
        h = self.enc_layer_norm(h)
        T = h.shape[1]
        pad = jnp.arange(T)[None, :] < out_lens[:, None]
        mask = pad[:, None, None, :]
        hiddens = [h]
        for layer in self.layers:
            h = layer(h, mask)
            hiddens.append(h)
        if self.layer_selection == "weighted_sum":
            w = jax.nn.softmax(self.layer_weights)
            h = sum(wi * hi for wi, hi in zip(w, hiddens))
        feats = jnp.where(pad[:, :, None], h, 0.0)
        return feats, out_lens


def _wn_weight(sd, prefix):
    """Resolve a (possibly weight-normed) torch conv weight."""
    for g_key, v_key in ((f"{prefix}.weight_g", f"{prefix}.weight_v"),
                         (f"{prefix}.parametrizations.weight.original0",
                          f"{prefix}.parametrizations.weight.original1")):
        if g_key in sd:
            g, v = sd[g_key], sd[v_key]
            norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
            return v * (g / np.maximum(norm, 1e-12))
    return sd[f"{prefix}.weight"]


def convert_wav2vec2_torch(model_or_state_dict, num_layers: int,
                           layer_selection: str = "weighted_sum") -> dict:
    """HF Wav2Vec2Model/HubertModel (or its state_dict) -> flax params
    for Wav2Vec2Frontend. torch Conv1d weights (out, in, k) transpose to
    flax (k, in, out); Linear (out, in) -> (in, out)."""
    if hasattr(model_or_state_dict, "state_dict"):
        sd = {k: v.detach().cpu().numpy()
              for k, v in model_or_state_dict.state_dict().items()}
    else:
        sd = {k: np.asarray(v) for k, v in model_or_state_dict.items()}

    def conv_w(key):
        return np.transpose(sd[key], (2, 1, 0))

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"]}

    p = {}
    fe = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in sd:
        fe[f"conv{i}"] = {"kernel": conv_w(
            f"feature_extractor.conv_layers.{i}.conv.weight")}
        if f"feature_extractor.conv_layers.{i}.layer_norm.weight" in sd:
            name = "group_norm" if i == 0 else f"layer_norm{i}"
            fe[name] = ln(f"feature_extractor.conv_layers.{i}.layer_norm")
        i += 1
    p["feature_extractor"] = fe
    p["fp_layer_norm"] = ln("feature_projection.layer_norm")
    p["fp_projection"] = lin("feature_projection.projection")
    p["pos_conv"] = {
        "kernel": np.transpose(
            _wn_weight(sd, "encoder.pos_conv_embed.conv"), (2, 1, 0)),
        "bias": sd["encoder.pos_conv_embed.conv.bias"]}
    p["enc_layer_norm"] = ln("encoder.layer_norm")
    H = p["fp_projection"]["kernel"].shape[1]
    for li in range(num_layers):
        pre = f"encoder.layers.{li}"
        heads = None
        att = {}
        for name, hf in (("query", "q_proj"), ("key", "k_proj"),
                         ("value", "v_proj")):
            w = sd[f"{pre}.attention.{hf}.weight"].T  # (H, H)
            b = sd[f"{pre}.attention.{hf}.bias"]
            att[name] = {"kernel": w, "bias": b}
        att["out"] = {"kernel": sd[f"{pre}.attention.out_proj.weight"].T,
                      "bias": sd[f"{pre}.attention.out_proj.bias"]}
        p[f"layer{li}"] = {
            "attention": att,
            "layer_norm": ln(f"{pre}.layer_norm"),
            "intermediate": lin(f"{pre}.feed_forward.intermediate_dense"),
            "output": lin(f"{pre}.feed_forward.output_dense"),
            "final_layer_norm": ln(f"{pre}.final_layer_norm"),
        }
    if layer_selection == "weighted_sum":
        p["layer_weights"] = np.zeros((num_layers + 1,), np.float32)
    return {"params": p}


def load_into(frontend: Wav2Vec2Frontend, converted: dict,
              template_params: dict) -> dict:
    """Final fit: reshape attention kernels to the flax per-head layout
    using the template tree's shapes, and verify every leaf matches."""
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat_t = flatten_dict(dict(template_params))
    flat_c = flatten_dict(dict(converted))
    out = {}
    for key, tv in flat_t.items():
        cv = flat_c.get(key)
        if cv is None:
            raise KeyError(f"missing converted weight for {key}")
        cv = np.asarray(cv)
        if cv.shape != tuple(np.shape(tv)):
            cv = cv.reshape(np.shape(tv))
        out[key] = cv.astype(np.asarray(tv).dtype)
    return unflatten_dict(out)
