"""HuggingFace transformers speech frontend.

Behavioral contract: espnet2/asr/frontend/huggingface.py
(HuggingFaceFrontend) — wrap a HF speech encoder (wav2vec2 family) as
the feature frontend: raw waveform in, hidden states out, with the
model's conv-stack downsampling applied to the lengths.

Offline environment: hub weights are NOT downloadable. The frontend
builds from a LOCAL pretrained directory (`model_name_or_path`,
local_files_only) or from architecture kwargs (`hf_config`) with
random init — the latter is how tests exercise the integration and how
a from-scratch SSL pretraining run would start.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _build_config(model_name_or_path: str, hf_config: dict):
    from transformers import AutoConfig, Wav2Vec2Config
    if model_name_or_path:
        try:
            return AutoConfig.from_pretrained(model_name_or_path,
                                              local_files_only=True)
        except Exception as e:
            raise RuntimeError(
                f"could not load a local HF config from "
                f"{model_name_or_path!r} (offline environment: hub "
                f"names are not downloadable; pass hf_config "
                f"architecture kwargs instead)") from e
    conf = dict(hf_config or {})
    conf.setdefault("hidden_size", 128)
    conf.setdefault("num_hidden_layers", 2)
    conf.setdefault("num_attention_heads", 4)
    conf.setdefault("intermediate_size", 256)
    conf.setdefault("conv_dim", (64,) * 3)
    conf.setdefault("conv_kernel", (10, 3, 3))
    conf.setdefault("conv_stride", (5, 2, 2))
    conf.setdefault("num_feat_extract_layers", len(conf["conv_dim"]))
    conf.setdefault("do_stable_layer_norm", True)
    conf.setdefault("feat_extract_norm", "layer")
    return Wav2Vec2Config(**conf)


class HuggingFaceFrontend(nn.Module):
    """Flax wav2vec2 encoder as an espnet frontend module: the HF flax
    module nests directly in this model's parameter tree, so the whole
    stack trains/checkpoints/shards through the one Trainer path."""

    model_name_or_path: str = ""
    hf_config: dict = None
    fs: int = 16000

    def setup(self):
        from transformers.models.wav2vec2.modeling_flax_wav2vec2 import \
            FlaxWav2Vec2Module
        config = _build_config(self.model_name_or_path, self.hf_config)
        self.config = config
        self.encoder = FlaxWav2Vec2Module(config, name="wav2vec2")

    @property
    def output_size(self):
        return int(self.config.hidden_size)

    def _out_lengths(self, lengths):
        out = lengths
        for k, s in zip(self.config.conv_kernel, self.config.conv_stride):
            out = (out - k) // s + 1
        return jnp.maximum(out, 1)

    def __call__(self, speech, speech_lengths, *, deterministic=True):
        S = speech.shape[1]
        attn = (jnp.arange(S)[None, :]
                < speech_lengths[:, None]).astype(jnp.int32)
        out = self.encoder(speech, attention_mask=attn,
                           deterministic=deterministic)
        hidden = out[0] if isinstance(out, tuple) else out.last_hidden_state
        return hidden, self._out_lengths(speech_lengths)
