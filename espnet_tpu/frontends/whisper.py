"""Whisper encoder/decoder (flax) + torch->flax weight converter.

Behavioral contract: espnet2/asr/frontend/whisper.py (WhisperFrontend:
encoder features for downstream ASR), espnet2/asr/encoder/
whisper_encoder.py and decoder/whisper_decoder.py (OpenAI Whisper
architecture used as espnet encoder/decoder). Offline there are no
released weights, so this module mirrors the HuggingFace
`WhisperModel` computation exactly (random-weight parity unit-tested)
and ships `convert_whisper_torch` so released checkpoints drop in.

Architecture (HF `WhisperEncoder`/`WhisperDecoder`):
- encoder: log-mel (B, T, n_mels) -> conv1 (k3 s1) gelu -> conv2
  (k3 s2) gelu -> +sinusoidal positions -> pre-LN transformer ->
  final LN;
- decoder: token embed + learned positions -> pre-LN causal self-attn +
  cross-attn layers -> final LN -> logits tied to the embedding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal table (model.py sinusoids)."""
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(
        np.float32)


class _WhisperAttention(nn.Module):
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, x, kv, mask=None):
        H = self.n_heads
        dk = self.d_model // H
        q = nn.Dense(self.d_model, name="q_proj")(x) * dk ** -0.5
        k = nn.Dense(self.d_model, use_bias=False, name="k_proj")(kv)
        v = nn.Dense(self.d_model, name="v_proj")(kv)

        def split(t):
            B, T = t.shape[:2]
            return t.reshape(B, T, H, dk).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        B, _, T, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(out)


class _WhisperEncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        x = x + _WhisperAttention(self.d_model, self.n_heads,
                                  name="self_attn")(h, h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.d_model, name="fc2")(h)


class WhisperEncoder(nn.Module):
    n_mels: int = 80
    d_model: int = 384
    n_heads: int = 6
    n_layers: int = 4
    ffn_dim: int = 1536
    max_positions: int = 1500

    @nn.compact
    def __call__(self, mel, mel_lengths=None):
        """mel: (B, T, n_mels) -> (B, ceil(T/2), d), olens."""
        h = nn.Conv(self.d_model, (3,), padding=1, name="conv1")(mel)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.d_model, (3,), strides=(2,), padding=1,
                    name="conv2")(h)
        h = nn.gelu(h, approximate=False)
        T = h.shape[1]
        pos = jnp.asarray(sinusoids(self.max_positions, self.d_model))
        h = h + pos[None, :T]
        olens = ((mel_lengths + 1) // 2 if mel_lengths is not None
                 else jnp.full((mel.shape[0],), T, jnp.int32))
        mask = None
        if mel_lengths is not None:
            valid = jnp.arange(T)[None] < olens[:, None]
            mask = valid[:, None, None, :]
        for i in range(self.n_layers):
            h = _WhisperEncoderLayer(self.d_model, self.n_heads,
                                     self.ffn_dim, name=f"layer{i}")(
                h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(h)
        return h, olens


class _WhisperDecoderLayer(nn.Module):
    d_model: int
    n_heads: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x, enc, self_mask, enc_mask=None):
        h = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        x = x + _WhisperAttention(self.d_model, self.n_heads,
                                  name="self_attn")(h, h, self_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="encoder_attn_layer_norm")(x)
        x = x + _WhisperAttention(self.d_model, self.n_heads,
                                  name="encoder_attn")(h, enc, enc_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.d_model, name="fc2")(h)


class WhisperDecoder(nn.Module):
    vocab_size: int = 51865
    d_model: int = 384
    n_heads: int = 6
    n_layers: int = 4
    ffn_dim: int = 1536
    max_positions: int = 448

    @nn.compact
    def __call__(self, tokens, enc, enc_lengths=None):
        """tokens (B, U) -> logits (B, U, vocab)."""
        emb = nn.Embed(self.vocab_size, self.d_model,
                       name="embed_tokens")
        pos = self.param("embed_positions",
                         nn.initializers.normal(0.02),
                         (self.max_positions, self.d_model))
        U = tokens.shape[1]
        x = emb(tokens) + pos[None, :U]
        causal = jnp.tril(jnp.ones((U, U), bool))[None, None]
        enc_mask = None
        if enc_lengths is not None:
            enc_mask = (jnp.arange(enc.shape[1])[None] <
                        enc_lengths[:, None])[:, None, None, :]
        for i in range(self.n_layers):
            x = _WhisperDecoderLayer(self.d_model, self.n_heads,
                                     self.ffn_dim, name=f"layer{i}")(
                x, enc, causal, enc_mask)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        return x @ emb.embedding.T


class WhisperFrontend(nn.Module):
    """ASR frontend: raw audio -> whisper log-mel -> encoder features
    (espnet2/asr/frontend/whisper.py contract)."""

    n_mels: int = 80
    d_model: int = 384
    n_heads: int = 6
    n_layers: int = 4
    ffn_dim: int = 1536
    fs: int = 16000

    def setup(self):
        from espnet_tpu.frontends.default import DefaultFrontend
        # whisper mel: 25ms window / 10ms hop
        self._mel = DefaultFrontend(n_fft=400, hop_length=160,
                                    n_mels=self.n_mels, fs=self.fs)
        self.encoder = WhisperEncoder(
            n_mels=self.n_mels, d_model=self.d_model,
            n_heads=self.n_heads, n_layers=self.n_layers,
            ffn_dim=self.ffn_dim)

    @property
    def output_size(self):
        return self.d_model

    def __call__(self, speech, speech_lengths, *, deterministic=True):
        mel, mlens = self._mel(speech, speech_lengths)
        return self.encoder(mel, mlens)


# -------------------------------------------------- torch -> flax


def convert_whisper_torch(model_or_state_dict, n_layers: int,
                          decoder: bool = False) -> dict:
    """Map HuggingFace WhisperModel weights onto the flax trees above.

    Pass `model.encoder.state_dict()` (or the full model's with prefix
    stripped). Returns a {"params": ...} tree for WhisperEncoder, or
    for WhisperDecoder with decoder=True.
    """
    sd = model_or_state_dict
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v.detach().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in sd.items()}

    def lin(prefix):
        out = {"kernel": sd[f"{prefix}.weight"].T}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"]}

    def attn(prefix):
        return {"q_proj": lin(f"{prefix}.q_proj"),
                "k_proj": lin(f"{prefix}.k_proj"),
                "v_proj": lin(f"{prefix}.v_proj"),
                "out_proj": lin(f"{prefix}.out_proj")}

    params = {}
    if not decoder:
        # torch Conv1d weight (out, in, k) -> flax (k, in, out)
        params["conv1"] = {"kernel": sd["conv1.weight"].transpose(2, 1, 0),
                           "bias": sd["conv1.bias"]}
        params["conv2"] = {"kernel": sd["conv2.weight"].transpose(2, 1, 0),
                           "bias": sd["conv2.bias"]}
        for i in range(n_layers):
            p = f"layers.{i}"
            params[f"layer{i}"] = {
                "self_attn": attn(f"{p}.self_attn"),
                "self_attn_layer_norm": ln(f"{p}.self_attn_layer_norm"),
                "fc1": lin(f"{p}.fc1"),
                "fc2": lin(f"{p}.fc2"),
                "final_layer_norm": ln(f"{p}.final_layer_norm")}
        params["layer_norm"] = ln("layer_norm")
    else:
        params["embed_tokens"] = {"embedding": sd["embed_tokens.weight"]}
        params["embed_positions"] = sd["embed_positions.weight"]
        for i in range(n_layers):
            p = f"layers.{i}"
            params[f"layer{i}"] = {
                "self_attn": attn(f"{p}.self_attn"),
                "self_attn_layer_norm": ln(f"{p}.self_attn_layer_norm"),
                "encoder_attn": attn(f"{p}.encoder_attn"),
                "encoder_attn_layer_norm":
                    ln(f"{p}.encoder_attn_layer_norm"),
                "fc1": lin(f"{p}.fc1"),
                "fc2": lin(f"{p}.fc2"),
                "final_layer_norm": ln(f"{p}.final_layer_norm")}
        params["layer_norm"] = ln("layer_norm")
    return {"params": params}
