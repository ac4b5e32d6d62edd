"""BEATs: audio pre-training with acoustic tokenizers (patch-masked
prediction over mel spectrograms).

Behavioral contract: espnet2/beats/ + tasks/beats.py — a ViT-style
transformer over 2-D mel-spectrogram patches trained to predict
discrete acoustic tokens at masked patches; the tokens come from an
acoustic tokenizer (espnet2/bin/beats_tokenizer_train.py trains it,
iteratively distilled in the paper).

TPU-first notes: the iteration-0 tokenizer here is a random-projection
quantizer (BEST-RQ style: frozen random projection + frozen random
codebook, labels = nearest code) — a standing-in acoustic tokenizer
that is fully deterministic and jit-friendly; utils/kmeans.py provides
the k-means refinement used to re-estimate codebooks between
iterations (the reference's tokenizer-retraining role). Patchification
is one reshape (static 2-D patch grid), so the encoder input is a
(B, N_patches, D) matmul-friendly stack.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.frontends.default import DefaultFrontend
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.utils.masks import make_non_pad_mask


def patchify(feats: jnp.ndarray, patch_t: int, patch_f: int
             ) -> Tuple[jnp.ndarray, int, int]:
    """(B, T, F) -> (B, (T//pt)*(F//pf), pt*pf) patch stack."""
    B, T, F = feats.shape
    nt, nf = T // patch_t, F // patch_f
    x = feats[:, :nt * patch_t, :nf * patch_f]
    x = x.reshape(B, nt, patch_t, nf, patch_f)
    x = x.transpose(0, 1, 3, 2, 4).reshape(B, nt * nf, patch_t * patch_f)
    return x, nt, nf


class RandomProjectionTokenizer(nn.Module):
    """Frozen random projection + codebook: labels = nearest code.
    The BEST-RQ-style acoustic tokenizer (iteration-0 BEATs tokenizer
    role). Parameters are created once and NEVER trained (the loss stops
    gradients through them)."""

    codebook_size: int = 256
    code_dim: int = 16

    @nn.compact
    def __call__(self, patches):
        """(B, N, P) -> labels (B, N) int32."""
        P = patches.shape[-1]
        proj = self.param("proj", nn.initializers.normal(1.0),
                          (P, self.code_dim))
        codes = self.param("codes", nn.initializers.normal(1.0),
                           (self.codebook_size, self.code_dim))
        proj = jax.lax.stop_gradient(proj)
        codes = jax.lax.stop_gradient(codes)
        # normalize both (BEST-RQ uses l2-normalized projections/codes)
        z = patches @ proj
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        c = codes / (jnp.linalg.norm(codes, axis=-1, keepdims=True) + 1e-8)
        sim = jnp.einsum("bnd,kd->bnk", z, c)
        return jnp.argmax(sim, axis=-1).astype(jnp.int32)


class BeatsBackboneEncoder(nn.Module):
    """BEATs backbone as an ASR encoder (espnet2/asr/encoder/
    beats_encoder.py role): patchify the frontend's log-mel features
    (time x freq patches), run the shared transformer over the patch
    sequence, merge each time-row's frequency patches back into one
    frame vector. Conforms to the shared encoder contract so it
    registers as encoder='beats' in ASR configs; weights can be seeded
    from a BeatsModel SSL checkpoint (same backbone param shapes)."""

    input_size: int = 80
    output_size: int = 256
    patch_t: int = 4
    patch_f: int = 16
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 4
    dropout_rate: float = 0.1

    def setup(self):
        enc_conf = dict(output_size=self.output_size,
                        attention_heads=self.attention_heads,
                        linear_units=self.linear_units,
                        num_blocks=self.num_blocks,
                        dropout_rate=self.dropout_rate,
                        input_layer="linear")
        self.encoder_mod = TransformerEncoder(
            input_size=self.patch_t * self.patch_f, **enc_conf)
        self.merge = nn.Dense(self.output_size)

    def __call__(self, feats, feat_lens, *, deterministic=True,
                 return_intermediates=False):
        patches, nt, nf = patchify(feats, self.patch_t, self.patch_f)
        n_rows = jnp.maximum(feat_lens // self.patch_t, 1)
        n_valid = (n_rows * nf).astype(jnp.int32)
        enc, _ = self.encoder_mod(patches, n_valid,
                                  deterministic=deterministic)
        B, N, D = enc.shape
        # (B, nt, nf*D) -> one vector per time row
        enc = self.merge(enc.reshape(B, nt, nf * D))
        if return_intermediates:
            return enc, n_rows, []
        return enc, n_rows


class BeatsModel(nn.Module):
    frontend_conf: Optional[dict] = None
    patch_t: int = 4
    patch_f: int = 16
    encoder_conf: Optional[dict] = None
    codebook_size: int = 256
    mask_ratio: float = 0.5

    def setup(self):
        fc = dict(self.frontend_conf or {"n_fft": 512, "hop_length": 160,
                                         "n_mels": 80})
        self._frontend = DefaultFrontend(**fc)
        enc_conf = dict(self.encoder_conf or {})
        enc_conf.setdefault("output_size", 256)
        enc_conf["input_layer"] = "linear"
        self.encoder_mod = TransformerEncoder(
            input_size=self.patch_t * self.patch_f, **enc_conf)
        self.tokenizer = RandomProjectionTokenizer(
            codebook_size=self.codebook_size)
        self.mask_embed = self.param(
            "mask_embed", nn.initializers.normal(0.1),
            (self.patch_t * self.patch_f,))
        self.head = nn.Dense(self.codebook_size)

    def _patches(self, speech, speech_lengths):
        feats, flens = self._frontend(speech, speech_lengths)
        patches, nt, nf = patchify(feats, self.patch_t, self.patch_f)
        # patch validity: patch row i covers frames [i*pt, (i+1)*pt)
        n_rows = jnp.maximum(flens // self.patch_t, 1)
        row_valid = make_non_pad_mask(n_rows, patches.shape[1] // nf)
        valid = jnp.repeat(row_valid, nf, axis=1)
        return patches, valid, nt, nf

    def encode(self, speech, speech_lengths, *, deterministic=True):
        """Feature extraction: (B, N_patches, D), valid mask."""
        patches, valid, nt, nf = self._patches(speech, speech_lengths)
        n_valid = jnp.sum(valid, axis=1).astype(jnp.int32)
        enc, _ = self.encoder_mod(patches, n_valid,
                                  deterministic=deterministic)
        return enc, valid

    def __call__(self, speech, speech_lengths, *, deterministic=True):
        patches, valid, nt, nf = self._patches(speech, speech_lengths)
        labels = self.tokenizer(patches)
        B, N, P = patches.shape
        rng = (self.make_rng("mask") if not deterministic
               else jax.random.PRNGKey(0))
        mask = jax.random.bernoulli(rng, self.mask_ratio, (B, N)) & valid
        x = jnp.where(mask[:, :, None], self.mask_embed[None, None, :],
                      patches)
        n_valid = jnp.sum(valid, axis=1).astype(jnp.int32)
        enc, _ = self.encoder_mod(x, n_valid, deterministic=deterministic)
        logits = self.head(enc)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        n_mask = jnp.maximum(jnp.sum(mask), 1)
        loss = jnp.sum(jnp.where(mask, nll, 0.0)) / n_mask
        acc = jnp.sum(jnp.where(mask, jnp.argmax(logits, -1) == labels,
                                0)) / n_mask
        stats = {"loss": loss, "acc_masked": acc}
        return loss, stats, jnp.asarray(B, jnp.float32)
