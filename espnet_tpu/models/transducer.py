"""Transducer (RNN-T) model: encoder + prediction network + joint.

Behavioral contract: espnet2/asr_transducer/ (standalone task — decoders
rnn/stateless, JointNetwork joint_network.py) and the transducer branch
of ESPnetASRModel (espnet2/asr/espnet_model.py:312). Loss is the native
ops/rnnt.py lattice DP (replaces warp-transducer). Auxiliary CTC loss
supported (espnet2/asr_transducer/espnet_transducer_model.py behavior).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.frontends.default import DefaultFrontend, UtteranceMVN
from espnet_tpu.models.asr import ENCODER_CLASSES, CTCHead
from espnet_tpu.ops.losses import ctc_loss
from espnet_tpu.ops.rnnt import rnnt_loss_auto
from espnet_tpu.ops.specaug import specaug


class RNNDecoder(nn.Module):
    """LSTM prediction network (asr_transducer/decoder/rnn_decoder.py)."""

    vocab_size: int
    hidden_size: int = 256
    num_layers: int = 1
    embed_size: Optional[int] = None
    dropout_rate: float = 0.0

    def setup(self):
        emb = self.embed_size or self.hidden_size
        self.embed = nn.Embed(self.vocab_size, emb)
        self.cells = [nn.OptimizedLSTMCell(self.hidden_size, name=f"rnn{i}")
                      for i in range(self.num_layers)]
        self.dropout = nn.Dropout(self.dropout_rate)

    @property
    def output_size(self):
        return self.hidden_size

    def init_carry(self, batch: int, dtype=jnp.float32):
        return [(jnp.zeros((batch, self.hidden_size), dtype),
                 jnp.zeros((batch, self.hidden_size), dtype))
                for _ in range(self.num_layers)]

    def step(self, carry, token):
        """token: (B,) -> (out (B, D), new_carry)."""
        h = self.embed(token)
        new_carry = []
        for cell, c in zip(self.cells, carry):
            c2, h = cell(c, h)
            new_carry.append(c2)
        return h, new_carry

    def __call__(self, labels_in, *, deterministic=True):
        """labels_in: (B, U+1) = [blank, y...] -> (B, U+1, D)."""
        B, U1 = labels_in.shape
        emb = self.dropout(self.embed(labels_in),
                           deterministic=deterministic)
        carry = self.init_carry(B, emb.dtype)
        outs = []
        for t in range(U1):
            h = emb[:, t]
            new_carry = []
            for cell, c in zip(self.cells, carry):
                c2, h = cell(c, h)
                new_carry.append(c2)
            carry = new_carry
            outs.append(h)
        return jnp.stack(outs, axis=1)


class StatelessDecoder(nn.Module):
    """Embedding-only prediction net (asr_transducer/decoder/
    stateless_decoder.py)."""

    vocab_size: int
    embed_size: int = 256
    dropout_rate: float = 0.0

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.embed_size)
        self.dropout = nn.Dropout(self.dropout_rate)

    @property
    def output_size(self):
        return self.embed_size

    def init_carry(self, batch: int, dtype=jnp.float32):
        return [jnp.zeros((batch, 0), dtype)]  # empty placeholder carry

    def step(self, carry, token):
        return self.embed(token), carry

    def __call__(self, labels_in, *, deterministic=True):
        return self.dropout(self.embed(labels_in),
                            deterministic=deterministic)


class JointNetwork(nn.Module):
    """joint(enc, dec) = W_out act(W_enc h_enc + W_dec h_dec)
    (espnet2/asr_transducer/joint_network.py)."""

    vocab_size: int
    joint_space_size: int = 256
    activation: str = "tanh"

    @nn.compact
    def __call__(self, enc, dec):
        """enc: (..., 1 or U+1 broadcastable, D_e), dec broadcastable.
        Standard full-lattice call: enc (B, T, 1, De), dec (B, 1, U+1, Dd).
        """
        act = {"tanh": nn.tanh, "relu": nn.relu, "swish": nn.swish}[
            self.activation]
        h = (nn.Dense(self.joint_space_size, name="lin_enc")(enc)
             + nn.Dense(self.joint_space_size, name="lin_dec")(dec))
        return nn.Dense(self.vocab_size, name="lin_out")(act(h))


from espnet_tpu.models.transducer_decoders import (MEGADecoder,  # noqa: E402
                                                   RWKVDecoder)

DECODER_CLASSES = {"rnn": RNNDecoder, "stateless": StatelessDecoder,
                   "rwkv": RWKVDecoder, "mega": MEGADecoder}


class TransducerModel(nn.Module):
    vocab_size: int
    token_list: tuple = ()
    frontend_conf: Optional[dict] = None
    specaug_conf: Optional[dict] = None
    normalize: Optional[str] = "utterance_mvn"
    normalize_stats: Any = None
    encoder: str = "conformer"
    encoder_conf: dict = None
    decoder: str = "rnn"
    decoder_conf: dict = None
    joint_conf: dict = None
    blank_id: int = 0
    ignore_id: int = -1
    aux_ctc_weight: float = 0.0

    def setup(self):
        enc_conf = dict(self.encoder_conf or {})
        input_size = (self.frontend_conf or {}).get("n_mels", 80) \
            if self.frontend_conf is not None else enc_conf.pop("input_size",
                                                                80)
        self.encoder_mod = ENCODER_CLASSES[self.encoder](
            input_size=input_size, **enc_conf)
        self.decoder_mod = DECODER_CLASSES[self.decoder](
            self.vocab_size, **dict(self.decoder_conf or {}))
        self.joint = JointNetwork(self.vocab_size,
                                  **dict(self.joint_conf or {}))
        self._frontend = (DefaultFrontend(**self.frontend_conf)
                          if self.frontend_conf is not None else None)
        self._normalize = UtteranceMVN() if self.normalize == \
            "utterance_mvn" else self.normalize_stats
        if self.aux_ctc_weight > 0:
            self.ctc = CTCHead(self.vocab_size)

    def encode(self, speech, speech_lengths, *, deterministic=True):
        if self._frontend is not None:
            feats, feat_lens = self._frontend(speech, speech_lengths)
        else:
            feats, feat_lens = speech, speech_lengths
        if self.specaug_conf is not None and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, feat_lens,
                            **self.specaug_conf)
        if self._normalize is not None:
            feats, feat_lens = self._normalize(feats, feat_lens)
        return self.encoder_mod(feats, feat_lens,
                                deterministic=deterministic)

    def __call__(self, speech, speech_lengths, text, text_lengths, *,
                 deterministic=True):
        enc, enc_lens = self.encode(speech, speech_lengths,
                                    deterministic=deterministic)
        B, U = text.shape
        labels_in = jnp.concatenate(
            [jnp.full((B, 1), self.blank_id, text.dtype), text], axis=1)
        dec_out = self.decoder_mod(labels_in, deterministic=deterministic)
        logits = self.joint(enc[:, :, None, :], dec_out[:, None, :, :])
        loss_rnnt = rnnt_loss_auto(logits, text, enc_lens, text_lengths,
                              self.blank_id)
        stats = {"loss_rnnt": loss_rnnt}
        loss = loss_rnnt
        if self.aux_ctc_weight > 0:
            lc = ctc_loss(self.ctc(enc, deterministic=deterministic),
                          enc_lens, text, text_lengths, self.blank_id)
            stats["loss_aux_ctc"] = lc
            loss = loss + self.aux_ctc_weight * lc
        stats["loss"] = loss
        return loss, stats, jnp.asarray(B, jnp.float32)

    # -- decode-time delegation --------------------------------------
    def decoder_init_carry(self, batch):
        return self.decoder_mod.init_carry(batch)

    def decoder_step(self, carry, token):
        return self.decoder_mod.step(carry, token)

    def joint_step(self, enc_frame, dec_out):
        """enc_frame: (B, De), dec_out: (B, Dd) -> (B, V) logits."""
        return self.joint(enc_frame, dec_out)
