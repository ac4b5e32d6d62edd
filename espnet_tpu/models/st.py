"""Speech translation (ST) and machine translation (MT) models.

Behavioral contract: espnet2/st/espnet_model.py (attention decoder over
target-language text + optional auxiliary CTC/attention on source
transcript) and espnet2/mt/espnet_model.py (text-to-text encoder-
decoder). Both reuse the ASR encoder/decoder building blocks; decoding
reuses the on-device beam search unchanged.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRModel, CTCHead
from espnet_tpu.nn.decoder import TransformerDecoder
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.ops.losses import (accuracy, add_sos_eos, ctc_loss,
                                   label_smoothing_loss)


class STModel(ASRModel):
    """ST = ASRModel whose `text` is the translation; adds optional
    source-transcript CTC (asr_weight) as auxiliary loss."""

    src_vocab_size: Optional[int] = None
    asr_weight: float = 0.0   # aux CTC on src_text

    def setup(self):
        super().setup()
        if self.asr_weight > 0.0 and self.src_vocab_size:
            self.src_ctc = CTCHead(self.src_vocab_size)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 src_text=None, src_text_lengths=None, *,
                 deterministic=True):
        enc, enc_lens = self.encode(speech, speech_lengths,
                                    deterministic=deterministic)
        stats = {}
        ys_in, ys_out = add_sos_eos(text, text_lengths, self.sos_id,
                                    self.eos_id, self.ignore_id)
        logits = self.decoder_mod(enc, enc_lens, ys_in, text_lengths + 1,
                                  deterministic=deterministic)
        loss_att = label_smoothing_loss(logits, ys_out, self.lsm_weight,
                                        self.ignore_id,
                                        self.length_normalized_loss)
        stats["loss_att"] = loss_att
        stats["acc"] = accuracy(logits, ys_out, self.ignore_id)
        loss = loss_att
        if self.asr_weight > 0.0 and src_text is not None:
            lc = ctc_loss(self.src_ctc(enc, deterministic=deterministic),
                          enc_lens, src_text, src_text_lengths,
                          self.blank_id)
            stats["loss_asr_ctc"] = lc
            loss = (1 - self.asr_weight) * loss + self.asr_weight * lc
        stats["loss"] = loss
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)


class MTModel(nn.Module):
    """Text-to-text translation (espnet2/mt/espnet_model.py)."""

    vocab_size: int
    src_vocab_size: int
    token_list: tuple = ()
    encoder_conf: dict = None
    decoder_conf: dict = None
    lsm_weight: float = 0.1
    ignore_id: int = -1

    def setup(self):
        enc_conf = dict(self.encoder_conf or {})
        enc_conf.setdefault("input_layer", "embed")
        self.encoder_mod = TransformerEncoder(
            input_size=self.src_vocab_size, **enc_conf)
        d_conf = dict(self.decoder_conf or {})
        d_conf.setdefault("encoder_output_size",
                          enc_conf.get("output_size", 256))
        self.decoder_mod = TransformerDecoder(self.vocab_size, **d_conf)

    @property
    def sos_id(self):
        return self.vocab_size - 1

    @property
    def eos_id(self):
        return self.vocab_size - 1

    @property
    def blank_id(self):
        return 0

    @property
    def ctc_weight(self):
        return 0.0

    @property
    def decoder(self):
        return "transformer"

    def encode(self, src_text, src_text_lengths, *, deterministic=True):
        return self.encoder_mod(src_text, src_text_lengths,
                                deterministic=deterministic)

    def __call__(self, text, text_lengths, src_text, src_text_lengths, *,
                 deterministic=True):
        enc, enc_lens = self.encode(src_text, src_text_lengths,
                                    deterministic=deterministic)
        ys_in, ys_out = add_sos_eos(text, text_lengths, self.sos_id,
                                    self.eos_id, self.ignore_id)
        logits = self.decoder_mod(enc, enc_lens, ys_in, text_lengths + 1,
                                  deterministic=deterministic)
        loss = label_smoothing_loss(logits, ys_out, self.lsm_weight,
                                    self.ignore_id)
        stats = {"loss": loss, "acc": accuracy(logits, ys_out,
                                               self.ignore_id)}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    # beam-search delegation (same protocol as ASRModel)
    def decoder_init_state(self, memory, memory_lens, batch, maxlen):
        return self.decoder_mod.init_state(memory, memory_lens, batch, maxlen)

    def decoder_score_step(self, token, step, state):
        return self.decoder_mod.score_step(token, step, state)
