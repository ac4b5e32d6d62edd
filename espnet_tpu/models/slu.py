"""SLU model: ASR backbone + SLU postencoder + transcript postdecoder.

Behavioral contract: espnet2/slu/espnet_model.py (ESPnetSLUModel:
`postencoder` conformer/transformer over the acoustic encoder output —
slu/postencoder/{conformer,transformer}_postencoder.py — and
`postdecoder` + `deliberationencoder`: the TRANSCRIPT text is encoded
(HF BERT in the reference, an in-repo transformer text encoder here —
offline environment) and fused with the acoustic memory so intent
decoding deliberates over both).

TPU-first fusion: text features are projected and CONCATENATED along
time with the acoustic memory (one static-shape memory for the
decoder/CTC) instead of per-token cross-attention gather loops.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRModel
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.utils.masks import make_non_pad_mask


class SLUModel(ASRModel):
    """SLU = ASR whose targets are semantic (intent/entity token
    sequences); adds slu_postencoder_conf and transcript fusion."""

    slu_postencoder: Optional[str] = None       # transformer | conformer
    slu_postencoder_conf: dict = None
    use_transcript: bool = False                # postdecoder path
    transcript_vocab_size: int = 0
    postdecoder_conf: dict = None

    def setup(self):
        super().setup()
        if self.slu_postencoder:
            conf = dict(self.slu_postencoder_conf or {})
            conf.setdefault("output_size",
                            (self.encoder_conf or {}).get("output_size",
                                                          256))
            conf.setdefault("input_layer", "linear")
            if self.slu_postencoder == "conformer":
                from espnet_tpu.nn.conformer import ConformerEncoder
                self.slu_post_mod = ConformerEncoder(
                    input_size=conf["output_size"], **conf)
            else:
                self.slu_post_mod = TransformerEncoder(
                    input_size=conf["output_size"], **conf)
        if self.use_transcript:
            pconf = dict(self.postdecoder_conf or {})
            d = (self.encoder_conf or {}).get("output_size", 256)
            pconf.setdefault("output_size", d)
            pconf.setdefault("input_layer", "embed")
            self.postdecoder_mod = TransformerEncoder(
                input_size=max(self.transcript_vocab_size, 1), **pconf)
            self.transcript_proj = nn.Dense(d)

    def encode(self, speech, speech_lengths, *, deterministic=True,
               return_intermediates=False, transcript=None,
               transcript_lengths=None):
        out = super().encode(speech, speech_lengths,
                             deterministic=deterministic,
                             return_intermediates=return_intermediates)
        if return_intermediates:
            enc, enc_lens, inters, inter_lens = out
        else:
            enc, enc_lens = out
            inters = inter_lens = None
        if self.slu_postencoder:
            enc, enc_lens = self.slu_post_mod(
                enc, enc_lens, deterministic=deterministic)[:2]
        if self.use_transcript and transcript is not None:
            txt, txt_lens = self.postdecoder_mod(
                transcript, transcript_lengths,
                deterministic=deterministic)[:2]
            txt = self.transcript_proj(txt)
            # concat along time; lengths add. Pad region of the acoustic
            # part is squeezed out by masking before concat so the text
            # features start right after the valid acoustic frames.
            B, Ta, D = enc.shape
            Tt = txt.shape[1]
            fused = jnp.zeros((B, Ta + Tt, D), enc.dtype)
            amask = make_non_pad_mask(enc_lens, Ta)
            fused = fused.at[:, :Ta].set(
                jnp.where(amask[:, :, None], enc, 0.0))
            # scatter text rows at offset enc_lens per batch row
            pos = enc_lens[:, None] + jnp.arange(Tt)[None, :]
            tmask = make_non_pad_mask(txt_lens, Tt)
            bidx = jnp.arange(B)[:, None].repeat(Tt, 1)
            fused = fused.at[bidx, jnp.minimum(pos, Ta + Tt - 1)].add(
                jnp.where(tmask[:, :, None], txt, 0.0))
            enc = fused
            enc_lens = enc_lens + txt_lens
        if return_intermediates:
            return enc, enc_lens, inters, inter_lens
        return enc, enc_lens

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 transcript=None, transcript_lengths=None, *,
                 deterministic=True):
        """Same loss mix as ASR; transcript (optional) rides the
        deliberation path."""
        if transcript is None:
            return super().__call__(speech, speech_lengths, text,
                                    text_lengths,
                                    deterministic=deterministic)
        enc, enc_lens = self.encode(
            speech, speech_lengths, deterministic=deterministic,
            transcript=transcript, transcript_lengths=transcript_lengths)
        return self.compute_losses(enc, enc_lens, text, text_lengths,
                                   deterministic=deterministic)
