"""Joint enhancement + ASR model (robust/multi-talker ASR).

Behavioral contract: espnet2/enh_s2t/espnet_enh_s2t_model.py
(ESPnetEnhS2TModel) — an enhancement subnetwork separates/denoises the
mixture and the s2t subnetwork (hybrid CTC/attention ASR) consumes the
enhanced waveform; total loss = s2t loss + enh_weight * enhancement
loss (`calc_enh_loss`), with the enh branch optionally unsupervised
(no reference -> ASR loss only, bypass_enh_prob role).

TPU-first: both subnetworks live in ONE flax module, so the whole
pipeline (STFT -> separator -> iSTFT -> log-mel -> encoder -> CTC/att)
is a single differentiable jitted program — joint training needs no
gradient plumbing between frameworks.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRModel
from espnet_tpu.models.enh.losses import CRITERIA, pit_loss
from espnet_tpu.models.enh.model import EnhancementModel


class EnhS2TModel(nn.Module):
    vocab_size: int
    token_list: tuple = ()
    enh_conf: dict = None
    asr_conf: dict = None
    enh_weight: float = 0.2

    def setup(self):
        ec = dict(self.enh_conf or {})
        ec.setdefault("num_spk", 1)
        self.enh = EnhancementModel(**ec)
        ac = dict(self.asr_conf or {})
        self.s2t = ASRModel(vocab_size=self.vocab_size,
                            token_list=self.token_list, **ac)

    # properties mirror ASRModel using only dataclass fields so the beam
    # search can read them from the UNBOUND module
    @property
    def sos_id(self):
        return (self.asr_conf or {}).get("sos", self.vocab_size - 1) \
            or self.vocab_size - 1

    @property
    def eos_id(self):
        return (self.asr_conf or {}).get("eos", self.vocab_size - 1) \
            or self.vocab_size - 1

    @property
    def blank_id(self):
        return (self.asr_conf or {}).get("blank_id", 0)

    @property
    def ctc_weight(self):
        return (self.asr_conf or {}).get("ctc_weight", 0.5)

    @property
    def decoder(self):
        return (self.asr_conf or {}).get("decoder", "transformer")

    def encode(self, speech_mix, speech_lengths, *, deterministic=True):
        """Enhance -> ASR encode (the inference path of
        bin/asr_inference.py on an enh_s2t model)."""
        ests, olens, _ = self.enh.forward_enhance(
            speech_mix, speech_lengths, deterministic=deterministic)
        return self.s2t.encode(ests[0], olens, deterministic=deterministic)

    def ctc_logits(self, enc):
        return self.s2t.ctc_logits(enc)

    def nll(self, enc, enc_lens, text, text_lengths):
        return self.s2t.nll(enc, enc_lens, text, text_lengths)

    def decoder_init_state(self, memory, memory_lens, batch, maxlen):
        return self.s2t.decoder_init_state(memory, memory_lens, batch,
                                           maxlen)

    def decoder_score_step(self, token, step, state):
        return self.s2t.decoder_score_step(token, step, state)

    def __call__(self, speech_mix, speech_mix_lengths, text, text_lengths,
                 speech_ref1: Optional[jnp.ndarray] = None, *,
                 deterministic=True):
        ests, olens, _ = self.enh.forward_enhance(
            speech_mix, speech_mix_lengths, deterministic=deterministic)
        loss_asr, stats, weight = self.s2t(
            ests[0], olens, text, text_lengths, deterministic=deterministic)
        stats = {f"asr_{k}": v for k, v in stats.items()}
        loss = loss_asr
        if speech_ref1 is not None and self.enh_weight > 0.0:
            crit = CRITERIA[self.enh.loss_type]
            refs = [speech_ref1[:, :ests[0].shape[1]]]
            per_utt, _perm = pit_loss(crit, ests[:1], refs,
                                      speech_mix_lengths)
            loss_enh = jnp.mean(per_utt)
            stats["enh_loss"] = loss_enh
            loss = loss + self.enh_weight * loss_enh
        stats["loss"] = loss
        return loss, stats, weight
