"""Singing voice synthesis models.

Behavioral contract: espnet2/svs/ — `ESPnetSVSModel` extracts target
mels and routes (text=phones, midi, duration) score streams into the
acoustic model; `XiaoiceSing` (espnet2/svs/xiaoice/XiaoiceSing.py) is a
FastSpeech-family model whose encoder input sums phone, pitch(midi) and
beat/duration embeddings, expanded by score durations; VISinger wraps
VITS with score conditioning (espnet2/gan_svs/vits/).

TPU-first: static shapes throughout; the length regulator and losses
are shared with the FastSpeech2 implementation.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.frontends.default import DefaultFrontend
from espnet_tpu.models.tts.fastspeech2 import (Postnet, VariancePredictor,
                                               length_regulator)
from espnet_tpu.nn.transformer import TransformerEncoder
from espnet_tpu.utils.masks import make_non_pad_mask


class XiaoiceSing(nn.Module):
    """XiaoiceSing-class acoustic model (espnet2/svs/xiaoice/
    XiaoiceSing.py): FastSpeech-style encoder/decoder where the encoder
    input adds midi-pitch and note-duration embeddings; score durations
    drive the length regulator; predicts mel (+ log-f0 + vuv)."""

    idim: int                  # phone vocab
    odim: int = 80
    midi_dim: int = 129        # 0 = rest
    adim: int = 256
    aheads: int = 2
    elayers: int = 4
    eunits: int = 1024
    dlayers: int = 4
    dunits: int = 1024
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 256
    use_postnet: bool = True
    postnet_layers: int = 5
    postnet_chans: int = 256
    dropout_rate: float = 0.2
    max_frames: int = 2048

    def setup(self):
        self.encoder = TransformerEncoder(
            input_size=self.idim, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.eunits,
            num_blocks=self.elayers, input_layer="embed",
            dropout_rate=self.dropout_rate)
        self.midi_embed = nn.Embed(self.midi_dim, self.adim)
        self.dur_embed = nn.Dense(self.adim)
        self.duration_predictor = VariancePredictor(
            self.duration_predictor_layers, self.duration_predictor_chans,
            dropout_rate=self.dropout_rate)
        self.decoder = TransformerEncoder(
            input_size=self.adim, output_size=self.adim,
            attention_heads=self.aheads, linear_units=self.dunits,
            num_blocks=self.dlayers, input_layer="linear",
            dropout_rate=self.dropout_rate)
        self.feat_out = nn.Dense(self.odim)
        self.logf0_out = nn.Dense(2)  # (log-f0, vuv logit) per frame
        if self.use_postnet:
            self.postnet = Postnet(self.odim, self.postnet_layers,
                                   self.postnet_chans,
                                   dropout_rate=self.dropout_rate)

    def _encode(self, text, text_lengths, midi, durations, out_len, *,
                deterministic=True):
        hs, _ = self.encoder(text, text_lengths,
                             deterministic=deterministic)
        hs = hs + self.midi_embed(jnp.clip(midi, 0, self.midi_dim - 1))
        hs = hs + self.dur_embed(
            jnp.log1p(durations.astype(jnp.float32))[:, :, None])
        tmask = make_non_pad_mask(text_lengths, text.shape[1])
        d_pred = self.duration_predictor(hs, tmask,
                                         deterministic=deterministic)
        hs_exp, total = length_regulator(hs, durations, out_len)
        olens = jnp.minimum(total, out_len).astype(jnp.int32)
        h, _ = self.decoder(hs_exp, olens, deterministic=deterministic)
        before = self.feat_out(h)
        after = before + self.postnet(before, deterministic=deterministic) \
            if self.use_postnet else before
        f0v = self.logf0_out(h)
        return before, after, f0v, d_pred, olens, tmask

    def __call__(self, text, text_lengths, feats, feats_lengths, midi,
                 durations, logf0=None, *, deterministic=True):
        out_len = feats.shape[1]
        before, after, f0v, d_pred, olens, tmask = self._encode(
            text, text_lengths, midi, durations, out_len,
            deterministic=deterministic)
        fmask = make_non_pad_mask(feats_lengths, out_len)[:, :, None]
        n = jnp.maximum(jnp.sum(fmask), 1.0)
        l1 = jnp.sum(jnp.abs(jnp.where(fmask, before - feats, 0.0))) / \
            (n * self.odim)
        l1p = jnp.sum(jnp.abs(jnp.where(fmask, after - feats, 0.0))) / \
            (n * self.odim)
        ntok = jnp.maximum(jnp.sum(tmask), 1.0)
        dur_loss = jnp.sum(jnp.where(
            tmask, (d_pred - jnp.log1p(durations.astype(jnp.float32))) ** 2,
            0.0)) / ntok
        loss = l1 + l1p + dur_loss
        stats = {"l1_loss": l1 + l1p, "duration_loss": dur_loss}
        if logf0 is not None:
            f0_tgt = logf0[:, :out_len]
            vuv_tgt = (f0_tgt > 0).astype(jnp.float32)
            f0_loss = jnp.sum(jnp.where(
                fmask[:, :, 0] * vuv_tgt > 0,
                (f0v[:, :, 0] - f0_tgt) ** 2, 0.0)) / n
            vuv_loss = jnp.sum(jnp.where(
                fmask[:, :, 0] > 0,
                optax_sigmoid_bce(f0v[:, :, 1], vuv_tgt), 0.0)) / n
            loss = loss + f0_loss + vuv_loss
            stats.update(f0_loss=f0_loss, vuv_loss=vuv_loss)
        stats["loss"] = loss
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(self, text, text_lengths, midi, durations,
                  out_len: Optional[int] = None):
        out_len = out_len or self.max_frames
        _, after, f0v, _, olens, _ = self._encode(
            text, text_lengths, midi, durations, out_len,
            deterministic=True)
        return after, olens


def optax_sigmoid_bce(logits, labels):
    import optax
    return optax.sigmoid_binary_cross_entropy(logits, labels)


class _DurationEncoder(nn.Module):
    """Singing-Tacotron transition-token encoder (espnet2/svs/
    singing_tacotron/encoder.py:180 Duration_Encoder): duration/tempo
    features -> per-phone transition token in [0, 1] that gates the
    GDC attention's stay/move mixture."""

    @nn.compact
    def __call__(self, feats):
        h = nn.Dense(24, name="dense24")(feats)
        h = nn.relu(h)
        h = nn.Conv(32, (3,), padding="SAME", use_bias=False,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(32, (3,), padding="SAME", use_bias=False,
                    name="conv2")(h)
        h = nn.relu(h)
        t = jnp.tanh(nn.Dense(1, name="dense1")(h))[..., 0]
        return (t + 1.0) / 2.0                       # (B, T) in [0,1]


class SingingTacotron(nn.Module):
    """Singing-Tacotron (Wang et al. 2022; espnet2/svs/singing_tacotron/
    singing_tacotron.py): conv+BLSTM score encoder over summed
    phone/midi/duration embeddings, a duration encoder that emits the
    global transition token, and the shared AR tacotron decoder with
    global-duration-control attention."""

    idim: int
    odim: int = 80
    midi_dim: int = 129
    embed_dim: int = 256
    elayers: int = 1
    eunits: int = 256
    econv_layers: int = 2
    econv_chans: int = 256
    prenet_units: int = 128
    dlayers_units: int = 512
    att_dim: int = 128
    postnet_layers: int = 3
    postnet_chans: int = 256
    dropout_rate: float = 0.5
    max_frames: int = 2048

    def setup(self):
        from espnet_tpu.models.tts.tacotron2 import Tacotron2Decoder
        self.phone_embed = nn.Embed(self.idim, self.embed_dim)
        self.midi_embed = nn.Embed(self.midi_dim, self.embed_dim)
        self.dur_embed = nn.Dense(self.embed_dim)
        self.convs = [nn.Conv(self.econv_chans, (5,), padding="SAME",
                              name=f"econv{i}")
                      for i in range(self.econv_layers)]
        self.conv_norms = [nn.LayerNorm(name=f"enorm{i}")
                           for i in range(self.econv_layers)]
        self.blstm_fwd = nn.RNN(nn.OptimizedLSTMCell(self.eunits // 2),
                                name="blstm_fwd")
        self.blstm_bwd = nn.RNN(nn.OptimizedLSTMCell(self.eunits // 2),
                                reverse=True, keep_order=True,
                                name="blstm_bwd")
        self.duration_encoder = _DurationEncoder(name="dur_enc")
        self.decoder = Tacotron2Decoder(
            odim=self.odim, prenet_units=self.prenet_units,
            dlayers_units=self.dlayers_units, att_dim=self.att_dim,
            postnet_layers=self.postnet_layers,
            postnet_chans=self.postnet_chans,
            dropout_rate=self.dropout_rate, max_frames=self.max_frames)

    def _encode(self, text, text_lengths, midi, durations, *,
                deterministic=True):
        x = (self.phone_embed(text)
             + self.midi_embed(jnp.clip(midi, 0, self.midi_dim - 1))
             + self.dur_embed(jnp.log1p(
                 durations.astype(jnp.float32))[:, :, None]))
        h = x
        for conv, norm in zip(self.convs, self.conv_norms):
            h = nn.relu(norm(conv(h)))
        h = jnp.concatenate([self.blstm_fwd(h), self.blstm_bwd(h)], -1)
        mask = make_non_pad_mask(text_lengths, text.shape[1])
        dur_feats = jnp.stack(
            [jnp.log1p(durations.astype(jnp.float32)),
             jnp.clip(midi, 0, self.midi_dim - 1).astype(jnp.float32)
             / self.midi_dim], -1)
        trans_token = self.duration_encoder(dur_feats)
        trans_token = jnp.where(mask, trans_token, 1.0)
        return h, mask, trans_token

    def __call__(self, text, text_lengths, feats, feats_lengths, midi,
                 durations, logf0=None, *, deterministic=True):
        memory, mask, trans_token = self._encode(
            text, text_lengths, midi, durations,
            deterministic=deterministic)
        loss, stats, _ = self.decoder(memory, mask, feats, feats_lengths,
                                      deterministic=deterministic,
                                      trans_token=trans_token)
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(self, text, text_lengths, midi, durations,
                  out_len: Optional[int] = None):
        memory, mask, trans_token = self._encode(
            text, text_lengths, midi, durations, deterministic=True)
        return self.decoder.inference(memory, mask,
                                      max_frames=out_len or self.max_frames,
                                      trans_token=trans_token)


class SVSModel(nn.Module):
    """Task wrapper (espnet2/svs/espnet_model.py role): extract target
    mels from the singing waveform, convert score note durations to
    frame counts, call the acoustic model."""

    vocab_size: int
    token_list: tuple = ()
    feats_conf: dict = None
    svs: str = "xiaoice"
    svs_conf: dict = None
    normalize_stats: Any = None

    def setup(self):
        fc = dict(self.feats_conf or {})
        fc.setdefault("n_mels", 80)
        self._feats = DefaultFrontend(**fc)
        conf = dict(self.svs_conf or {})
        conf.setdefault("odim", fc["n_mels"])
        if self.svs == "xiaoice":
            self.svs_mod = XiaoiceSing(idim=self.vocab_size, **conf)
        elif self.svs == "singing_tacotron":
            self.svs_mod = SingingTacotron(idim=self.vocab_size, **conf)
        else:
            raise ValueError(f"unsupported svs model {self.svs}")

    def extract_feats(self, speech, speech_lengths):
        feats, feats_lengths = self._feats(speech, speech_lengths)
        if self.normalize_stats is not None:
            feats, feats_lengths = self.normalize_stats(feats, feats_lengths)
        return feats, feats_lengths

    def __call__(self, text, text_lengths, speech, speech_lengths,
                 midi, midi_lengths=None, durations=None,
                 durations_lengths=None, *, deterministic=True, **kw):
        feats, feats_lengths = self.extract_feats(speech, speech_lengths)
        L = text.shape[1]
        return self.svs_mod(text, text_lengths, feats, feats_lengths,
                            midi[:, :L].astype(jnp.int32),
                            durations[:, :L].astype(jnp.int32),
                            deterministic=deterministic)

    def inference(self, text, text_lengths, midi, durations,
                  out_len: Optional[int] = None):
        mel, olens = self.svs_mod.inference(text, text_lengths, midi,
                                            durations, out_len=out_len)
        if self.normalize_stats is not None:
            mel, _ = self.normalize_stats.inverse(mel, olens)
        return mel, olens
