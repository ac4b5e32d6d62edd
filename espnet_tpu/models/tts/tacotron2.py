"""Tacotron 2 autoregressive TTS.

Behavioral contract: espnet2/tts/tacotron2/tacotron2.py + the legacy
encoder/decoder (espnet2/legacy/nets/pytorch_backend/tacotron2/
{encoder,decoder}.py and rnn/attentions.py AttLoc): conv+BLSTM text
encoder; AR decoder with prenet, location-sensitive attention,
2-layer LSTM, frame projection + stop token; postnet; loss =
L1 + MSE + BCE(stop) with masking.

TPU-first: the per-frame AR loop (teacher-forced and inference) is one
`lax.scan` carrying (LSTM states, attention weights, prev frame) — the
whole utterance decodes in a single XLA program with static max frames.

The AR decoder is a standalone module over an arbitrary memory
(text-encoder states for TTS, speech-encoder states for the
Translatotron S2ST synthesizer, espnet2/s2st/synthesizer/
translatotron.py:25).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.tts.fastspeech2 import Postnet
from espnet_tpu.utils.masks import make_non_pad_mask


class LocationAttention(nn.Module):
    """Location-sensitive additive attention (AttLoc)."""

    att_dim: int = 128
    conv_chans: int = 32
    conv_kernel: int = 31

    def setup(self):
        self.mlp_enc = nn.Dense(self.att_dim)
        self.mlp_dec = nn.Dense(self.att_dim, use_bias=False)
        self.mlp_att = nn.Dense(self.att_dim, use_bias=False)
        self.loc_conv = nn.Conv(self.conv_chans, (self.conv_kernel,),
                                padding="SAME")
        self.gvec = nn.Dense(1)

    def __call__(self, enc, enc_proj, query, prev_att, mask,
                 trans_token=None):
        """enc: (B, T, D); query: (B, Dq); prev_att: (B, T);
        mask: (B, T) valid. -> (context (B, D), att (B, T)).

        trans_token (B, T) in [0,1]: global-duration-control attention
        (Singing-Tacotron, legacy/nets/.../attentions.py GDCAttLoc):
        the content weights are gated by a stay/move mixture of the
        previous attention and its right-shift, then renormalized."""
        loc = self.mlp_att(self.loc_conv(prev_att[:, :, None]))
        e = self.gvec(jnp.tanh(
            enc_proj + loc + self.mlp_dec(query)[:, None, :]))[..., 0]
        e = jnp.where(mask, e, -1e9)
        att = jax.nn.softmax(e, axis=-1)
        if trans_token is not None:
            shift = lambda x: jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
            w = ((1.0 - shift(trans_token)) * shift(prev_att)
                 + trans_token * prev_att) * att
            w = jnp.clip(w, 1e-6)
            att = w / jnp.sum(w, axis=-1, keepdims=True)
        ctx = jnp.einsum("bt,btd->bd", att, enc)
        return ctx, att


class Tacotron2Decoder(nn.Module):
    """AR frame decoder over a memory: prenet + location attention +
    2 LSTMs + frame/stop projections + postnet (decoder.py:285 role)."""

    odim: int = 80
    prenet_units: int = 256
    dlayers_units: int = 1024
    att_dim: int = 128
    postnet_layers: int = 5
    postnet_chans: int = 512
    dropout_rate: float = 0.5
    max_frames: int = 500

    def setup(self):
        self.att = LocationAttention(self.att_dim)
        self.prenet1 = nn.Dense(self.prenet_units)
        self.prenet2 = nn.Dense(self.prenet_units)
        self.att_lstm = nn.OptimizedLSTMCell(self.dlayers_units)
        self.dec_lstm = nn.OptimizedLSTMCell(self.dlayers_units)
        self.feat_out = nn.Dense(self.odim)
        self.prob_out = nn.Dense(1)
        self.postnet = Postnet(self.odim, self.postnet_layers,
                               self.postnet_chans,
                               dropout_rate=self.dropout_rate)

    def _prenet(self, x, rng):
        # prenet keeps dropout ON even at inference (tacotron2 trick);
        # use the provided rng deterministically split per step
        h = nn.relu(self.prenet1(x))
        h = jax.random.bernoulli(rng, 0.5, h.shape) * h * 2.0
        h = nn.relu(self.prenet2(h))
        rng2 = jax.random.fold_in(rng, 1)
        return jax.random.bernoulli(rng2, 0.5, h.shape) * h * 2.0

    def _init_carry(self, memory, memory_mask):
        B = memory.shape[0]
        att_state = self.att_lstm.initialize_carry(
            jax.random.PRNGKey(0), (B, self.prenet_units + memory.shape[-1]))
        dec_state = self.dec_lstm.initialize_carry(
            jax.random.PRNGKey(0), (B, self.dlayers_units + memory.shape[-1]))
        init_att = jnp.where(
            memory_mask,
            1.0 / jnp.maximum(jnp.sum(memory_mask, 1, keepdims=True), 1), 0.0)
        return att_state, dec_state, init_att

    def teacher_force(self, memory, memory_mask, frames_in, rng,
                      trans_token=None):
        """Teacher-forced scan. frames_in: (B, T_out, odim) shifted
        targets (zeros first frame). -> (before, stops, atts).
        trans_token: (B, T_mem) GDC gate (Singing-Tacotron)."""
        enc_proj = self.att.mlp_enc(memory)
        T_out = frames_in.shape[1]

        def cell_step(mdl, carry, inp):
            (att_state, dec_state, prev_att) = carry
            frame_prev, step_rng = inp
            pre = mdl._prenet(frame_prev, step_rng)
            query = att_state[1]
            ctx, att_w = mdl.att(memory, enc_proj, query, prev_att,
                                 memory_mask, trans_token)
            att_in = jnp.concatenate([pre, ctx], axis=-1)
            att_state, att_out = mdl.att_lstm(att_state, att_in)
            dec_state, dec_out = mdl.dec_lstm(dec_state,
                                              jnp.concatenate(
                                                  [att_out, ctx], axis=-1))
            proj_in = jnp.concatenate([dec_out, ctx], axis=-1)
            frame = mdl.feat_out(proj_in)
            stop = mdl.prob_out(proj_in)[:, 0]
            return (att_state, dec_state, att_w), (frame, stop, att_w)

        att_state, dec_state, init_att = self._init_carry(memory, memory_mask)
        rngs = jax.random.split(rng, T_out)
        (_, _, _), (frames, stops, atts) = nn.scan(
            cell_step,
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=0, out_axes=0)(self, (att_state, dec_state, init_att),
                                   (frames_in.transpose(1, 0, 2), rngs))
        return (frames.transpose(1, 0, 2), stops.T, atts.transpose(1, 0, 2))

    def __call__(self, memory, memory_mask, feats, feats_lengths, *,
                 deterministic=True, trans_token=None):
        """Teacher-forced loss pass -> (loss, stats, (before, after))."""
        B, T_out, _ = feats.shape
        frames_in = jnp.concatenate(
            [jnp.zeros((B, 1, self.odim)), feats[:, :-1]], axis=1)
        rng = self.make_rng("prenet") if not deterministic else \
            jax.random.PRNGKey(0)
        before, stops, atts = self.teacher_force(memory, memory_mask,
                                                 frames_in, rng,
                                                 trans_token)
        after = before + self.postnet(before, deterministic=deterministic)
        loss, stats = tacotron_loss(before, after, stops, feats,
                                    feats_lengths)
        return loss, stats, (before, after)

    def inference(self, memory, memory_mask, *, threshold: float = 0.5,
                  max_frames: Optional[int] = None, trans_token=None):
        """AR generation with predicted frames fed back (scan to
        max_frames; olens from first stop-token firing)."""
        max_frames = max_frames or self.max_frames
        B = memory.shape[0]
        enc_proj = self.att.mlp_enc(memory)
        att_state, dec_state, init_att = self._init_carry(memory, memory_mask)

        def step(mdl, carry, step_rng):
            att_state, dec_state, prev_att, frame_prev, stopped = carry
            pre = mdl._prenet(frame_prev, step_rng)
            query = att_state[1]
            ctx, att_w = mdl.att(memory, enc_proj, query, prev_att,
                                 memory_mask, trans_token)
            att_state, att_out = mdl.att_lstm(att_state,
                                              jnp.concatenate([pre, ctx],
                                                              axis=-1))
            dec_state, dec_out = mdl.dec_lstm(
                dec_state, jnp.concatenate([att_out, ctx], axis=-1))
            proj_in = jnp.concatenate([dec_out, ctx], axis=-1)
            frame = mdl.feat_out(proj_in)
            stop_p = jax.nn.sigmoid(mdl.prob_out(proj_in)[:, 0])
            new_stopped = stopped | (stop_p > threshold)
            return ((att_state, dec_state, att_w, frame, new_stopped),
                    (frame, new_stopped))

        rngs = jax.random.split(jax.random.PRNGKey(0), max_frames)
        carry0 = (att_state, dec_state, init_att,
                  jnp.zeros((B, self.odim)), jnp.zeros((B,), bool))
        _, (frames, stopped_seq) = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False},
            in_axes=0, out_axes=0)(self, carry0, rngs)
        mel = frames.transpose(1, 0, 2)
        mel = mel + self.postnet(mel, deterministic=True)
        olens = jnp.sum(~stopped_seq.T, axis=1).astype(jnp.int32)
        olens = jnp.maximum(olens, 1)
        return mel, olens


def tacotron_loss(before, after, stops, feats, feats_lengths):
    """Masked L1 + MSE + stop BCE (tacotron2.py Tacotron2Loss)."""
    T_out = feats.shape[1]
    odim = feats.shape[2]
    fmask = make_non_pad_mask(feats_lengths, T_out)[:, :, None]
    n = jnp.maximum(jnp.sum(fmask), 1.0) * odim
    l1 = jnp.sum(jnp.abs(jnp.where(fmask, before - feats, 0.0))) / n \
        + jnp.sum(jnp.abs(jnp.where(fmask, after - feats, 0.0))) / n
    mse = jnp.sum(jnp.where(fmask, (before - feats) ** 2, 0.0)) / n \
        + jnp.sum(jnp.where(fmask, (after - feats) ** 2, 0.0)) / n
    # stop targets: 1 at last valid frame onward
    pos = jnp.arange(T_out)[None, :]
    stop_tgt = (pos >= (feats_lengths - 1)[:, None]).astype(jnp.float32)
    fmask2 = make_non_pad_mask(feats_lengths, T_out)
    bce = -(stop_tgt * jax.nn.log_sigmoid(stops)
            + (1 - stop_tgt) * jax.nn.log_sigmoid(-stops))
    bce = jnp.sum(jnp.where(fmask2, bce, 0.0)) / jnp.maximum(
        jnp.sum(fmask2), 1.0)
    loss = l1 + mse + bce
    stats = {"loss": loss, "l1_loss": l1, "mse_loss": mse, "bce_loss": bce}
    return loss, stats


class Tacotron2(nn.Module):
    idim: int
    odim: int = 80
    embed_dim: int = 512
    elayers_convs: int = 3
    econv_chans: int = 512
    econv_kernel: int = 5
    blstm_units: int = 512
    prenet_units: int = 256
    dlayers_units: int = 1024
    att_dim: int = 128
    postnet_layers: int = 5
    postnet_chans: int = 512
    dropout_rate: float = 0.5
    max_frames: int = 500
    reduction_factor: int = 1

    def setup(self):
        self.embed = nn.Embed(self.idim, self.embed_dim)
        self.enc_convs = [nn.Conv(self.econv_chans, (self.econv_kernel,),
                                  padding="SAME", name=f"enc_conv{i}")
                          for i in range(self.elayers_convs)]
        self.enc_norms = [nn.LayerNorm(name=f"enc_norm{i}")
                          for i in range(self.elayers_convs)]
        self.blstm_fwd = nn.RNN(nn.OptimizedLSTMCell(self.blstm_units // 2))
        self.blstm_bwd = nn.RNN(nn.OptimizedLSTMCell(self.blstm_units // 2),
                                reverse=True, keep_order=True)
        self.dec = Tacotron2Decoder(
            odim=self.odim, prenet_units=self.prenet_units,
            dlayers_units=self.dlayers_units, att_dim=self.att_dim,
            postnet_layers=self.postnet_layers,
            postnet_chans=self.postnet_chans,
            dropout_rate=self.dropout_rate, max_frames=self.max_frames)
        self.drop = nn.Dropout(self.dropout_rate)

    def encode(self, text, text_lengths, *, deterministic=True):
        # Length-aware encoding so outputs are invariant to the bucketed
        # pad amount (ADVICE r2): zero pad embeddings before the SAME
        # convs and give nn.RNN the true lengths — the backward LSTM
        # must not consume pad positions before the valid suffix.
        mask = make_non_pad_mask(text_lengths, text.shape[1])
        h = jnp.where(mask[:, :, None], self.embed(text), 0.0)
        for conv, norm in zip(self.enc_convs, self.enc_norms):
            h = self.drop(nn.relu(norm(conv(h))),
                          deterministic=deterministic)
            h = jnp.where(mask[:, :, None], h, 0.0)
        h = jnp.concatenate(
            [self.blstm_fwd(h, seq_lengths=text_lengths),
             self.blstm_bwd(h, seq_lengths=text_lengths)], axis=-1)
        return jnp.where(mask[:, :, None], h, 0.0), mask

    def __call__(self, text, text_lengths, feats, feats_lengths, *,
                 deterministic=True):
        enc, enc_mask = self.encode(text, text_lengths,
                                    deterministic=deterministic)
        loss, stats, _ = self.dec(enc, enc_mask, feats, feats_lengths,
                                  deterministic=deterministic)
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(self, text, text_lengths, *, threshold: float = 0.5,
                  max_frames: Optional[int] = None):
        enc, enc_mask = self.encode(text, text_lengths, deterministic=True)
        return self.dec.inference(enc, enc_mask, threshold=threshold,
                                  max_frames=max_frames)
