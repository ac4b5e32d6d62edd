"""Mask-CTC non-autoregressive ASR.

Behavioral contract: espnet2/asr/maskctc_model.py (MaskCTCModel: hybrid
CTC + MLM decoder trained on randomly masked targets; inference =
greedy CTC, mask low-confidence tokens, iteratively refill with the
conditional MLM — bin/asr_inference_maskctc.py) and
espnet2/asr/decoder/mlm_decoder.py.

TPU-first: the iterative refinement loop is a fixed-iteration
`lax.fori_loop` over the padded token canvas; each iteration is one
batched decoder call.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.asr import ASRModel
from espnet_tpu.nn.decoder import DecoderMHA, TransformerDecoderLayer
from espnet_tpu.ops.losses import accuracy, label_smoothing_loss
from espnet_tpu.utils.masks import make_non_pad_mask


class MLMDecoder(nn.Module):
    """Transformer decoder WITHOUT causal masking (conditional MLM)."""

    vocab_size: int           # includes <mask> as last id
    encoder_output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1

    def setup(self):
        d = self.encoder_output_size
        self.embed = nn.Embed(self.vocab_size, d)
        self.layers = [TransformerDecoderLayer(
            self.attention_heads, d, self.linear_units, self.dropout_rate,
            name=f"layer{i}") for i in range(self.num_blocks)]
        self.after_norm = nn.LayerNorm()
        self.output_layer = nn.Dense(self.vocab_size)

    def __call__(self, memory, memory_lens, ys_in, ys_lens, *,
                 deterministic=True):
        L = ys_in.shape[1]
        tgt_mask = make_non_pad_mask(ys_lens, L)[:, None, :]  # no causality
        mem_mask = make_non_pad_mask(memory_lens, memory.shape[1])[:, None, :]
        x = self.embed(ys_in)
        for layer in self.layers:
            x = layer(x, tgt_mask, memory, mem_mask,
                      deterministic=deterministic)
        return self.output_layer(self.after_norm(x))


class MaskCTCModel(ASRModel):
    """ASRModel whose attention branch is a masked-LM decoder.

    vocab layout: reference appends <mask> as an extra token
    (maskctc_model.py: mask_token = vocab_size; here vocab_size already
    includes it as the LAST id, sos/eos second-to-last).

    Construct with decoder=None (the task does this) — the MLM decoder
    replaces the autoregressive branch.
    """

    mask_ratio_low: float = 0.3   # fraction of tokens masked per sample
    mask_ratio_high: float = 1.0

    def setup(self):
        super().setup()
        d_conf = dict(self.decoder_conf or {})
        d_conf.setdefault("encoder_output_size",
                          (self.encoder_conf or {}).get("output_size", 256))
        self.mlm = MLMDecoder(self.vocab_size, **d_conf)

    @property
    def mask_id(self):
        return self.vocab_size - 1

    def __call__(self, speech, speech_lengths, text, text_lengths, *,
                 deterministic=True):
        loss_ctc_out = super().__call__(speech, speech_lengths, text,
                                        text_lengths,
                                        deterministic=deterministic)
        ctc_loss_val, stats, weight = loss_ctc_out
        enc, enc_lens = self.encode(speech, speech_lengths,
                                    deterministic=deterministic)
        B, U = text.shape
        valid = make_non_pad_mask(text_lengths, U)
        if not deterministic:
            rng = self.make_rng("mlm_mask")
        else:
            rng = jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        ratio = jax.random.uniform(r1, (B, 1), minval=self.mask_ratio_low,
                                   maxval=self.mask_ratio_high)
        mask_sel = (jax.random.uniform(r2, (B, U)) < ratio) & valid
        # ensure at least one masked position per utterance
        none_masked = ~jnp.any(mask_sel, axis=1)
        mask_sel = mask_sel.at[:, 0].set(mask_sel[:, 0] | none_masked)
        ys_in = jnp.where(mask_sel, self.mask_id, jnp.where(valid, text, 0))
        logits = self.mlm(enc, enc_lens, ys_in, text_lengths,
                          deterministic=deterministic)
        tgt = jnp.where(mask_sel, text, self.ignore_id)
        loss_mlm = label_smoothing_loss(logits, tgt, self.lsm_weight,
                                        self.ignore_id)
        stats = dict(stats)
        stats["loss_mlm"] = loss_mlm
        stats["acc_mlm"] = accuracy(logits, tgt, self.ignore_id)
        loss = self.ctc_weight * stats.get("loss_ctc", 0.0) + \
            (1.0 - self.ctc_weight) * loss_mlm
        stats["loss"] = loss
        return loss, stats, weight

    # -- inference ----------------------------------------------------
    def maskctc_decode(self, enc, enc_lens, *, n_iterations: int = 10,
                       threshold: float = 0.99):
        """Greedy CTC -> mask low-confidence -> iterative MLM refill.

        Returns (tokens (B, U), token_lens (B,)).
        """
        from espnet_tpu.decode.ctc_greedy import ctc_greedy_decode
        logits = self.ctc(enc, deterministic=True)
        probs = jax.nn.softmax(logits, axis=-1)
        tokens, n_tok = ctc_greedy_decode(logits, enc_lens, self.blank_id)
        U = tokens.shape[1]
        valid = make_non_pad_mask(n_tok, U)
        # confidence of each greedy token: max prob over frames that
        # emitted it — approximation: use per-token max prob from argmax
        # frames; simpler proxy: P of the token at its best frame.
        # (reference uses the ctc posterior of the collapsed token)
        best_p = jnp.max(probs, axis=-1)  # (B, T)
        # map: k-th kept token <- its source frame confidence, via the same
        # stable argsort packing as ctc_greedy_decode
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        prev = jnp.concatenate([jnp.full((pred.shape[0], 1), -1, jnp.int32),
                                pred[:, :-1]], axis=1)
        keep = (pred != self.blank_id) & (pred != prev) & \
            make_non_pad_mask(enc_lens, pred.shape[1])
        order = jnp.argsort(~keep, axis=1, stable=True)
        conf = jnp.take_along_axis(best_p, order, axis=1)[:, :U]
        masked = (conf < threshold) & valid
        canvas = jnp.where(masked, self.mask_id, tokens)

        def body(i, carry):
            canvas, still_masked = carry
            logits = self.mlm(enc, enc_lens, canvas, n_tok,
                              deterministic=True)
            p = jax.nn.softmax(logits, axis=-1)
            conf_new = jnp.max(p, axis=-1)
            pred_new = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # fill the top fraction of remaining masked slots each pass
            n_left = jnp.sum(still_masked, axis=1, keepdims=True)
            k = jnp.maximum(n_left // jnp.maximum(n_iterations - i, 1), 1)
            score = jnp.where(still_masked, conf_new, -1.0)
            rank = jnp.argsort(jnp.argsort(-score, axis=1), axis=1)
            fill = still_masked & (rank < k)
            canvas = jnp.where(fill, pred_new, canvas)
            return canvas, still_masked & ~fill

        canvas, left = jax.lax.fori_loop(0, n_iterations, body,
                                         (canvas, masked))
        # final pass fills anything left
        logits = self.mlm(enc, enc_lens, canvas, n_tok, deterministic=True)
        canvas = jnp.where(left, jnp.argmax(logits, -1).astype(jnp.int32),
                           canvas)
        return canvas, n_tok

    def partially_ar_decode(self, enc, enc_lens, *, beam_size: int = 5,
                            threshold: float = 0.99,
                            max_masked: int = 32):
        """Partially-autoregressive decoding over masked spans
        (espnet2/legacy/nets/beam_search_partially_AR.py +
        asr/partially_AR_model.py contract): the CTC-greedy canvas is
        confidence-masked exactly like mask-CTC, but instead of parallel
        iterative refill, masked positions are decoded LEFT-TO-RIGHT with
        a beam — each fill conditions on the already-fixed tokens of its
        span (autoregressive within spans, exact joint scoring), while
        unmasked tokens stay frozen.

        TPU-first: one `lax.fori_loop` over the (padded) ordered list of
        masked positions; each step is a single batched MLM call over
        B*beam canvases followed by a flattened (beam*V) top-k — the
        masked-span Python loop of the reference becomes a fixed-shape
        device program.

        Returns (tokens (B, U), token_lens (B,)).
        """
        from espnet_tpu.decode.ctc_greedy import ctc_greedy_decode
        NEG_INF = -1e9
        logits = self.ctc(enc, deterministic=True)
        probs = jax.nn.softmax(logits, axis=-1)
        tokens, n_tok = ctc_greedy_decode(logits, enc_lens, self.blank_id)
        B, U = tokens.shape
        K = beam_size
        valid = make_non_pad_mask(n_tok, U)
        best_p = jnp.max(probs, axis=-1)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        prev = jnp.concatenate([jnp.full((pred.shape[0], 1), -1, jnp.int32),
                                pred[:, :-1]], axis=1)
        keep = (pred != self.blank_id) & (pred != prev) & \
            make_non_pad_mask(enc_lens, pred.shape[1])
        order = jnp.argsort(~keep, axis=1, stable=True)
        conf = jnp.take_along_axis(best_p, order, axis=1)[:, :U]
        masked = (conf < threshold) & valid
        canvas0 = jnp.where(masked, self.mask_id, tokens)
        # ordered masked positions, padded with U (no-op sentinel)
        pos_order = jnp.argsort(~masked, axis=1, stable=True)  # (B, U)
        n_masked = jnp.sum(masked, axis=1)
        M = min(max_masked, U)
        pos = jnp.where(jnp.arange(M)[None, :] < n_masked[:, None],
                        pos_order[:, :M], U)  # (B, M)

        # beam state: canvases (B, K, U) + scores (B, K)
        canv = jnp.repeat(canvas0[:, None, :], K, axis=1)
        scores = jnp.broadcast_to(
            jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF), (B, K))
        enc_rows = jnp.repeat(enc, K, axis=0)
        enc_lens_rows = jnp.repeat(enc_lens, K, axis=0)
        n_tok_rows = jnp.repeat(n_tok, K, axis=0)

        def body(m, carry):
            canv, scores = carry
            p = pos[:, m]                       # (B,) position to fill
            active = p < U
            flat = canv.reshape(B * K, U)
            lg = self.mlm(enc_rows, enc_lens_rows, flat, n_tok_rows,
                          deterministic=True)   # (B*K, U, V)
            p_c = jnp.clip(p, 0, U - 1)
            lg_at = lg[jnp.arange(B * K),
                       jnp.repeat(p_c, K)]      # (B*K, V)
            logp = jax.nn.log_softmax(lg_at, axis=-1).reshape(B, K, -1)
            # never fill with <mask>/blank
            logp = logp.at[:, :, self.mask_id].set(NEG_INF)
            logp = logp.at[:, :, self.blank_id].set(NEG_INF)
            cand = scores[:, :, None] + logp    # (B, K, V)
            V = cand.shape[-1]
            new_scores, idx = jax.lax.top_k(cand.reshape(B, K * V), K)
            src = idx // V
            tok = (idx % V).astype(jnp.int32)
            new_canv = jnp.take_along_axis(canv, src[:, :, None], axis=1)
            new_canv = jax.vmap(jax.vmap(
                lambda row, q, v: row.at[q].set(v),
                in_axes=(0, None, 0)), in_axes=(0, 0, 0))(
                new_canv, p_c, tok)
            canv = jnp.where(active[:, None, None], new_canv, canv)
            scores = jnp.where(active[:, None], new_scores, scores)
            return canv, scores

        canv, scores = jax.lax.fori_loop(0, M, body, (canv, scores))
        best = jnp.argmax(scores, axis=1)
        out = jnp.take_along_axis(canv, best[:, None, None],
                                  axis=1)[:, 0, :]
        return out, n_tok
