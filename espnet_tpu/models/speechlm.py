"""Speech language model: causal LM over multi-stream discrete tokens.

Behavioral contract: espnet2/speechlm/ (token-in/token-out LM over
multimodal sequences — codec codes, text tokens; core at
speechlm/model/speechlm/lm, multi-stream IO at multimodal_io). Compact
TPU-first core: per-stream embeddings are summed into one causal
transformer; per-stream output heads predict the next frame's codes
(parallel pattern; the delay pattern is a data-layout choice upstream).
Pairs with models/codec.py: CodecModel.encode -> tokens -> SpeechLM ->
CodecModel.decode.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.models.lm import CausalSelfAttnLayer
from espnet_tpu.nn.embedding import sinusoidal_table
from espnet_tpu.utils.masks import make_non_pad_mask, subsequent_mask


class SpeechLM(nn.Module):
    vocab_sizes: Tuple[int, ...]   # per stream (e.g. codec quantizers)
    d_model: int = 256
    heads: int = 4
    units: int = 1024
    layers: int = 4
    dropout_rate: float = 0.1

    def setup(self):
        self.embeds = [nn.Embed(v, self.d_model, name=f"embed{i}")
                       for i, v in enumerate(self.vocab_sizes)]
        self.blocks = [CausalSelfAttnLayer(self.heads, self.d_model,
                                           self.units, self.dropout_rate,
                                           name=f"layer{i}")
                       for i in range(self.layers)]
        self.after_norm = nn.LayerNorm()
        self.heads_out = [nn.Dense(v, name=f"head{i}")
                          for i, v in enumerate(self.vocab_sizes)]
        self.dropout = nn.Dropout(self.dropout_rate)

    def _trunk(self, tokens, lengths, *, deterministic=True):
        B, T, Q = tokens.shape
        x = sum(emb(tokens[:, :, i]) for i, emb in enumerate(self.embeds))
        pe = jnp.asarray(sinusoidal_table(T, self.d_model))
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype)) + pe[None]
        x = self.dropout(x, deterministic=deterministic)
        mask = subsequent_mask(T)[None]
        if lengths is not None:
            mask = mask & make_non_pad_mask(lengths, T)[:, None, :]
        for blk in self.blocks:
            x = blk(x, mask, deterministic=deterministic)
        return self.after_norm(x)

    def __call__(self, tokens, token_lengths=None, *, deterministic=True,
                 tokens_lengths=None, loss_mask=None, loss_mask_lengths=None):
        if token_lengths is None:
            # collate names lengths '<name>_lengths' (tokens_lengths)
            token_lengths = tokens_lengths
        """tokens: (B, T, Q) int32 (frame 0 should be a BOS frame).

        Next-frame prediction: position t predicts frame t+1's codes.
        loss_mask (B, T) optionally restricts scoring to target regions
        (condition prompts unscored — speechlm lm/loss.py role; mask is
        indexed by the TARGET position, i.e. position t+1's mask gates
        the loss at step t). Returns (loss, stats, weight)."""
        del loss_mask_lengths
        B, T, Q = tokens.shape
        h = self._trunk(tokens[:, :-1], token_lengths - 1,
                        deterministic=deterministic)
        valid = make_non_pad_mask(token_lengths - 1, T - 1)
        if loss_mask is not None:
            valid = valid & (loss_mask[:, 1:] > 0)
        total, accs = 0.0, []
        for i, head in enumerate(self.heads_out):
            logits = head(h)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = tokens[:, 1:, i]
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            nll = jnp.where(valid, nll, 0.0)
            total = total + jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
            accs.append(jnp.sum(jnp.where(
                valid, jnp.argmax(logits, -1) == tgt, 0))
                / jnp.maximum(jnp.sum(valid), 1))
        loss = total / len(self.heads_out)
        stats = {"loss": loss, "ppl": jnp.exp(loss),
                 "acc": jnp.mean(jnp.stack(accs))}
        return loss, stats, jnp.asarray(B, jnp.float32)

    def generate(self, prompt, prompt_lengths, steps: int, rng,
                 temperature: float = 1.0):
        """Autoregressive continuation (full re-encode per step — fine for
        utility generation; `generate_scan` is the KV-cached fast path).

        prompt: (B, Tp, Q) -> (B, Tp+steps, Q)."""
        tokens = prompt
        lens = prompt_lengths
        for s in range(steps):
            h = self._trunk(tokens, lens, deterministic=True)
            idx = jnp.maximum(lens - 1, 0)
            last = h[jnp.arange(h.shape[0]), idx]  # (B, D)
            new_codes = []
            for i, head in enumerate(self.heads_out):
                logits = head(last) / temperature
                rng, k = jax.random.split(rng)
                new_codes.append(jax.random.categorical(k, logits))
            nxt = jnp.stack(new_codes, axis=-1)[:, None, :]  # (B, 1, Q)
            tokens = jnp.concatenate([tokens, nxt], axis=1)
            lens = lens + 1
        return tokens

    def _embed_frame(self, frame):
        """(B, Q) -> (B, 1, D) summed per-stream embedding (no pos)."""
        x = sum(emb(frame[:, i]) for i, emb in enumerate(self.embeds))
        return x[:, None, :] * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))

    def generate_scan(self, prompt, prompt_lengths, steps: int, rng,
                      temperature: float = 1.0, topk: int = 0,
                      eos_id: int = -1):
        """Batched KV-cached generation in ONE device dispatch.

        A single `lax.scan` walks positions 0..Tp+steps-1: while
        t < prompt_len the prompt frame is teacher-forced (ragged
        prompts handled by the per-row switch, no host loop); afterwards
        each step samples the next frame from per-stream heads
        (temperature + optional top-k). Rows that sample `eos_id` in
        stream 0 freeze (eos thereafter). This replaces the reference's
        Python decode loop (espnet2/speechlm/bin/inference.py _step) with
        a fixed-shape on-device program.

        prompt: (B, Tp, Q); returns (tokens (B, Tp+steps, Q),
        lengths (B,)) where lengths count frames up to and incl. eos.
        """
        B, Tp, Q = prompt.shape
        Tmax = Tp + steps
        dk = self.d_model // self.heads
        cache_k = jnp.zeros((len(self.blocks), B, self.heads, Tmax, dk))
        cache_v = jnp.zeros_like(cache_k)
        pe = jnp.asarray(sinusoidal_table(Tmax, self.d_model))
        greedy = temperature <= 0

        def body(carry, t):
            cache_k, cache_v, cur, done, rng = carry
            # cur: (B, Q) frame to feed at position t
            x = self._embed_frame(cur) + pe[t][None, None]
            kv_mask = (jnp.arange(Tmax) <= t)[None].repeat(B, 0)
            new_k, new_v = [], []
            for i, blk in enumerate(self.blocks):
                x, ck, cv = blk.step(x, cache_k[i], cache_v[i], t, kv_mask)
                new_k.append(ck)
                new_v.append(cv)
            cache_k = jnp.stack(new_k)
            cache_v = jnp.stack(new_v)
            h = self.after_norm(x[:, 0])  # (B, D)
            rng, k = jax.random.split(rng)
            ks = jax.random.split(k, Q)
            codes = []
            for i, head in enumerate(self.heads_out):
                logits = head(h)
                if topk > 0 and topk < logits.shape[-1]:
                    kth = jax.lax.top_k(logits, topk)[0][:, -1:]
                    logits = jnp.where(logits < kth, -1e9, logits)
                if greedy:
                    codes.append(jnp.argmax(logits, -1).astype(jnp.int32))
                else:
                    codes.append(jax.random.categorical(
                        ks[i], logits / temperature).astype(jnp.int32))
            sampled = jnp.stack(codes, axis=-1)          # (B, Q)
            in_prompt = (t + 1) < prompt_lengths          # next pos forced?
            forced = prompt[:, jnp.minimum(t + 1, Tp - 1)]
            done = done | ((~in_prompt) & (sampled[:, 0] == eos_id))
            eos_frame = jnp.full_like(sampled, eos_id)
            nxt = jnp.where(in_prompt[:, None], forced,
                            jnp.where(done[:, None], eos_frame, sampled))
            return (cache_k, cache_v, nxt, done, rng), nxt

        carry0 = (cache_k, cache_v, prompt[:, 0], jnp.zeros((B,), bool),
                  rng)
        _, frames = jax.lax.scan(body, carry0, jnp.arange(Tmax))
        # frames[t] is the frame at position t+1; prepend position 0
        out = jnp.concatenate([prompt[:, :1],
                               jnp.moveaxis(frames, 0, 1)[:, :-1]], axis=1)
        is_eos = out[:, :, 0] == eos_id
        past_prompt = jnp.arange(Tmax)[None] >= prompt_lengths[:, None]
        ended = is_eos & past_prompt
        lengths = jnp.where(jnp.any(ended, 1),
                            jnp.argmax(ended, 1) + 1, Tmax)
        return out, lengths.astype(jnp.int32)


def delay_pattern(codes, pad: int = 0):
    """MusicGen-style delay interleave: stream q shifted right by q.

    (B, T, Q) -> (B, T + Q - 1, Q); the parallel-frame dependency becomes
    strictly causal across streams (speechlm multi-stream layout role).
    """
    B, T, Q = codes.shape
    out = jnp.full((B, T + Q - 1, Q), pad, codes.dtype)
    for q in range(Q):
        out = out.at[:, q:q + T, q].set(codes[:, :, q])
    return out


def undelay_pattern(delayed, pad: int = 0):
    """Inverse of delay_pattern: (B, T + Q - 1, Q) -> (B, T, Q)."""
    B, Td, Q = delayed.shape
    T = Td - Q + 1
    return jnp.stack([delayed[:, q:q + T, q] for q in range(Q)], axis=-1)


class MultimodalVocabulary:
    """Packed id space over modalities (speechlm vocab_meta role).

    Each modality (e.g. 'text', 'codec_q0', ...) gets a contiguous
    interval; `encode`/`decode` translate local ids <-> global ids so a
    single-stream LM can model interleaved text+audio sequences.
    Special tokens (pad/bos/eos/task tags) occupy interval 0.
    """

    def __init__(self, modalities, specials=("<pad>", "<bos>", "<eos>")):
        """modalities: dict name -> local vocab size (insertion order)."""
        self.specials = {s: i for i, s in enumerate(specials)}
        self.intervals = {}
        off = len(specials)
        for name, size in modalities.items():
            self.intervals[name] = (off, off + size)
            off += size
        self.size = off

    def encode(self, name, ids):
        lo, hi = self.intervals[name]
        ids = jnp.asarray(ids)
        return ids + lo

    def decode(self, name, ids):
        lo, hi = self.intervals[name]
        ids = jnp.asarray(ids)
        return ids - lo

    def modality_of(self, gid: int):
        for name, (lo, hi) in self.intervals.items():
            if lo <= gid < hi:
                return name
        return "special"

    def special(self, tok: str) -> int:
        return self.specials[tok]

    def build_sequence(self, *segments):
        """[(modality, local_ids), ...] -> one bos...eos global id array
        (the dataloader/task_conf interleave contract)."""
        parts = [jnp.asarray([self.special("<bos>")])]
        for name, ids in segments:
            parts.append(self.encode(name, ids))
        parts.append(jnp.asarray([self.special("<eos>")]))
        return jnp.concatenate(parts)
