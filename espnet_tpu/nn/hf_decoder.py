"""HuggingFace transformers decoder for ASR.

Behavioral contract: espnet2/asr/decoder/
hugging_face_transformers_decoder.py — wrap a HF seq2seq decoder stack
as the attention decoder: `linear_in` projects encoder states into the
LM's hidden size, the HF decoder cross-attends to them, and an output
projection maps the LM hidden states to the task vocabulary. The
reference's `batch_score` re-runs the full prefix every step (no
incremental cache, :353-391); `score_step` here does the same inside
the fixed-slot device beam (the growing prefix lives in the decode
state, the causal mask exposes positions <= step).

Offline environment: weights are NOT downloadable, so the decoder is
built from an architecture config (`hf_config` kwargs for a flax BART
decoder — the same family the reference defaults to with mbart) and
trains from scratch, or from a LOCAL pretrained directory via
`model_name_or_path` (local_files_only).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask


def _build_bart_config(model_name_or_path: str, hf_config: dict,
                       vocab_size: int):
    from transformers import AutoConfig, BartConfig
    if model_name_or_path:
        try:
            return AutoConfig.from_pretrained(model_name_or_path,
                                              local_files_only=True)
        except Exception as e:
            raise RuntimeError(
                f"could not load a local HF config from "
                f"{model_name_or_path!r} (offline environment: hub "
                f"names are not downloadable; pass hf_config "
                f"architecture kwargs instead)") from e
    conf = dict(hf_config or {})
    conf.setdefault("vocab_size", vocab_size)
    conf.setdefault("d_model", 256)
    conf.setdefault("decoder_layers", 2)
    conf.setdefault("decoder_attention_heads", 4)
    conf.setdefault("decoder_ffn_dim", 1024)
    conf.setdefault("max_position_embeddings", 1024)
    conf.setdefault("dropout", 0.1)
    return BartConfig(**conf)


class HuggingFaceDecoder(nn.Module):
    """HF flax decoder stack with cross-attention, wired to the shared
    functional scorer protocol (init_state/score_step/select_state)."""

    vocab_size: int
    encoder_output_size: int = 256
    model_name_or_path: str = ""
    hf_config: dict = None

    def setup(self):
        from transformers.models.bart.modeling_flax_bart import \
            FlaxBartDecoder
        config = _build_bart_config(self.model_name_or_path,
                                    self.hf_config, self.vocab_size)
        self.config = config
        embed = nn.Embed(config.vocab_size, config.d_model,
                         name="decoder_embed")
        self.hf_decoder = FlaxBartDecoder(config, embed_tokens=embed,
                                          name="hf_decoder")
        self.linear_in = nn.Dense(config.d_model, name="linear_in")
        self.output_layer = nn.Dense(self.vocab_size, name="output_layer")

    def _forward(self, enc, enc_mask, ys, ys_mask, *, deterministic=True):
        pos = jnp.broadcast_to(jnp.arange(ys.shape[1])[None], ys.shape)
        out = self.hf_decoder(
            input_ids=ys, attention_mask=ys_mask.astype(jnp.int32),
            position_ids=pos,
            encoder_hidden_states=enc,
            encoder_attention_mask=enc_mask.astype(jnp.int32),
            deterministic=deterministic)
        return self.output_layer(out.last_hidden_state)

    def __call__(self, memory, memory_lens, ys_in, ys_in_lens, *,
                 deterministic=True, return_hidden=False):
        enc = self.linear_in(memory)
        enc_mask = make_non_pad_mask(memory_lens, memory.shape[1])
        ys_mask = make_non_pad_mask(ys_in_lens, ys_in.shape[1])
        logits = self._forward(enc, enc_mask, ys_in, ys_mask,
                               deterministic=deterministic)
        if return_hidden:
            return logits, logits
        return logits

    # ---- functional scorer protocol (beam search) ----

    def init_state(self, memory, memory_lens, batch: int, maxlen: int):
        """The HF stack has no beam-folded cross-attention, so encoder
        states expand to hypothesis rows here (B*beam), unlike the
        native TransformerDecoder which keeps them at B."""
        B = memory.shape[0]
        beam = batch // max(B, 1)
        enc = self.linear_in(memory)
        enc = jnp.repeat(enc, beam, axis=0)
        enc_mask = jnp.repeat(
            make_non_pad_mask(memory_lens, memory.shape[1]), beam, axis=0)
        return {
            "ys": jnp.zeros((batch, maxlen), jnp.int32),
            "enc": enc,
            "enc_mask": enc_mask,
        }

    @staticmethod
    def select_state(state, idx):
        """Only the prefix buffer is hypothesis-mutable; the expanded
        encoder rows are identical within a beam block."""
        return dict(state, ys=state["ys"][idx])

    def score_step(self, token, step, state, *, deterministic=True):
        ys = jax.vmap(
            lambda row, t: jax.lax.dynamic_update_index_in_dim(
                row, t, step, axis=0))(state["ys"],
                                       token.astype(jnp.int32))
        maxlen = ys.shape[1]
        ys_mask = jnp.broadcast_to(jnp.arange(maxlen)[None] <= step,
                                   ys.shape)
        logits = self._forward(state["enc"], state["enc_mask"], ys,
                               ys_mask, deterministic=deterministic)
        cur = jax.lax.dynamic_slice_in_dim(logits, step, 1, axis=1)[:, 0]
        return (jax.nn.log_softmax(cur, axis=-1),
                dict(state, ys=ys))
