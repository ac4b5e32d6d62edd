"""Text2Discrete inference API (espnet2/bin/tts2_inference.py contract):
text -> discrete speech units; optional unit-to-wave decoding through a
trained neural codec's decoder."""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.tts2 import TTS2Task
from espnet_tpu.text.tokenizer import TokenIDConverter, build_tokenizer

logger = logging.getLogger(__name__)


class Text2Discrete:
    def __init__(self, train_config=None, model_file=None,
                 codec_config=None, codec_file=None, **kwargs):
        self.model, self.params, self.cfg = TTS2Task.build_model_from_file(
            train_config, model_file)
        token_list = read_tokens(self.cfg["token_list"])
        self.converter = TokenIDConverter(token_list)
        self.tokenizer = build_tokenizer(
            self.cfg.get("token_type", "char"),
            g2p_type=self.cfg.get("g2p"))
        self._infer = jax.jit(
            lambda p, t, tl: self.model.apply(p, t, tl,
                                              method=self.model.inference))
        self.codec = self.codec_params = None
        if codec_config is not None:
            from espnet_tpu.tasks.ssl import CodecTask
            self.codec, self.codec_params, _ = \
                CodecTask.build_model_from_file(codec_config, codec_file)

    def __call__(self, text: str):
        """-> dict(units (T,) int32[, wav (S,)])."""
        toks = self.tokenizer.text2tokens(text)
        ids = np.asarray(self.converter.tokens2ids(toks), np.int32)
        from espnet_tpu.data.batching import bucket_length
        L = bucket_length(len(ids), base=16, growth=1.3)
        padded = np.zeros((L,), np.int32)
        padded[:len(ids)] = ids
        units, olens = self._infer(self.params, jnp.asarray(padded[None]),
                                   jnp.asarray([len(ids)], jnp.int32))
        units = np.asarray(units)[0, :int(olens[0])]
        out = {"units": units}
        if self.codec is not None:
            # single-stream units -> (B, T, 1) first-quantizer codes
            wav = self.codec.apply(
                self.codec_params, jnp.asarray(units[None, :, None]),
                method=self.codec.decode)
            out["wav"] = np.asarray(wav)[0]
        return out


def read_tokens(path):
    from espnet_tpu.tasks.asr import read_token_list
    return read_token_list(path)
