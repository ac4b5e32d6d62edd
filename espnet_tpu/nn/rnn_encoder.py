"""RNN (VGG-BLSTM) encoder — the legacy espnet1 ASR encoder family.

Behavioral contract: espnet2/asr/encoder/{rnn_encoder.py,
vgg_rnn_encoder.py} + legacy/nets/pytorch_backend/rnn/encoders.py
(VGG2L: two conv blocks with 2x2 max-pool -> projected BLSTM stack).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask


class VGG2L(nn.Module):
    """Two VGG conv blocks, each 2x maxpool over time+freq -> 4x
    subsampling in time."""

    @nn.compact
    def __call__(self, x, ilens):
        h = x[:, :, :, None]  # (B, T, F, 1)
        for i, ch in enumerate((64, 128)):
            h = nn.relu(nn.Conv(ch, (3, 3), padding="SAME",
                                name=f"conv{i}_1")(h))
            h = nn.relu(nn.Conv(ch, (3, 3), padding="SAME",
                                name=f"conv{i}_2")(h))
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            ilens = (ilens + 1) // 2
        B, T, F, C = h.shape
        return h.reshape(B, T, F * C), ilens


class RNNEncoder(nn.Module):
    input_size: int
    output_size: int = 320
    num_layers: int = 4
    hidden_size: int = 320
    use_vgg: bool = True
    bidirectional: bool = True
    dropout_rate: float = 0.0
    # espnet registry parity fields (unused placeholders)
    input_layer: str = "vgg"

    @nn.compact
    def __call__(self, xs, ilens, *, deterministic=True,
                 return_intermediates=False):
        if self.use_vgg:
            xs, olens = VGG2L(name="vgg")(xs, ilens)
        else:
            olens = ilens
        h = xs
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                         name=f"lstm_f{i}")(h)
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                             reverse=True, keep_order=True,
                             name=f"lstm_b{i}")(h)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
            # per-layer projection (espnet 'p' variant)
            h = jnp.tanh(nn.Dense(self.output_size, name=f"proj{i}")(h))
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        mask = make_non_pad_mask(olens, h.shape[1])
        h = jnp.where(mask[:, :, None], h, 0.0)
        if return_intermediates:
            return h, olens, []
        return h, olens
