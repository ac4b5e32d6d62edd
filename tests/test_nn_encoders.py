"""Encoder/decoder module tests: tiny dims, shapes, grads, mask
invariance (reference test style: test/espnet2/asr/encoder/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.nn.attention import MultiHeadedAttention, rel_shift
from espnet_tpu.nn.conformer import ConformerEncoder
from espnet_tpu.nn.decoder import TransformerDecoder
from espnet_tpu.nn.subsampling import Conv2dSubsampling
from espnet_tpu.nn.transformer import TransformerEncoder


def test_rel_shift():
    # check against direct index computation: out[q, k] = in[q, T-1 - (q - k)]
    B, H, T = 1, 1, 4
    x = jnp.arange(2 * T - 1, dtype=jnp.float32)[None, None, None, :]
    x = jnp.tile(x, (B, H, T, 1))
    y = np.asarray(rel_shift(x))
    for q in range(T):
        for k in range(T):
            assert y[0, 0, q, k] == (T - 1) - q + k


def test_mha_mask():
    mha = MultiHeadedAttention(2, 8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8), jnp.float32)
    mask = jnp.asarray([[True] * 5, [True, True, True, False, False]])[:, None, :]
    params = mha.init(jax.random.PRNGKey(0), x, x, x, mask)
    out = mha.apply(params, x, x, x, mask)
    assert out.shape == (2, 5, 8)
    # changing masked-out positions must not affect valid outputs
    x2 = x.at[1, 3:].set(99.0)
    out2 = mha.apply(params, x2, x2, x2, mask)
    np.testing.assert_allclose(np.asarray(out[1, :3]), np.asarray(out2[1, :3]),
                               atol=1e-5)


@pytest.mark.parametrize("rate", [2, 4, 6, 8])
def test_subsampling_rates(rate):
    m = Conv2dSubsampling(odim=16, rate=rate)
    x = jnp.ones((2, 32, 20))
    params = m.init(jax.random.PRNGKey(0), x, jnp.asarray([32, 20]))
    y, olens = m.apply(params, x, jnp.asarray([32, 20]))
    assert y.shape[0] == 2 and y.shape[2] == 16
    assert int(olens[0]) == y.shape[1]
    assert int(olens[1]) <= int(olens[0])


@pytest.mark.parametrize("cls,extra", [
    (TransformerEncoder, {}),
    (ConformerEncoder, {"cnn_module_kernel": 7}),
])
def test_encoders_forward(cls, extra):
    enc = cls(input_size=20, output_size=16, attention_heads=2,
              linear_units=32, num_blocks=2, **extra)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 40, 20), jnp.float32)
    ilens = jnp.asarray([40, 25])
    params = enc.init(jax.random.PRNGKey(0), x, ilens)
    y, olens = enc.apply(params, x, ilens)
    assert y.shape[2] == 16
    assert int(olens[0]) > int(olens[1])
    assert not np.isnan(np.asarray(y)).any()


def test_transformer_decoder_forward_and_step_consistency():
    """score_step with KV cache must reproduce teacher-forced logits."""
    dec = TransformerDecoder(vocab_size=11, encoder_output_size=16,
                             attention_heads=2, linear_units=32, num_blocks=2)
    memory = jnp.asarray(np.random.RandomState(0).randn(1, 7, 16), jnp.float32)
    mlens = jnp.asarray([7])
    ys = jnp.asarray([[10, 3, 4, 5]])  # sos + 3 tokens
    params = dec.init(jax.random.PRNGKey(0), memory, mlens, ys,
                      jnp.asarray([4]))
    logits = dec.apply(params, memory, mlens, ys, jnp.asarray([4]))
    assert logits.shape == (1, 4, 11)

    # incremental: replay tokens through score_step
    state = dec.apply(params, memory, mlens, 1, 6, method=dec.init_state)
    for step in range(4):
        logp, state = dec.apply(params, ys[:, step], step, state,
                                method=dec.score_step)
    ref = jax.nn.log_softmax(logits[:, 3], axis=-1)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(ref), atol=1e-4)


def test_preencoder_and_postencoder_in_asr_model():
    """linear preencoder (preencoder/linear.py) + length-adaptor
    postencoder (postencoder/length_adaptor.py) wired through encode."""
    import jax
    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=8, frontend_conf=None,
        preencoder="linear", preencoder_conf=dict(output_size=12),
        postencoder="length_adaptor", postencoder_conf=dict(n_layers=1),
        encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear"),
        decoder=None, ctc_weight=1.0)
    B, T, F = 2, 12, 5
    batch = {
        "speech": np.random.RandomState(0).randn(B, T, F).astype(np.float32),
        "speech_lengths": np.asarray([12, 8], np.int32),
        "text": np.ones((B, 3), np.int32),
        "text_lengths": np.full((B,), 3, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)
    loss, _, _ = model.apply(params, **batch)
    assert np.isfinite(float(loss))
    enc, enc_lens = model.apply(params, batch["speech"],
                                batch["speech_lengths"],
                                method=model.encode)
    assert enc.shape[1] == (T + 1) // 2  # halved by the length adaptor
    assert enc_lens.tolist() == [6, 4]


def test_sinc_preencoder_shapes():
    """SincNet band-pass preencoder over framed raw speech
    (preencoder/sinc.py role)."""
    import jax
    from espnet_tpu.nn.preencoder import LightweightSincConvs
    pre = LightweightSincConvs(n_filters=8, kernel_size=33, out_channels=16)
    x = np.random.RandomState(0).randn(2, 6, 40).astype(np.float32)
    lens = np.asarray([6, 4], np.int32)
    params = pre.init(jax.random.PRNGKey(0), x, lens)
    y, ol = pre.apply(params, x, lens)
    assert y.shape == (2, 6, 16)
    assert ol.tolist() == [6, 4]


def test_banded_attention_matches_masked_einsum():
    """banded_attention (XLA path) == full attention with an explicit
    band+padding mask; encoder windowed path stays consistent."""
    import jax
    import jax.numpy as jnp
    from espnet_tpu.ops.attention_kernels import banded_attention
    from espnet_tpu.utils.masks import attention_bias
    rng = np.random.RandomState(0)
    B, H, T, d = 2, 2, 10, 8
    q = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
    valid = jnp.asarray(np.arange(T)[None, :] < np.asarray([[10], [7]]))
    W = 3
    out = banded_attention(q, k, v, W, valid, sm_scale=0.5)
    band = np.abs(np.arange(T)[:, None] - np.arange(T)[None, :]) <= W
    mask = jnp.asarray(band)[None, None] & valid[:, None, None, :]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.5
    scores = jnp.where(mask, scores, -1e9)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(out)[:, :, :7],
                               np.asarray(ref)[:, :, :7], atol=1e-5)


def test_windowed_encoder_uses_band_semantics():
    """attention_window encoder output == full-attention encoder with the
    band folded into the mask (routing through MHA window path)."""
    import jax
    from espnet_tpu.nn.transformer import TransformerEncoder
    x = np.random.RandomState(0).randn(2, 12, 5).astype(np.float32)
    lens = np.asarray([12, 9], np.int32)
    enc = TransformerEncoder(input_size=5, output_size=16,
                             attention_heads=2, linear_units=32,
                             num_blocks=1, input_layer="linear",
                             dropout_rate=0.0, attention_window=2)
    params = enc.init(jax.random.PRNGKey(0), x, lens)
    y, ol = enc.apply(params, x, lens)
    assert np.all(np.isfinite(np.asarray(y)[0]))
    # band actually restricts: a distant-frame perturbation must not
    # change early outputs (window 2, 1 block)
    x2 = x.copy()
    x2[0, 11] += 10.0
    y2, _ = enc.apply(params, x2, lens)
    np.testing.assert_allclose(np.asarray(y)[0, :8],
                               np.asarray(y2)[0, :8], atol=1e-5)


def test_avhubert_encoder_av_and_audio_only():
    """AVHubert AV encoder (asr/encoder/avhubert_encoder.py contract):
    trains on speech+video through ASRModel; audio-only forward also
    works (modality robustness); video actually changes the encoding."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=8, ctc_weight=0.3,
        frontend_conf={"n_fft": 128, "hop_length": 64, "n_mels": 20},
        encoder="avhubert",
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1,
                      "video_stem_channels": 4},
        decoder="transformer",
        decoder_conf={"attention_heads": 2, "linear_units": 32,
                      "num_blocks": 1})
    rng = np.random.RandomState(0)
    b = {"speech": jnp.asarray(rng.randn(2, 2000) * 0.1, jnp.float32),
         "speech_lengths": jnp.asarray([2000, 1500], jnp.int32),
         "video": jnp.asarray(rng.randn(2, 8, 16, 16) * 0.1, jnp.float32),
         "video_lengths": jnp.asarray([8, 6], jnp.int32),
         "text": jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32),
         "text_lengths": jnp.asarray([3, 2], jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **b)
    loss, stats, w = model.apply(params, **b)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, **b)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    # audio-only (video=None) still encodes
    enc, lens = model.apply(params, b["speech"], b["speech_lengths"],
                            method=model.encode)
    assert np.isfinite(np.asarray(enc)).all()
    # video conditioning reaches the encoding
    enc_av, _ = model.apply(params, b["speech"], b["speech_lengths"],
                            video=b["video"], method=model.encode)
    assert not np.allclose(np.asarray(enc), np.asarray(enc_av))


def test_beats_as_asr_encoder():
    """BEATs backbone as ASR encoder (asr/encoder/beats_encoder.py
    role): patch-sequence transformer over log-mel, one vector per
    time row, trains through the hybrid loss."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=8, ctc_weight=1.0, decoder=None,
        frontend_conf={"n_fft": 256, "hop_length": 128, "n_mels": 32},
        encoder="beats",
        encoder_conf={"output_size": 16, "patch_t": 2,
                      "patch_f": 8, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1})
    rng = np.random.RandomState(0)
    b = {"speech": jnp.asarray(rng.randn(2, 4000) * 0.1, jnp.float32),
         "speech_lengths": jnp.asarray([4000, 3000], jnp.int32),
         "text": jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32),
         "text_lengths": jnp.asarray([3, 2], jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **b)
    loss, stats, w = model.apply(params, **b)
    assert np.isfinite(float(loss))
