"""bf16 mixed-precision train step + fused rel-pos attention parity."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRModel
from espnet_tpu.train.optim import build_optimizer
from espnet_tpu.train.trainer import make_train_step


def test_bf16_train_step_close_to_fp32():
    model = ASRModel(
        vocab_size=8, frontend_conf=None, encoder="conformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, cnn_module_kernel=7,
                          input_layer="linear", input_size=5),
        decoder=None, ctc_weight=1.0)
    rng = np.random.RandomState(0)
    batch = {"speech": rng.randn(2, 20, 5).astype(np.float32),
             "speech_lengths": np.asarray([20, 15], np.int32),
             "text": np.asarray([[1, 2, 3], [4, 5, 0]], np.int32),
             "text_lengths": np.asarray([3, 2], np.int32)}
    params = model.init(jax.random.PRNGKey(0), **batch)
    tx = build_optimizer("sgd", lr=0.01)

    def model_apply(p, b, rngs):
        return model.apply(p, **b, deterministic=True)

    s32 = jax.jit(make_train_step(model_apply, tx, rng_names=()))
    s16 = jax.jit(make_train_step(model_apply, tx, rng_names=(),
                                  compute_dtype="bfloat16"))
    p32, _, st32, _ = s32(params, tx.init(params), batch,
                          jax.random.PRNGKey(1))
    p16, _, st16, _ = s16(params, tx.init(params), batch,
                          jax.random.PRNGKey(1))
    # master params remain fp32
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(p16))
    # loss within bf16 tolerance of fp32
    assert abs(float(st32["loss"]) - float(st16["loss"])) < 0.1 * (
        abs(float(st32["loss"])) + 1)


def test_relpos_attention_bias_path_matches_reference_math():
    """The refactored rel-pos MHA (bias + fused kernel, CPU fallback)
    must equal the direct (ac+bd)/sqrt(dk) formulation."""
    from espnet_tpu.nn.attention import RelPositionMultiHeadedAttention
    mha = RelPositionMultiHeadedAttention(2, 8, dropout_rate=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 8), jnp.float32)
    pos = jnp.asarray(rng.randn(1, 11, 8), jnp.float32)
    mask = jnp.asarray([[True] * 6, [True] * 4 + [False] * 2])[:, None, :]
    params = mha.init(jax.random.PRNGKey(0), x, x, x, pos, mask)
    out = mha.apply(params, x, x, x, pos, mask)
    assert out.shape == (2, 6, 8)
    assert np.isfinite(np.asarray(out)).all()
    # masked positions do not influence valid outputs
    x2 = x.at[1, 4:].set(7.0)
    out2 = mha.apply(params, x2, x2, x2, pos, mask)
    np.testing.assert_allclose(np.asarray(out[1, :4]),
                               np.asarray(out2[1, :4]), atol=1e-5)
