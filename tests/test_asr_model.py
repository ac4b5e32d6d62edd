"""ASR model forward/loss tests (reference style:
test/espnet2/asr/test_espnet_model.py — tiny dims, loss finite, grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.asr import ASRModel


def tiny_model(**kw):
    cfg = dict(
        vocab_size=10,
        frontend_conf=dict(n_fft=128, hop_length=64, n_mels=20),
        encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, input_layer="conv2d"),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2),
        ctc_weight=0.3, lsm_weight=0.1,
    )
    cfg.update(kw)
    return ASRModel(**cfg)


def batch():
    rng = np.random.RandomState(0)
    speech = jnp.asarray(rng.randn(2, 4000), jnp.float32)
    speech_lengths = jnp.asarray([4000, 3000])
    text = jnp.asarray([[1, 2, 3, 4], [5, 6, 0, 0]])
    text_lengths = jnp.asarray([4, 2])
    return speech, speech_lengths, text, text_lengths


@pytest.mark.parametrize("ctc_weight", [0.0, 0.3, 1.0])
def test_asr_forward(ctc_weight):
    model = tiny_model(ctc_weight=ctc_weight,
                       decoder=None if ctc_weight == 1.0 else "transformer")
    sp, sl, tx, tl = batch()
    params = model.init(jax.random.PRNGKey(0), sp, sl, tx, tl)
    loss, stats, weight = model.apply(params, sp, sl, tx, tl)
    assert np.isfinite(float(loss))
    assert float(weight) == 2.0
    if ctc_weight > 0:
        assert "loss_ctc" in stats
    if ctc_weight < 1:
        assert "loss_att" in stats and "acc" in stats


def test_asr_grad_and_specaug():
    model = tiny_model(specaug_conf=dict(time_warp_window=2,
                                         freq_mask_width_range=(0, 5),
                                         time_mask_width_range=(0, 5)))
    sp, sl, tx, tl = batch()
    params = model.init(jax.random.PRNGKey(0), sp, sl, tx, tl)

    def loss_fn(p):
        loss, _, _ = model.apply(
            p, sp, sl, tx, tl, deterministic=False,
            rngs={"specaug": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)})
        return loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_asr_conformer_interctc():
    model = tiny_model(
        encoder="conformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, cnn_module_kernel=7,
                          interctc_layer_idx=(1,)),
        interctc_weight=0.3)
    sp, sl, tx, tl = batch()
    params = model.init(jax.random.PRNGKey(0), sp, sl, tx, tl)
    loss, stats, _ = model.apply(params, sp, sl, tx, tl)
    assert "loss_interctc" in stats
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_multiconv_and_longformer_encoders_train():
    """Multiconvformer (multiconvformer_encoder.py:48, M-CGMLP conv
    module incl. weighted_sum variant) and Longformer-style banded
    attention encoder train through the hybrid loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.models.asr import ASRModel
    rng = np.random.RandomState(0)
    b = {"speech": jnp.asarray(rng.randn(2, 4000) * 0.1, jnp.float32),
         "speech_lengths": jnp.asarray([4000, 3600], jnp.int32),
         "text": jnp.asarray([[1, 2, 1, -1], [2, 1, -1, -1]], jnp.int32),
         "text_lengths": jnp.asarray([3, 2], jnp.int32)}
    for enc, conf in [
        ("multiconv_conformer",
         {"output_size": 16, "attention_heads": 2, "linear_units": 32,
          "num_blocks": 1, "input_layer": "linear",
          "multicgmlp_kernel_sizes": (3, 7),
          "multicgmlp_linear_units": 32}),
        ("multiconv_conformer",
         {"output_size": 16, "attention_heads": 2, "linear_units": 32,
          "num_blocks": 1, "input_layer": "linear",
          "multicgmlp_kernel_sizes": (3, 7),
          "multicgmlp_type": "weighted_sum",
          "multicgmlp_linear_units": 32}),
        ("longformer",
         {"output_size": 16, "attention_heads": 2, "linear_units": 32,
          "num_blocks": 1, "input_layer": "linear",
          "attention_window": 4}),
    ]:
        model = ASRModel(
            vocab_size=5, encoder=enc, encoder_conf=conf,
            frontend_conf={"n_fft": 256, "hop_length": 128, "n_mels": 20},
            decoder_conf={"attention_heads": 2, "linear_units": 32,
                          "num_blocks": 1}, ctc_weight=0.3)
        params = model.init(jax.random.PRNGKey(0), **b)
        loss, stats, _ = model.apply(params, **b)
        assert np.isfinite(float(loss)), (enc, conf)
        g = jax.grad(lambda p: model.apply(p, **b)[0])(params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g)), (enc, conf)
