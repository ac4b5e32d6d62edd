"""LoRA adapter tests: injection, merged forward, adapter-only training."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRModel
from espnet_tpu.train.lora import init_lora, make_lora_train_step, merge_lora
from espnet_tpu.train.optim import build_optimizer


def test_lora_train_only_adapters():
    model = ASRModel(
        vocab_size=8, frontend_conf=None, encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear", input_size=5),
        decoder=None, ctc_weight=1.0)
    batch = {"speech": np.random.RandomState(0).randn(2, 12, 5
                                                      ).astype(np.float32),
             "speech_lengths": np.asarray([12, 10], np.int32),
             "text": np.asarray([[1, 2], [3, 0]], np.int32),
             "text_lengths": np.asarray([2, 1], np.int32)}
    params = model.init(jax.random.PRNGKey(0), **batch)
    lora, scaling = init_lora(jax.random.PRNGKey(1), params, rank=2)
    assert len(lora) >= 2  # q and v kernels matched
    # b zero-init => merged == base initially
    merged = merge_lora(params, lora, scaling)
    l0, _, _ = model.apply(params, **batch)
    l1, _, _ = model.apply(merged, **batch)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)

    def apply(p, b, rngs):
        return model.apply(p, **b, deterministic=True)

    tx = build_optimizer("adam", lr=0.05)
    step = jax.jit(make_lora_train_step(apply, tx, params, scaling,
                                        rng_names=()))
    opt = tx.init(lora)
    losses = []
    for i in range(5):
        lora, opt, stats, _ = step(lora, opt, batch, jax.random.PRNGKey(i))
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0]  # adapters actually learn
    # adapter tree small vs full params
    n_lora = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(lora))
    n_full = sum(np.asarray(x).size
                 for x in jax.tree_util.tree_leaves(params))
    assert n_lora < n_full * 0.2
