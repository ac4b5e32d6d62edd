"""RWKV / MEGA transducer prediction networks: step==full parity and
e2e transducer wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("name,conf", [
    ("rwkv", {"hidden_size": 24, "num_layers": 2}),
    ("mega", {"hidden_size": 24, "num_layers": 2, "zdim": 16, "ndim": 2,
              "max_len": 16}),
])
def test_step_matches_full_forward(name, conf):
    """Incremental step() must reproduce the full-sequence __call__
    exactly — the property the beam searches rely on."""
    from espnet_tpu.models.transducer import DECODER_CLASSES
    dec = DECODER_CLASSES[name](vocab_size=11, dropout_rate=0.0, **conf)
    labels = jnp.asarray([[0, 3, 5, 2, 7], [0, 1, 1, 4, 9]], jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), labels)
    full = dec.apply(params, labels)

    carry = dec.apply(params, 2, method=dec.init_carry)
    outs = []
    for t in range(labels.shape[1]):
        out, carry = dec.apply(params, carry, labels[:, t],
                               method=dec.step)
        outs.append(out)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("name", ["rwkv", "mega"])
def test_transducer_model_trains(name):
    """TransducerModel with the new decoders: loss finite, grads flow."""
    import optax

    from espnet_tpu.models.transducer import TransducerModel
    conf = {"hidden_size": 16, "num_layers": 1}
    if name == "mega":
        conf.update({"zdim": 8, "ndim": 2, "max_len": 16})
    m = TransducerModel(
        vocab_size=7, frontend_conf=None, normalize=None,
        encoder="transformer",
        encoder_conf={"output_size": 16, "attention_heads": 2,
                      "linear_units": 32, "num_blocks": 1,
                      "input_layer": "linear", "input_size": 5},
        decoder=name, decoder_conf=conf,
        joint_conf={"joint_space_size": 16})
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 12, 5),
                        jnp.float32)
    flens = jnp.asarray([12, 9], jnp.int32)
    text = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    tlens = jnp.asarray([3, 2], jnp.int32)
    params = m.init(jax.random.PRNGKey(0), feats, flens, text, tlens)

    def loss_fn(p):
        loss, stats, w = m.apply(p, feats, flens, text, tlens)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert float(optax.global_norm(grads)) > 0

    # greedy search runs with the stateful carry
    from espnet_tpu.decode.transducer_search import greedy_search
    enc, enc_lens = m.apply(params, feats, flens, method=m.encode)
    hyp = greedy_search(m, params, enc, enc_lens)
    assert len(hyp) == 2
