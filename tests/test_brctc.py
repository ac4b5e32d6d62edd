"""Bayes-risk CTC (espnet2/asr/bayes_risk_ctc.py contract): exact CTC at
risk_factor=0, early-emission bias otherwise."""

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _case():
    rng = np.random.RandomState(0)
    B, T, V, U = 3, 11, 6, 4
    logits = rng.randn(B, T, V).astype(np.float32)
    ys = rng.randint(1, V, (B, U)).astype(np.int32)
    hlens = np.asarray([11, 8, 9], np.int32)
    ylens = np.asarray([4, 2, 3], np.int32)
    return logits, ys, hlens, ylens


def test_brctc_equals_vanilla_ctc_at_zero_risk():
    from espnet_tpu.ops.brctc import brctc_loss, ctc_forward_backward
    logits, ys, hlens, ylens = _case()
    labels = np.where(np.arange(ys.shape[1])[None] < ylens[:, None], ys, 0)
    ref = optax.ctc_loss(
        jnp.asarray(logits),
        jnp.arange(logits.shape[1])[None] >= hlens[:, None],
        jnp.asarray(labels),
        jnp.arange(ys.shape[1])[None] >= ylens[:, None])
    l0 = brctc_loss(jnp.asarray(logits), hlens, ys, ylens, risk_factor=0.0)
    np.testing.assert_allclose(float(l0), float(np.mean(np.asarray(ref))),
                               rtol=1e-5)
    # forward-backward self-consistency: alpha+beta at any t == loglik
    logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    alpha, beta, loglik = ctc_forward_backward(logp, hlens, ys, ylens)
    for t in (0, 3, 7):
        ab = jax.scipy.special.logsumexp(alpha[:, :, t] + beta[:, :, t],
                                         axis=1)
        np.testing.assert_allclose(np.asarray(ab), np.asarray(loglik),
                                   rtol=1e-4)


def test_brctc_risk_penalizes_late_emission():
    """A higher risk factor must increase loss on late-aligned posteriors
    and produce finite grads (the low-latency training signal)."""
    from espnet_tpu.ops.brctc import brctc_loss
    logits, ys, hlens, ylens = _case()
    l0 = brctc_loss(jnp.asarray(logits), hlens, ys, ylens, risk_factor=0.0)
    l5 = brctc_loss(jnp.asarray(logits), hlens, ys, ylens, risk_factor=0.5)
    assert float(l5) > float(l0)
    for gs in ("end", "end_mean"):
        for rs in ("exp", "exp_rel"):
            g = jax.grad(lambda lg: brctc_loss(
                lg, hlens, ys, ylens, risk_strategy=rs, group_strategy=gs,
                risk_factor=0.3))(jnp.asarray(logits))
            assert np.all(np.isfinite(np.asarray(g))), (gs, rs)


def test_asr_model_with_brctc():
    from espnet_tpu.models.asr import ASRModel
    model = ASRModel(
        vocab_size=8, frontend_conf=None, encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear", input_size=5),
        decoder=None, ctc_weight=1.0,
        ctc_conf={"ctc_type": "brctc", "risk_factor": 0.3})
    batch = {
        "speech": np.random.RandomState(0).randn(2, 12, 5).astype(np.float32),
        "speech_lengths": np.full((2,), 12, np.int32),
        "text": np.ones((2, 3), np.int32) * 2,
        "text_lengths": np.full((2,), 3, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)
    loss, stats, _ = model.apply(params, **batch)
    assert np.isfinite(float(loss))
