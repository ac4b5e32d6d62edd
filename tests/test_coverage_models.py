"""EDA diarization, MVDR beamformer, RNN encoder coverage tests."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRModel
from espnet_tpu.models.diar import DiarizationModel
from espnet_tpu.models.enh.beamformer import NeuralBeamformer


def test_eda_diarization():
    model = DiarizationModel(
        num_spk=2, use_attractor=True,
        frontend_conf=dict(n_fft=128, hop_length=64, n_mels=10),
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear"))
    sp = jnp.asarray(np.random.RandomState(0).randn(2, 2000), jnp.float32)
    sl = jnp.asarray([2000, 1600])
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, (2, 32, 2)))
    params = model.init(jax.random.PRNGKey(0), sp, sl, labels)
    loss, stats, _ = model.apply(params, sp, sl, labels)
    assert np.isfinite(float(loss))


def test_mvdr_beamformer():
    rng = np.random.RandomState(0)
    # 2-channel mixture: source + delayed copy + noise
    src = rng.randn(1024).astype(np.float32) * 0.3
    ch0 = src + 0.05 * rng.randn(1024).astype(np.float32)
    ch1 = np.roll(src, 2) + 0.05 * rng.randn(1024).astype(np.float32)
    mix = jnp.asarray(np.stack([ch0, ch1], axis=-1))[None]  # (1, S, 2)
    lens = jnp.asarray([1024])
    ref = jnp.asarray(src)[None]
    model = NeuralBeamformer(n_fft=128, hop_length=64, mask_hidden=16,
                             mask_layers=1)
    params = model.init(jax.random.PRNGKey(0), mix, lens, ref)
    loss, stats, _ = model.apply(params, mix, lens, ref)
    assert np.isfinite(float(loss))
    wav, olens = model.apply(params, mix, lens, method=model.enhance)
    assert wav.shape == (1, 1024)
    assert np.isfinite(np.asarray(wav)).all()
    g = jax.grad(lambda p: model.apply(p, mix, lens, ref)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_rnn_encoder_asr():
    model = ASRModel(
        vocab_size=8, frontend_conf=None, encoder="vgg_rnn",
        encoder_conf=dict(output_size=16, hidden_size=16, num_layers=1),
        decoder=None, ctc_weight=1.0)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 24, 8), jnp.float32)
    flens = jnp.asarray([24, 16])
    text = jnp.asarray([[1, 2], [3, 0]])
    tlens = jnp.asarray([2, 1])
    params = model.init(jax.random.PRNGKey(0), feats, flens, text, tlens)
    loss, _, _ = model.apply(params, feats, flens, text, tlens)
    assert np.isfinite(float(loss))
