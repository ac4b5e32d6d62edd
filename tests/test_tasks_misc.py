"""Tests for ST/MT, SPK, diar, cls tasks + new encoders + EER."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.asr import ASRModel
from espnet_tpu.models.cls import ClassificationModel
from espnet_tpu.models.diar import DiarizationModel
from espnet_tpu.models.spk import SpeakerModel
from espnet_tpu.models.st import MTModel, STModel
from espnet_tpu.utils.eer import compute_eer, compute_min_dcf


@pytest.mark.parametrize("enc", ["branchformer", "e_branchformer"])
def test_branchformer_encoders(enc):
    model = ASRModel(
        vocab_size=8, frontend_conf=None, encoder=enc,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          cgmlp_linear_units=32, cgmlp_conv_kernel=7,
                          num_blocks=2, input_layer="linear", input_size=5,
                          **({"linear_units": 32} if enc == "e_branchformer"
                             else {})),
        decoder=None, ctc_weight=1.0)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 20, 5), jnp.float32)
    flens = jnp.asarray([20, 14])
    text = jnp.asarray([[1, 2, 3], [4, 5, 0]])
    params = model.init(jax.random.PRNGKey(0), feats, flens, text,
                        jnp.asarray([3, 2]))
    loss, stats, _ = model.apply(params, feats, flens, text,
                                 jnp.asarray([3, 2]))
    assert np.isfinite(float(loss))


def test_st_model_and_beam_decode():
    model = STModel(
        vocab_size=9, src_vocab_size=7, asr_weight=0.3,
        frontend_conf=dict(n_fft=128, hop_length=64, n_mels=10),
        encoder="transformer",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1),
        ctc_weight=0.0)
    sp = jnp.asarray(np.random.RandomState(0).randn(2, 2000), jnp.float32)
    sl = jnp.asarray([2000, 1500])
    tx = jnp.asarray([[1, 2, 3], [4, 5, 0]]); tl = jnp.asarray([3, 2])
    src = jnp.asarray([[1, 2], [3, 4]]); srcl = jnp.asarray([2, 2])
    params = model.init(jax.random.PRNGKey(0), sp, sl, tx, tl, src, srcl)
    loss, stats, _ = model.apply(params, sp, sl, tx, tl, src, srcl)
    assert "loss_asr_ctc" in stats and np.isfinite(float(loss))
    # decode via shared beam search (attention only)
    from espnet_tpu.decode.beam_search import BeamSearchConfig, batch_beam_search
    enc, el = model.apply(params, sp, sl, method=model.encode)
    res = batch_beam_search(model, params, enc, el,
                            BeamSearchConfig(beam_size=2, ctc_weight=0.0,
                                             maxlenratio=0.2))
    assert len(res) == 2


def test_mt_model():
    model = MTModel(vocab_size=9, src_vocab_size=7,
                    encoder_conf=dict(output_size=16, attention_heads=2,
                                      linear_units=32, num_blocks=1),
                    decoder_conf=dict(attention_heads=2, linear_units=32,
                                      num_blocks=1))
    tx = jnp.asarray([[1, 2, 3]]); tl = jnp.asarray([3])
    src = jnp.asarray([[1, 2, 3, 4]]); srcl = jnp.asarray([4])
    params = model.init(jax.random.PRNGKey(0), tx, tl, src, srcl)
    loss, stats, _ = model.apply(params, tx, tl, src, srcl)
    assert np.isfinite(float(loss))


def test_spk_model_and_eer():
    model = SpeakerModel(n_spk=4,
                         frontend_conf=dict(n_fft=128, hop_length=64,
                                            n_mels=10),
                         encoder_conf=dict(channels=16, num_blocks=2),
                         embed_dim=8)
    sp = jnp.asarray(np.random.RandomState(0).randn(4, 2000), jnp.float32)
    sl = jnp.full((4,), 2000)
    lab = jnp.asarray([0, 1, 2, 3])
    params = model.init(jax.random.PRNGKey(0), sp, sl, lab)
    loss, stats, _ = model.apply(params, sp, sl, lab)
    assert np.isfinite(float(loss)) and 0 <= float(stats["acc"]) <= 1
    emb = model.apply(params, sp, sl, method=model.extract_embedding)
    assert emb.shape == (4, 8)
    # EER sanity: separable scores -> low EER
    scores = np.concatenate([np.random.rand(50) + 1.0, np.random.rand(50)])
    labels = np.concatenate([np.ones(50), np.zeros(50)])
    eer, thr = compute_eer(scores, labels)
    assert eer < 0.1
    assert 0 <= compute_min_dcf(scores, labels) <= 1.5


def test_diar_model():
    model = DiarizationModel(
        num_spk=2, frontend_conf=dict(n_fft=128, hop_length=64, n_mels=10),
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear"))
    sp = jnp.asarray(np.random.RandomState(0).randn(2, 2000), jnp.float32)
    sl = jnp.asarray([2000, 1600])
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, (2, 32, 2)))
    params = model.init(jax.random.PRNGKey(0), sp, sl, labels)
    loss, stats, _ = model.apply(params, sp, sl, labels)
    assert np.isfinite(float(loss)) and "frame_acc" in stats


def test_cls_model():
    model = ClassificationModel(
        n_classes=3, frontend_conf=dict(n_fft=128, hop_length=64, n_mels=10),
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, input_layer="linear"))
    sp = jnp.asarray(np.random.RandomState(0).randn(2, 2000), jnp.float32)
    sl = jnp.asarray([2000, 1600])
    params = model.init(jax.random.PRNGKey(0), sp, sl, jnp.asarray([0, 2]))
    loss, stats, _ = model.apply(params, sp, sl, jnp.asarray([0, 2]))
    assert np.isfinite(float(loss))
