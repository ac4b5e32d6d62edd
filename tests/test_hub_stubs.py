"""Offline hub stubs fail legibly (asr/frontend/s3prl.py,
enh/separator/asteroid_models.py, espnet_model_zoo roles)."""

import pytest

from espnet_tpu.utils.hub import (AsteroidModel_Converter, OfflineHubError,
                                  S3prlFrontend, resolve_model_tag)


def test_s3prl_stub_message():
    with pytest.raises(OfflineHubError, match="pip install s3prl"):
        S3prlFrontend(frontend_conf={"upstream": "hubert"})


def test_asteroid_stub_registered():
    from espnet_tpu.models.enh.separators import SEPARATORS
    with pytest.raises(OfflineHubError, match="pip install asteroid"):
        SEPARATORS["asteroid"](input_dim=64)


def test_model_tag_local_dir(tmp_path):
    d = tmp_path / "packed"
    d.mkdir()
    assert resolve_model_tag(str(d)) == d


def test_model_tag_hub_raises():
    with pytest.raises(OfflineHubError, match="espnet_model_zoo"):
        resolve_model_tag("espnet/somebody_librispeech_asr")


def test_s3prl_frontend_via_asr_config():
    from espnet_tpu.models.asr import ASRModel
    import jax
    import jax.numpy as jnp
    model = ASRModel(vocab_size=5, frontend="s3prl",
                     frontend_conf={"upstream": "wav2vec2"},
                     encoder="transformer",
                     encoder_conf={"output_size": 16, "num_blocks": 1,
                                   "attention_heads": 2, "linear_units": 16},
                     decoder=None, ctc_weight=1.0)
    with pytest.raises(OfflineHubError, match="s3prl"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 800)),
                   jnp.asarray([800]), jnp.ones((1, 4), jnp.int32),
                   jnp.asarray([4]))
