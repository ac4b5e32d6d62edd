"""Orbax checkpoint round trip + S2T primer inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_orbax_roundtrip(tmp_path):
    try:
        import orbax.checkpoint  # noqa
    except ImportError:
        pytest.skip("orbax unavailable")
    from espnet_tpu.train.checkpoint import (load_checkpoint_orbax,
                                             save_checkpoint_orbax)
    params = {"a": jnp.ones((4, 3)), "b": {"c": jnp.arange(5)}}
    save_checkpoint_orbax(tmp_path / "ck", params, meta={"epoch": 3})
    loaded, _, meta = load_checkpoint_orbax(tmp_path / "ck")
    np.testing.assert_allclose(np.asarray(loaded["a"]),
                               np.asarray(params["a"]))
    assert meta["epoch"] == 3


def test_s2t_speech2text_primer(tmp_path):
    from espnet_tpu.bin.s2t_inference import Speech2TextS2T
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.utils.config import dump_yaml
    from espnet_tpu.train.checkpoint import save_checkpoint
    # tiny model with lang/task symbols in vocab
    tokens = ["<blank>", "<unk>", "A", "B", "<space>", "<en>", "<asr>",
              "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens) + "\n")
    cfg = {
        "token_list": str(tmp_path / "tokens.txt"), "token_type": "char",
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 10,
                          "fs": 8000},
        "normalize": "utterance_mvn",
        "encoder": "transformer",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "input_layer": "conv2d2"},
        "decoder": "transformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.3},
    }
    model = ASRTask.build_model(cfg)
    ex = ASRTask.example_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), **ex)
    dump_yaml(cfg, tmp_path / "config.yaml")
    save_checkpoint(tmp_path / "model", params)
    s2t = Speech2TextS2T(asr_train_config=tmp_path / "config.yaml",
                         asr_model_file=tmp_path / "model",
                         lang_sym="<en>", task_sym="<asr>",
                         beam_size=2, ctc_weight=0.0, maxlenratio=0.3)
    audio = np.random.RandomState(0).randn(1500).astype(np.float32)
    res = s2t(audio)
    text, toks, ids, score = res[0][0]
    assert "<en>" not in toks and "<asr>" not in toks  # primer stripped
