"""Smoke tests for diar/spk/cls inference APIs."""

import jax
import numpy as np

from espnet_tpu.bin.cls_inference import ClassifySpeech
from espnet_tpu.bin.diar_inference import DiarizeSpeech
from espnet_tpu.bin.spk_inference import SpeakerEmbedding
from espnet_tpu.tasks.spk import (ClassificationTask, DiarizationTask,
                                  SpeakerTask)
from espnet_tpu.train.checkpoint import save_checkpoint
from espnet_tpu.utils.config import dump_yaml


def _save(task, cfg, tmp_path):
    model = task.build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), **task.example_batch(cfg))
    dump_yaml(cfg, tmp_path / "config.yaml")
    save_checkpoint(tmp_path / "model", params)
    return tmp_path / "config.yaml", tmp_path / "model"


def test_diarize_speech(tmp_path):
    cfg = dict(DiarizationTask.default_config(),
               frontend_conf={"n_fft": 128, "hop_length": 64, "n_mels": 10},
               encoder_conf={"output_size": 16, "attention_heads": 2,
                             "linear_units": 24, "num_blocks": 1,
                             "input_layer": "linear"})
    c, m = _save(DiarizationTask, cfg, tmp_path)
    d = DiarizeSpeech(train_config=c, model_file=m)
    act = d(np.random.RandomState(0).randn(2000).astype(np.float32))
    assert act[0].ndim == 2 and act[0].shape[1] == 2
    assert set(np.unique(act[0])) <= {0, 1}


def test_speaker_embedding(tmp_path):
    cfg = dict(SpeakerTask.default_config(),
               frontend_conf={"n_fft": 128, "hop_length": 64, "n_mels": 10},
               encoder_conf={"channels": 16, "num_blocks": 1}, embed_dim=8)
    c, m = _save(SpeakerTask, cfg, tmp_path)
    se = SpeakerEmbedding(train_config=c, model_file=m)
    a = np.random.RandomState(0).randn(2000).astype(np.float32)
    emb = se(a)
    assert emb.shape == (1, 8)
    s = se.score(a, a)
    assert abs(s - 1.0) < 1e-4  # same utterance -> cosine 1


def test_classify_speech(tmp_path):
    cfg = dict(ClassificationTask.default_config(), n_classes=3,
               frontend_conf={"n_fft": 128, "hop_length": 64, "n_mels": 10},
               encoder_conf={"output_size": 16, "attention_heads": 2,
                             "linear_units": 24, "num_blocks": 1,
                             "input_layer": "linear"})
    c, m = _save(ClassificationTask, cfg, tmp_path)
    cl = ClassifySpeech(train_config=c, model_file=m)
    pred, probs = cl(np.random.RandomState(0).randn(2000).astype(np.float32))
    assert probs.shape == (1, 3)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)
