"""End-to-end slice test: mini corpus -> train CTC model -> greedy decode
-> WER scoring (the reference's ci/test_integration_espnet2.sh analogue,
shrunk to unit-test scale)."""

import numpy as np
import pytest

from espnet_tpu.bin.asr_inference import Speech2Text, inference
from espnet_tpu.tasks.asr import ASRTask
from espnet_tpu.utils.metrics import error_rate, wer
from tests.mini_corpus import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(tmp_path_factory.mktemp("mini"))


def small_cfg(corpus, outdir, **over):
    cfg = {
        "output_dir": str(outdir),
        "token_list": str(corpus / "tokens.txt"),
        "token_type": "char",
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20,
                          "fs": 8000},
        "normalize": "utterance_mvn",
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 48, "num_blocks": 1,
                         "input_layer": "conv2d2"},
        "decoder": None,
        "model_conf": {"ctc_weight": 1.0},
        "optim": "adam",
        "optim_conf": {"lr": 0.05},
        "batch_type": "unsorted",
        "batch_size": 8,
        "max_epoch": 12,
        "keep_nbest_models": 2,
        "log_interval": 5,
        "train_data_path_and_name_and_type": [
            f"{corpus}/train/wav.scp,speech,sound",
            f"{corpus}/train/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{corpus}/valid/wav.scp,speech,sound",
            f"{corpus}/valid/text,text,text"],
    }
    cfg.update(over)
    return cfg


def test_train_and_greedy_decode(corpus, tmp_path):
    outdir = tmp_path / "exp"
    cfg, final_params = ASRTask.main(small_cfg(corpus, outdir))
    assert (outdir / "config.yaml").exists()
    assert (outdir / "checkpoint" / "params.pkl").exists()
    # averaged model written
    avgs = list(outdir.glob("valid.loss.ave_*best"))
    assert avgs, "n-best average missing"

    s2t = Speech2Text(asr_train_config=outdir / "config.yaml",
                      asr_model_file=avgs[0], beam_size=1)
    # decode the training utterances; tiny model should learn the tones
    from espnet_tpu.data.fileio import SoundScpReader, read_2columns_text
    reader = SoundScpReader(corpus / "train" / "wav.scp")
    texts = read_2columns_text(corpus / "train" / "text")
    refs, hyps = [], []
    for k in list(reader.keys())[:8]:
        _, audio = reader[k]
        result = s2t(audio)
        hyps.append(result[0][0][0])
        refs.append(texts[k])
    rate = error_rate([list(r) for r in refs], [list(h) for h in hyps])
    # loose bound: model must be far better than chance (CER < 0.6)
    assert rate["err_rate"] < 0.6, (refs, hyps)


def test_inference_writer(corpus, tmp_path):
    outdir = tmp_path / "exp2"
    cfg, _ = ASRTask.main(small_cfg(corpus, outdir, max_epoch=1))
    dec_dir = tmp_path / "decode"
    inference(output_dir=str(dec_dir),
              data_path_and_name_and_type=[
                  f"{corpus}/valid/wav.scp,speech,sound"],
              asr_train_config=outdir / "config.yaml",
              asr_model_file=outdir / "valid.loss.best",
              batch_size=4, beam_size=1)
    from espnet_tpu.data.fileio import read_2columns_text
    text = read_2columns_text(dec_dir / "1best_recog" / "text")
    assert len(text) == 4


def test_hybrid_train_and_beam_decode(corpus, tmp_path):
    outdir = tmp_path / "exp_hybrid"
    cfg, _ = ASRTask.main(small_cfg(
        corpus, outdir,
        decoder="transformer",
        decoder_conf={"attention_heads": 2, "linear_units": 48,
                      "num_blocks": 1},
        model_conf={"ctc_weight": 0.5, "lsm_weight": 0.1},
        max_epoch=12))
    avgs = list(outdir.glob("valid.loss.ave_*best"))
    s2t = Speech2Text(asr_train_config=outdir / "config.yaml",
                      asr_model_file=avgs[0], beam_size=3, ctc_weight=0.3,
                      maxlenratio=0.4)
    from espnet_tpu.data.fileio import SoundScpReader, read_2columns_text
    reader = SoundScpReader(corpus / "train" / "wav.scp")
    texts = read_2columns_text(corpus / "train" / "text")
    refs, hyps = [], []
    keys = list(reader.keys())[:6]
    audios = [reader[k][1] for k in keys]
    L = max(len(a) for a in audios)
    batch = np.zeros((len(keys), L), np.float32)
    lens = np.zeros((len(keys),), np.int32)
    for i, a in enumerate(audios):
        batch[i, :len(a)] = a
        lens[i] = len(a)
    results = s2t(batch, lens)
    for k, res in zip(keys, results):
        refs.append(texts[k])
        hyps.append(res[0][0])
    rate = error_rate([list(r) for r in refs], [list(h) for h in hyps])
    assert rate["err_rate"] < 0.7, (refs, hyps)


def test_resume(corpus, tmp_path):
    outdir = tmp_path / "exp3"
    ASRTask.main(small_cfg(corpus, outdir, max_epoch=2))
    # resume continues to epoch 3
    cfg, _ = ASRTask.main(small_cfg(corpus, outdir, max_epoch=3,
                                    resume=True))
    import json
    meta = json.loads((outdir / "checkpoint" / "meta.json").read_text())
    assert meta["epoch"] == 3
