"""LM generation CLI test."""

from espnet_tpu.bin.lm_inference import TextGenerate
from espnet_tpu.tasks.lm import LMTask


def test_text_generate(tmp_path):
    (tmp_path / "train_text").write_text(
        "".join(f"u{i} ABAB\n" for i in range(8)))
    (tmp_path / "tokens.txt").write_text(
        "<blank>\n<unk>\nA\nB\n<space>\n<sos/eos>\n")
    LMTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(tmp_path / "tokens.txt"),
        "lm_conf": {"embed_unit": 16, "att_unit": 16, "head": 2, "unit": 32,
                    "layer": 1, "dropout_rate": 0.0},
        "optim_conf": {"lr": 0.05}, "batch_type": "unsorted",
        "batch_size": 8, "max_epoch": 5, "log_interval": 50,
        "train_data_path_and_name_and_type": [
            f"{tmp_path}/train_text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{tmp_path}/train_text,text,text"]})
    gen = TextGenerate(train_config=tmp_path / "exp" / "config.yaml",
                       model_file=tmp_path / "exp" / "valid.loss.best",
                       maxlen=8)
    out = gen()
    assert isinstance(out, str)
    assert set(out) <= set("AB ")
    # sampling mode runs
    gen_s = TextGenerate(train_config=tmp_path / "exp" / "config.yaml",
                         model_file=tmp_path / "exp" / "valid.loss.best",
                         maxlen=8, sampling=True)
    assert isinstance(gen_s(), str)
