"""espnet3-style orchestration (VERDICT r2 #10): multirun sweeps, task
registry, multi-host launch generator, GAN-TTS task spine."""

import json
from pathlib import Path

import numpy as np
import pytest


def test_parse_and_expand_sweep():
    from espnet_tpu.parallel.multirun import expand_sweep, parse_sweep
    sw = parse_sweep(["optim_conf.lr=0.1,0.01", "d_model=16,32"])
    assert sw == {"optim_conf.lr": [0.1, 0.01], "d_model": [16, 32]}
    runs = expand_sweep(sw)
    assert len(runs) == 4
    assert {"optim_conf.lr": 0.1, "d_model": 32} in runs
    zipped = expand_sweep(sw, mode="zip")
    assert len(zipped) == 2
    with pytest.raises(ValueError):
        expand_sweep({"a": [1, 2], "b": [1]}, mode="zip")


def test_task_registry_resolves_all():
    from espnet_tpu.tasks.registry import TASKS
    names = list(TASKS)
    assert len(names) >= 28
    for n in names:
        cls = TASKS[n]
        assert hasattr(cls, "main"), n
    with pytest.raises(KeyError):
        TASKS["nope"]


def test_multirun_sweeps_lm(tmp_path):
    """Two-run lr sweep over a tiny LM via the multirun driver: both
    exps train, summary.json collects per-run best metrics, sharding
    strides the run list."""
    from espnet_tpu.parallel.multirun import multirun
    from espnet_tpu.tasks.lm import LMTask
    rng = np.random.RandomState(0)
    lines = [f"u{i} " + " ".join(
        rng.choice(list("abc"), size=6)) for i in range(6)]
    (tmp_path / "text").write_text("\n".join(lines) + "\n")
    (tmp_path / "tokens.txt").write_text(
        "\n".join(["<blank>", "a", "b", "c", "<space>", "<sos/eos>"]) + "\n")
    base = {
        "token_list": str(tmp_path / "tokens.txt"),
        "lm_conf": {"att_unit": 16, "embed_unit": 16, "head": 2,
                    "unit": 32, "layer": 1},
        "batch_size": 3, "max_epoch": 1, "log_interval": 5,
        "train_data_path_and_name_and_type": [
            f"{tmp_path}/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{tmp_path}/text,text,text"],
    }
    res = multirun(LMTask, base, {"optim_conf.lr": [1e-3, 1e-4]},
                   tmp_path / "sweep")
    assert len(res) == 2
    assert (tmp_path / "sweep" / "summary.json").exists()
    for r in res:
        assert Path(r["output_dir"], "config.yaml").exists()
        assert "loss" in r["metrics"], r  # reporter.json round trip
    # shard 1/2 runs only the second config
    res_s = multirun(LMTask, base, {"optim_conf.lr": [1e-3, 1e-4]},
                     tmp_path / "sweep2", shard=1, num_shards=2)
    assert len(res_s) == 1 and "0.0001" in res_s[0]["name"]


def test_launch_generator_scripts(tmp_path):
    """bin/launch.py (reference launch.py:91 role): per-host ssh scripts
    carry the jax.distributed rendezvous args; slurm mode emits one
    sbatch with SLURM_PROCID wiring."""
    from espnet_tpu.bin.launch import main
    scripts = main(["--cmd", "python -m espnet_tpu.bin.asr_train "
                    "--config c.yaml",
                    "--host", "nodeA,nodeB", "--port", "12399",
                    "--log_dir", str(tmp_path / "launch"), "--dry_run"])
    assert len(scripts) == 2
    s0 = Path(scripts[0]).read_text()
    s1 = Path(scripts[1]).read_text()
    assert "coordinator_address=nodeA:12399" in s0
    assert "num_processes=2" in s0 and "process_id=0" in s0
    assert "process_id=1" in s1
    sb = main(["--cmd", "python -m espnet_tpu.bin.asr_train",
               "--slurm", "--num_nodes", "4",
               "--log_dir", str(tmp_path / "sl"), "--dry_run"])
    txt = Path(sb).read_text()
    assert "#SBATCH --nodes=4" in txt
    assert "process_id=$SLURM_PROCID" in txt
    assert "MASTER_ADDR" in txt


def test_launch_conf_reaches_init(tmp_path, monkeypatch):
    """A task main with launch_conf calls init_distributed with the
    generated rendezvous args (single-process passthrough here)."""
    import espnet_tpu.parallel.launch as launch_mod
    calls = {}
    orig = launch_mod.init_distributed

    def spy(**kw):
        calls.update(kw)
        return orig()  # no-op single host

    monkeypatch.setattr(launch_mod, "init_distributed", spy)
    from espnet_tpu.tasks.lm import LMTask
    (tmp_path / "text").write_text("u0 a b\nu1 b a\n")
    (tmp_path / "tokens.txt").write_text(
        "\n".join(["<blank>", "a", "b", "<space>", "<sos/eos>"]) + "\n")
    LMTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(tmp_path / "tokens.txt"),
        "lm_conf": {"att_unit": 16, "embed_unit": 16, "head": 2,
                    "unit": 32, "layer": 1},
        "launch_conf": {"coordinator_address": "h:1", "num_processes": 1,
                        "process_id": 0},
        "batch_size": 2, "max_epoch": 1, "log_interval": 5,
        "train_data_path_and_name_and_type": [f"{tmp_path}/text,text,text"],
        "valid_data_path_and_name_and_type": [f"{tmp_path}/text,text,text"],
    })
    assert calls.get("num_processes") == 1


def test_gan_tts_task_vits_e2e(tmp_path):
    """GANTTSTask (espnet2/tasks/gan_tts.py role): text+wav pairs train
    VITS adversarially through the GANTrainer spine; resume-capable
    checkpoint + config round trip."""
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.tasks.gan_tts import GANTTSTask
    rng = np.random.RandomState(0)
    (tmp_path / "wavs").mkdir()
    wl, tl = [], []
    for i in range(4):
        w = (rng.randn(3000) * 0.1).astype(np.float32)
        write_wav(tmp_path / "wavs" / f"u{i}.wav", 8000, w)
        wl.append(f"u{i} {tmp_path}/wavs/u{i}.wav")
        tl.append(f"u{i} ab ba")
    (tmp_path / "wav.scp").write_text("\n".join(wl) + "\n")
    (tmp_path / "text").write_text("\n".join(tl) + "\n")
    (tmp_path / "tokens.txt").write_text(
        "\n".join(["<blank>", "a", "b", "<space>", "<sos/eos>"]) + "\n")
    cfg, params = GANTTSTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(tmp_path / "tokens.txt"),
        "fs": 8000, "n_fft": 64, "hop_length": 32, "n_mels": 12,
        "tts_conf": {"z_channels": 8, "hidden": 16, "spec_channels": 33,
                     "segment_frames": 8, "hop_length": 32,
                     "text_encoder_conf": {"output_size": 16,
                                           "attention_heads": 2,
                                           "linear_units": 24,
                                           "num_blocks": 1,
                                           "input_layer": "embed"},
                     "generator_conf": {"channels": 16,
                                        "upsample_scales": (4, 8),
                                        "upsample_kernel_sizes": (8, 16),
                                        "resblock_kernel_sizes": (3,),
                                        "resblock_dilations": ((1, 3),)}},
        "discriminator_conf": {"periods": (2,), "scales": 1},
        "batch_size": 2, "max_epoch": 1, "log_interval": 2,
        "batch_type": "unsorted",
        "collate_fixed_lengths": {"text": 8, "speech": 3008,
                                  "spec": 92},
        "train_data_path_and_name_and_type": [
            f"{tmp_path}/text,text,text",
            f"{tmp_path}/wav.scp,speech,sound"],
        "valid_data_path_and_name_and_type": [
            f"{tmp_path}/text,text,text",
            f"{tmp_path}/wav.scp,speech,sound"],
    })
    assert set(params) == {"generator", "discriminator"}
    assert (tmp_path / "exp" / "config.yaml").exists()

    # Text2Speech routes GAN-TTS configs to the direct text->waveform
    # decode (espnet2 tts_inference.py:196 vocoder-less path)
    from espnet_tpu.bin.tts_inference import Text2Speech
    t2s = Text2Speech(train_config=tmp_path / "exp" / "config.yaml",
                      model_file=next((tmp_path / "exp").glob("*best")))
    assert t2s.is_e2e
    out = t2s("ab", out_len=16)
    assert out["wav"].ndim == 1 and len(out["wav"]) > 0
    assert np.isfinite(out["wav"]).all()
