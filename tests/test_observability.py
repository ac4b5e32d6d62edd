"""Observability: tensorboard writer, attention heatmaps, time split,
RTF calculator (VERDICT r1 missing #9 / next-step #10)."""

import json
import struct

import numpy as np
import pytest


def _read_records(path):
    """Parse TFRecord framing back, verifying CRCs."""
    from espnet_tpu.utils.tb_writer import _masked_crc
    data = path.read_bytes()
    off = 0
    out = []
    while off < len(data):
        (n,) = struct.unpack_from("<Q", data, off)
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        assert hcrc == _masked_crc(data[off:off + 8])
        rec = data[off + 12:off + 12 + n]
        (dcrc,) = struct.unpack_from("<I", data, off + 12 + n)
        assert dcrc == _masked_crc(rec)
        out.append(rec)
        off += 12 + n + 4
    return out


def test_crc32c_known_vectors():
    from espnet_tpu.utils.tb_writer import crc32c
    # RFC 3720 test vectors
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E


def test_tb_writer_roundtrip(tmp_path):
    from espnet_tpu.utils.tb_writer import SummaryWriter
    w = SummaryWriter(tmp_path / "tb")
    w.add_scalar("train_loss", 1.5, 10)
    w.add_scalar("valid_loss", 0.25, 20)
    w.close()
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(files) == 1
    recs = _read_records(files[0])
    assert len(recs) == 3  # file_version + 2 scalars
    assert b"brain.Event:2" in recs[0]
    assert b"train_loss" in recs[1]
    # simple_value 1.5 as little-endian f32 must appear in the payload
    assert struct.pack("<f", 1.5) in recs[1]
    assert b"valid_loss" in recs[2]


def test_calculate_all_attentions(tmp_path):
    """Attention capture via sow + heatmap PNGs."""
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.train.attention_plot import (calculate_all_attentions,
                                                 plot_attentions)
    tokens = ["<blank>"] + list("ab") + ["<space>", "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens) + "\n")
    cfg = {
        "token_list": str(tmp_path / "tokens.txt"),
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20,
                          "fs": 8000},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 32, "num_blocks": 1},
        "decoder": "transformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1},
    }
    model = ASRTask.build_model(cfg)
    import jax
    batch = {"speech": np.random.RandomState(0).randn(2, 1600)
             .astype(np.float32),
             "speech_lengths": np.asarray([1600, 1200], np.int32),
             "text": np.asarray([[1, 2], [2, 1]], np.int32),
             "text_lengths": np.asarray([2, 2], np.int32)}
    params = model.init(jax.random.PRNGKey(0), **batch)
    maps = calculate_all_attentions(model, params, batch,
                                    deterministic=True)
    assert maps, "no attention maps captured"
    for name, att in maps.items():
        assert att.ndim == 4 and att.shape[0] == 2 and att.shape[1] == 2
        # softmax rows sum to 1 over attended positions
        s = att.sum(-1)
        assert np.all(s < 1.0 + 1e-3)
    pngs = plot_attentions(maps, tmp_path / "att_ws", epoch=1,
                           uids=["u1", "u2"], max_utts=1)
    assert pngs and all(p.exists() for p in pngs)


def test_trainer_observability_e2e(tmp_path):
    """ASRTask.main with tensorboard + att plots + breakdown enabled."""
    from tests.mini_corpus import make_corpus
    from espnet_tpu.tasks.asr import ASRTask
    corpus = make_corpus(tmp_path / "mini", n_train=4, n_valid=2)
    ASRTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(corpus / "tokens.txt"),
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20,
                          "fs": 8000},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 32, "num_blocks": 1},
        "decoder": "transformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.5},
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 1,
        "log_interval": 1, "num_att_plot": 1, "profile_breakdown": True,
        "train_data_path_and_name_and_type": [
            f"{corpus}/train/wav.scp,speech,sound",
            f"{corpus}/train/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{corpus}/valid/wav.scp,speech,sound",
            f"{corpus}/valid/text,text,text"],
    })
    exp = tmp_path / "exp"
    assert list((exp / "tensorboard").glob("events.out.tfevents.*"))
    assert list((exp / "att_ws").rglob("*.png"))
    # fwd/bwd/optim split registered in epoch 1 train stats
    import json as _json
    # reporter state is inside the rolling checkpoint meta
    from espnet_tpu.train.checkpoint import load_checkpoint
    _, _, meta = load_checkpoint(exp / "checkpoint", with_opt=False)
    stats = meta["reporter"]["stats"]["1"]["train"]
    for k in ("forward_time", "backward_time", "optim_time", "iter_time",
              "train_time"):
        assert k in stats, (k, sorted(stats))


def test_calculate_rtf(tmp_path):
    from espnet_tpu.bin.calculate_rtf import calculate_rtf
    d = tmp_path / "dec"
    d.mkdir()
    recs = [{"n_utts": 8, "audio_secs": 80.0, "decode_secs": 100.0},
            {"n_utts": 8, "audio_secs": 80.0, "decode_secs": 4.0},
            {"n_utts": 4, "audio_secs": 40.0, "decode_secs": 2.0}]
    (d / "decode_stats.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n")
    out = calculate_rtf([d])  # first (compile) batch excluded
    assert out["n_utts"] == 12
    assert out["audio_secs"] == 120.0
    assert out["rtf"] == pytest.approx(6.0 / 120.0)
    out2 = calculate_rtf([d], exclude_first=False)
    assert out2["n_utts"] == 20
