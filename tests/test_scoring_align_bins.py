"""enh_scoring + asr_align CLI tests."""

import jax
import numpy as np

from espnet_tpu.bin.enh_scoring import score_pairs, sdr


def test_enh_scoring_permutation_aware(tmp_path):
    from espnet_tpu.data.fileio import write_wav
    rng = np.random.RandomState(0)
    s1 = rng.randn(2000).astype(np.float32) * 0.3
    s2 = rng.randn(2000).astype(np.float32) * 0.3
    for name, arr in (("r1", s1), ("r2", s2), ("e1", s2), ("e2", s1)):
        write_wav(tmp_path / f"{name}.wav", 8000, arr)
    for name in ("r1", "r2", "e1", "e2"):
        (tmp_path / f"{name}.scp").write_text(
            f"u0 {tmp_path / f'{name}.wav'}\n")
    # enhanced outputs are the references SWAPPED -> permutation search
    # must find the right pairing and near-perfect scores
    means = score_pairs([str(tmp_path / "r1.scp"), str(tmp_path / "r2.scp")],
                        [str(tmp_path / "e1.scp"), str(tmp_path / "e2.scp")],
                        output_dir=tmp_path / "score")
    assert means["si_snr"] > 30
    assert (tmp_path / "score" / "RESULTS").exists()
    assert sdr(s1, s1) > 60


def test_ctc_segmentation_api(tmp_path):
    """CTCSegmentation produces ordered, in-range boundaries."""
    from espnet_tpu.bin.asr_align import CTCSegmentation
    from espnet_tpu.tasks.asr import ASRTask
    from espnet_tpu.train.checkpoint import save_checkpoint
    from espnet_tpu.utils.config import dump_yaml
    (tmp_path / "tokens.txt").write_text(
        "<blank>\n<unk>\nA\nB\n<space>\n<sos/eos>\n")
    cfg = {
        "token_list": str(tmp_path / "tokens.txt"), "token_type": "char",
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 10,
                          "fs": 8000},
        "normalize": "utterance_mvn",
        "encoder": "transformer",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "input_layer": "conv2d2"},
        "decoder": None, "model_conf": {"ctc_weight": 1.0},
    }
    model = ASRTask.build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), **ASRTask.example_batch(cfg))
    dump_yaml(cfg, tmp_path / "config.yaml")
    save_checkpoint(tmp_path / "model", params)
    seg = CTCSegmentation(asr_train_config=tmp_path / "config.yaml",
                          asr_model_file=tmp_path / "model")
    audio = np.random.RandomState(0).randn(4000).astype(np.float32)
    out = seg(audio, "AB A")
    assert [t for t, _, _ in out] == ["A", "B", "<space>", "A"]
    dur = len(audio) / 8000
    prev_end = 0.0
    for _, s, e in out:
        assert 0 <= s <= e <= dur + 0.1
        assert s >= prev_end - 1e-6
        prev_end = e
