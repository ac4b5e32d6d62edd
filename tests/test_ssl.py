

def test_hubert_two_stage_pretrain_loop(tmp_path):
    """The HuBERT iterative recipe (VERDICT r2 #9; egs2 hubert1
    contract): iteration 0 trains on MFCC k-means labels, iteration 1
    re-clusters an intermediate layer of the trained model and
    re-trains. Both exps train; re-clustered labels differ from MFCC
    labels (the re-labeling actually happened)."""
    import numpy as np

    from espnet_tpu.bin.hubert_pretrain_loop import hubert_pretrain_loop
    from espnet_tpu.data.fileio import write_wav
    rng = np.random.RandomState(0)
    (tmp_path / "wavs").mkdir()
    lines = []
    for i in range(4):
        # two tone classes so clustering has structure
        f0 = 300.0 if i % 2 == 0 else 2000.0
        t = np.arange(4000) / 16000.0
        w = (0.3 * np.sin(2 * np.pi * f0 * t)
             + 0.02 * rng.randn(4000)).astype(np.float32)
        write_wav(tmp_path / "wavs" / f"u{i}.wav", 16000, w)
        lines.append(f"u{i} {tmp_path}/wavs/u{i}.wav")
    (tmp_path / "wav.scp").write_text("\n".join(lines) + "\n")
    exp = hubert_pretrain_loop(
        tmp_path / "loop", tmp_path / "wav.scp",
        n_iterations=2, n_clusters=4, feature_layer=1,
        kmeans_iters=5,
        train_conf={"encoder_conf": {"output_size": 16, "num_blocks": 2,
                                     "attention_heads": 2,
                                     "linear_units": 32},
                    "batch_size": 2, "max_epoch": 1, "log_interval": 2,
                    "collate_fixed_lengths": {"speech": 4000,
                                              "text": 16}})
    assert (tmp_path / "loop" / "iter0" / "config.yaml").exists()
    assert (tmp_path / "loop" / "iter1" / "config.yaml").exists()
    l0 = (tmp_path / "loop" / "labels_train_iter0").read_text()
    l1 = (tmp_path / "loop" / "labels_train_iter1").read_text()
    assert l0.split()[0] == "u0" and l1.split()[0] == "u0"
    assert l0 != l1          # re-clustering produced new pseudo-labels
    assert (tmp_path / "loop" / "km_centers_iter1.npy").exists()
