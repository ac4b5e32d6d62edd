"""UASR GAN, Hubert/Codec tasks, thin task variants."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.uasr import UASRModel
from espnet_tpu.tasks.misc import ASVSpoofTask, S2TTask, SLUTask, SVSTask
from espnet_tpu.tasks.ssl import CodecTask, HubertTask
from espnet_tpu.train.gan_trainer import make_gan_train_step
from espnet_tpu.train.optim import build_optimizer


def test_uasr_gan_step():
    model = UASRModel(n_phones=6,
                      generator_conf={"channels": 16},
                      discriminator_conf={"channels": 16, "layers": 1})
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 20, 8), jnp.float32)
    real = jax.nn.one_hot(jnp.asarray(rng.randint(0, 6, (2, 10))), 6)
    params = model.init(jax.random.PRNGKey(0), feats, real)
    tx_g = build_optimizer("adam", lr=1e-4)
    tx_d = build_optimizer("adam", lr=1e-4)
    step = jax.jit(make_gan_train_step(model.apply, tx_g, tx_d))
    p2, _, stats, _ = step(params, (tx_g.init(params["generator"]),
                                    tx_d.init(params["discriminator"])),
                           {"feats": feats, "real_phones": real},
                           jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["generator_loss"]))
    assert np.isfinite(float(stats["discriminator_loss"]))
    pred = model.predict(p2, feats)
    assert pred.shape == (2, 10)


def test_hubert_task_builds():
    cfg = HubertTask.default_config()
    cfg.update(num_classes=8,
               frontend_conf={"n_fft": 128, "hop_length": 64, "n_mels": 12},
               encoder_conf={"output_size": 16, "attention_heads": 2,
                             "linear_units": 32, "num_blocks": 1,
                             "input_layer": "linear"})
    model = HubertTask.build_model(cfg)
    ex = HubertTask.example_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), **ex)
    loss, stats, _ = model.apply(params, **ex)
    assert np.isfinite(float(loss))


def test_wav2vec2_contrastive_trains():
    """wav2vec2 SSL (fairseq wav2vec2 contract via the hubert task's
    model switch): conv extractor + gumbel quantizer + InfoNCE; a few
    grad steps reduce the contrastive loss on a fixed batch and the
    codebook perplexity stat stays in (1, V*G)."""
    import optax
    cfg = HubertTask.default_config()
    cfg.update(model="wav2vec2",
               frontend_conf={"layers": ((8, 10, 5), (8, 3, 2))},
               encoder_conf={"output_size": 16, "attention_heads": 2,
                             "linear_units": 32, "num_blocks": 1,
                             "input_layer": "linear"},
               quantizer_conf={"groups": 2, "entries": 6},
               model_conf={"mask_prob": 0.2, "mask_length": 3,
                           "num_negatives": 4})
    model = HubertTask.build_model(cfg)
    ex = HubertTask.example_batch(cfg)
    assert "text" not in ex
    rng = np.random.RandomState(0)
    ex["speech"] = rng.randn(2, 4096).astype(np.float32) * 0.1
    ex["speech_lengths"] = np.asarray([4096, 3000], np.int32)
    params = model.init(jax.random.PRNGKey(0), **ex)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, k):
        def lf(p):
            loss, stats, _ = model.apply(
                p, **ex, deterministic=False,
                rngs={"mask": k, "dropout": jax.random.fold_in(k, 1)})
            return loss, stats
        (loss, stats), g = jax.value_and_grad(lf, has_aux=True)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss, stats

    losses = []
    for i in range(8):
        params, opt, loss, stats = step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(stats["loss_contrastive"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    perp = float(stats["codebook_perplexity"])
    assert 1.0 < perp <= 6.0
    # downstream feature path: encode without masking
    enc, olens = model.apply(params, ex["speech"], ex["speech_lengths"],
                             method=model.encode)
    assert enc.shape[0] == 2 and np.isfinite(np.asarray(enc)).all()


def test_codec_task_builds():
    cfg = CodecTask.default_config()
    cfg["codec_conf"] = {"channels": 8, "strides": (2, 4), "code_dim": 16,
                         "num_quantizers": 2, "codebook_size": 8}
    model = CodecTask.build_model(cfg)
    ex = CodecTask.example_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), **ex)
    loss, _, _ = model.apply(params, **ex)
    assert np.isfinite(float(loss))


def test_thin_task_names():
    assert SLUTask.name == "slu" and S2TTask.name == "s2t"
    assert ASVSpoofTask.task_defaults()["n_classes"] == 2
    assert SVSTask.name == "svs"


def test_load_pretrained_src_dst_exclude(tmp_path):
    """--init_param path:src:dst:excl partial init
    (torch_utils/load_pretrained_model.py semantics)."""
    import numpy as np
    from espnet_tpu.tasks.abs_task import AbsTask
    from espnet_tpu.train.checkpoint import save_checkpoint

    src_tree = {"params": {"enc": {"w": np.full((3,), 7.0),
                                   "b": np.full((2,), 8.0)},
                           "dec": {"w": np.full((3,), 9.0)}}}
    save_checkpoint(tmp_path / "pre", src_tree)
    params = {"params": {"enc2": {"w": np.zeros((3,)), "b": np.zeros((2,))},
                         "dec": {"w": np.zeros((3,))}}}
    # copy enc -> enc2, excluding the bias
    out = AbsTask.load_pretrained(
        params, [f"{tmp_path / 'pre'}:params/enc:params/enc2:params/enc2/b"])
    assert out["params"]["enc2"]["w"].tolist() == [7.0] * 3
    assert out["params"]["enc2"]["b"].tolist() == [0.0] * 2
    assert out["params"]["dec"]["w"].tolist() == [0.0] * 3
    # whole-tree name matching merge
    out2 = AbsTask.load_pretrained(params, [str(tmp_path / "pre")])
    assert out2["params"]["dec"]["w"].tolist() == [9.0] * 3
    import pytest
    with pytest.raises(ValueError, match="matched nothing"):
        AbsTask.load_pretrained(params, [f"{tmp_path / 'pre'}:nope"])


def test_uasr_task_e2e(tmp_path):
    """UASRTask.main: GAN training over npy feats + unpaired phone text,
    then Speech2Phones inference (tasks/uasr.py contract)."""
    from espnet_tpu.bin.uasr_inference import Speech2Phones
    from espnet_tpu.tasks.uasr import UASRTask
    rng = np.random.RandomState(0)
    featdir = tmp_path / "feats"
    featdir.mkdir()
    lines = []
    for i in range(6):
        arr = rng.randn(30, 8).astype(np.float32)
        np.save(featdir / f"u{i}.npy", arr)
        lines.append(f"u{i} {featdir}/u{i}.npy")
    (tmp_path / "feats.scp").write_text("\n".join(lines) + "\n")
    (tmp_path / "phones.txt").write_text("a\nb\nc\n")
    (tmp_path / "text").write_text(
        "\n".join(f"t{i} a b c a b" for i in range(4)) + "\n")
    cfg, params = UASRTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(tmp_path / "phones.txt"),
        "feat_dim": 8, "segment_frames": 16, "phone_frames": 8,
        "generator_conf": {"channels": 8},
        "discriminator_conf": {"channels": 8, "layers": 1},
        "text_file": str(tmp_path / "text"),
        "batch_size": 2, "max_epoch": 2,
        "train_data_path_and_name_and_type": [
            f"{tmp_path}/feats.scp,feats,npy"],
    })
    s2p = Speech2Phones(train_config=tmp_path / "exp" / "config.yaml")
    phones, ids = s2p(rng.randn(20, 8).astype(np.float32))
    assert all(p in ("a", "b", "c") for p in phones)


def test_s2st_task_builds_both_types():
    from espnet_tpu.tasks.s2st import S2STTask
    cfg = dict(S2STTask.default_config())
    cfg.update(unit_vocab_size=16, encoder="transformer",
               frontend_conf={"n_fft": 128, "hop_length": 64, "n_mels": 20},
               encoder_conf={"output_size": 16, "attention_heads": 2,
                             "linear_units": 32, "num_blocks": 1},
               decoder_conf={"attention_heads": 2, "linear_units": 32,
                             "num_blocks": 1})
    m = S2STTask.build_model(cfg)
    ex = S2STTask.example_batch(cfg)
    p = m.init(jax.random.PRNGKey(0), **ex)
    assert np.isfinite(float(m.apply(p, **ex)[0]))
    cfg2 = dict(cfg, s2st_type="translatotron",
                synthesizer_conf={"prenet_units": 8, "dlayers_units": 16,
                                  "att_dim": 8, "postnet_layers": 1,
                                  "postnet_chans": 8},
                model_conf={"src_vocab_size": 0, "tgt_vocab_size": 0})
    m2 = S2STTask.build_model(cfg2)
    ex2 = S2STTask.example_batch(cfg2)
    p2 = m2.init(jax.random.PRNGKey(0), **ex2)
    assert np.isfinite(float(m2.apply(p2, **ex2)[0]))


def test_speechlm_task_e2e(tmp_path):
    """SpeechLMTask.main over npy code sequences (speechlm spine)."""
    from espnet_tpu.tasks.s2st import SpeechLMTask
    rng = np.random.RandomState(0)
    d = tmp_path / "codes"
    d.mkdir()
    lines = []
    for i in range(6):
        arr = rng.randint(0, 8, (12, 2)).astype(np.int32)
        np.save(d / f"u{i}.npy", arr)
        lines.append(f"u{i} {d}/u{i}.npy")
    (tmp_path / "codes.scp").write_text("\n".join(lines) + "\n")
    cfg, params = SpeechLMTask.main({
        "output_dir": str(tmp_path / "exp"),
        "vocab_sizes": [8, 8], "d_model": 16, "heads": 2, "units": 32,
        "layers": 1, "batch_size": 3, "max_epoch": 2, "log_interval": 5,
        "train_data_path_and_name_and_type": [
            f"{tmp_path}/codes.scp,tokens,npy"],
        "valid_data_path_and_name_and_type": [
            f"{tmp_path}/codes.scp,tokens,npy"],
    })
    assert (tmp_path / "exp" / "config.yaml").exists()
