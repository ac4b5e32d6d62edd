"""ProDiff diffusion TTS (VERDICT r2 missing #8; espnet2/tts/prodiff)."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.prodiff import (ProDiff, SpectrogramDenoiser,
                                           noise_schedule)


def small_conf():
    return dict(odim=12, adim=16, aheads=2, elayers=1, eunits=24,
                denoiser_layers=2, denoiser_channels=8,
                diffusion_steps=4, dropout_rate=0.0)


def batch():
    rng = np.random.RandomState(0)
    return (jnp.asarray([[1, 2, 3, 0], [2, 1, 0, 0]], jnp.int32),
            jnp.asarray([3, 2], jnp.int32),
            jnp.asarray(rng.randn(2, 12, 12), jnp.float32),
            jnp.asarray([12, 9], jnp.int32),
            jnp.asarray([[4, 4, 4, 0], [5, 4, 0, 0]], jnp.int32),
            jnp.asarray(rng.randn(2, 4), jnp.float32),
            jnp.asarray(rng.randn(2, 4), jnp.float32))


def test_noise_schedules_valid():
    for sched in ("vpsde", "cosine"):
        b = noise_schedule(4, sched)
        assert b.shape == (4,)
        assert (b > 0).all() and (b < 1).all()
        ac = np.cumprod(1 - b)
        assert (np.diff(ac) < 0).all()  # strictly noisier


def test_prodiff_forward_grad_and_inference():
    text, tl, feats, fl, dur, pit, ene = batch()
    model = ProDiff(idim=6, **small_conf())
    rngs3 = {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs3, text, tl, feats, fl, dur, pit, ene,
                        deterministic=False)
    run_rngs = {"diffusion": jax.random.PRNGKey(2),
                "dropout": jax.random.PRNGKey(3)}
    loss, stats, w = model.apply(
        params, text, tl, feats, fl, dur, pit, ene, deterministic=False,
        rngs=run_rngs)
    assert np.isfinite(float(loss)) and "diff_l1_loss" in stats
    g = jax.grad(lambda p: model.apply(
        p, text, tl, feats, fl, dur, pit, ene, deterministic=False,
        rngs=run_rngs)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    mel, olens = model.apply(params, text, tl, out_len=16,
                             method=model.inference)
    assert mel.shape == (2, 16, 12)
    assert np.isfinite(np.asarray(mel)).all()


def test_denoiser_learns_x0():
    """80 Adam steps on a fixed batch: the x0-prediction L1 must drop
    substantially — the diffusion decoder actually denoises."""
    import optax
    text, tl, feats, fl, dur, pit, ene = batch()
    model = ProDiff(idim=6, **small_conf())
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(9)},
        text, tl, feats, fl, dur, pit, ene, deterministic=False)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, key):
        def loss_fn(p):
            loss, stats, _ = model.apply(
                p, text, tl, feats, fl, dur, pit, ene,
                deterministic=False,
                rngs={"diffusion": key, "dropout": key})
            return loss, stats
        (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, stats

    first = None
    for i in range(80):
        params, opt, stats = step(params, opt, jax.random.PRNGKey(i))
        if first is None:
            first = float(stats["diff_l1_loss"])
    last = float(stats["diff_l1_loss"])
    assert last < first * 0.9, (first, last)


def test_prodiff_through_tts_task(tmp_path):
    """TTSTask with tts=prodiff trains end-to-end and Text2Speech-style
    inference produces mel through the model wrapper."""
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.tasks.tts import TTSTask
    rng = np.random.RandomState(0)
    (tmp_path / "wavs").mkdir()
    wl, txt = [], []
    for i in range(3):
        w = (rng.randn(4000) * 0.1).astype(np.float32)
        write_wav(tmp_path / "wavs" / f"u{i}.wav", 16000, w)
        wl.append(f"u{i} {tmp_path}/wavs/u{i}.wav")
        txt.append(f"u{i} ab ba")
    (tmp_path / "wav.scp").write_text("\n".join(wl) + "\n")
    (tmp_path / "text").write_text("\n".join(txt) + "\n")
    (tmp_path / "tokens.txt").write_text(
        "\n".join(["<blank>", "a", "b", "<space>", "<sos/eos>"]) + "\n")
    cfg, params = TTSTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(tmp_path / "tokens.txt"),
        "feats_extract_conf": {"fs": 16000, "n_fft": 256,
                               "hop_length": 128, "n_mels": 12},
        "tts": "prodiff",
        "tts_conf": {"adim": 16, "aheads": 2, "elayers": 1, "eunits": 24,
                     "denoiser_layers": 2, "denoiser_channels": 8,
                     "diffusion_steps": 2},
        "batch_size": 2, "max_epoch": 1, "log_interval": 2,
        "collate_fixed_lengths": {"speech": 4000, "text": 8},
        "train_data_path_and_name_and_type": [
            f"{tmp_path}/wav.scp,speech,sound",
            f"{tmp_path}/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{tmp_path}/wav.scp,speech,sound",
            f"{tmp_path}/text,text,text"],
    })
    model = TTSTask.build_model(cfg)
    mel, olens = model.apply(params, jnp.asarray([[1, 2, 1]], jnp.int32),
                             jnp.asarray([3], jnp.int32), out_len=32,
                             method=model.inference)
    assert mel.shape == (1, 32, 12)
    assert np.isfinite(np.asarray(mel)).all()
