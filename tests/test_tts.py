"""TTS tests: FastSpeech2, length regulator, HiFiGAN, GAN step,
Text2Speech e2e with griffin-lim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.tts.fastspeech2 import FastSpeech2, length_regulator
from espnet_tpu.models.tts.gan_vocoder import HiFiGANVocoderGAN
from espnet_tpu.models.tts.hifigan import HiFiGANGenerator
from espnet_tpu.train.gan_trainer import make_gan_train_step
from espnet_tpu.train.optim import build_optimizer


def test_length_regulator():
    hs = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 3, 2))
    dur = jnp.asarray([[2, 0, 3]])
    out, total = length_regulator(hs, dur, 8)
    assert int(total[0]) == 5
    expect = [[0, 1], [0, 1], [4, 5], [4, 5], [4, 5], [0, 0], [0, 0], [0, 0]]
    np.testing.assert_allclose(np.asarray(out[0]), expect)


def fs2_tiny():
    return FastSpeech2(idim=10, odim=8, adim=16, aheads=2, elayers=1,
                       eunits=24, dlayers=1, dunits=24, use_postnet=False,
                       duration_predictor_chans=16, dropout_rate=0.0,
                       max_frames=64)


def test_fastspeech2_forward_and_inference():
    model = fs2_tiny()
    text = jnp.asarray([[1, 2, 3, 0]]); tl = jnp.asarray([3])
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 12, 8), jnp.float32)
    fl = jnp.asarray([10])
    dur = jnp.asarray([[3, 4, 3, 0]])
    pitch = jnp.asarray([[0.1, -0.2, 0.3, 0.0]])
    energy = jnp.asarray([[1.0, 0.5, 0.2, 0.0]])
    params = model.init(jax.random.PRNGKey(0), text, tl, feats, fl, dur,
                        pitch, energy)
    loss, stats, w = model.apply(params, text, tl, feats, fl, dur, pitch,
                                 energy)
    assert np.isfinite(float(loss))
    for k in ("l1_loss", "duration_loss", "pitch_loss", "energy_loss"):
        assert k in stats
    mel, olens = model.apply(params, text, tl, method=model.inference)
    assert mel.shape == (1, 64, 8)
    assert int(olens[0]) <= 64


def test_fs2_grads():
    model = fs2_tiny()
    text = jnp.asarray([[1, 2, 3]]); tl = jnp.asarray([3])
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 10, 8), jnp.float32)
    fl = jnp.asarray([10])
    dur = jnp.asarray([[3, 4, 3]])
    z = jnp.zeros((1, 3))
    params = model.init(jax.random.PRNGKey(0), text, tl, feats, fl, dur, z, z)
    g = jax.grad(lambda p: model.apply(p, text, tl, feats, fl, dur, z, z)[0])(
        params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_hifigan_generator_shape():
    gen = HiFiGANGenerator(in_channels=8, channels=32,
                           upsample_scales=(4, 4),
                           upsample_kernel_sizes=(8, 8),
                           resblock_kernel_sizes=(3,),
                           resblock_dilations=((1, 3),))
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 10, 8), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 160)  # 10 * 4 * 4


def test_gan_vocoder_step():
    model = HiFiGANVocoderGAN(
        fs=8000, n_fft=128, hop_length=16, n_mels=8,
        generator_conf=dict(channels=16, upsample_scales=(4, 4),
                            upsample_kernel_sizes=(8, 8),
                            resblock_kernel_sizes=(3,),
                            resblock_dilations=((1, 3),)),
        discriminator_conf=dict(periods=(2, 3), scales=2))
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 512) * 0.1,
                      jnp.float32)
    from espnet_tpu.ops.mel import log_mel
    from espnet_tpu.ops.stft import stft_power
    p, _ = stft_power(wav, None, n_fft=128, hop_length=16)
    mel = log_mel(p, fs=8000, n_fft=128, n_mels=8)[:, :32]
    params = model.init(jax.random.PRNGKey(0), mel, wav)
    tx_g = build_optimizer("adam", lr=1e-4)
    tx_d = build_optimizer("adam", lr=1e-4)
    step = jax.jit(make_gan_train_step(model.apply, tx_g, tx_d))
    p2, (og, od), stats, w = step(params,
                                  (tx_g.init(params["generator"]),
                                   tx_d.init(params["discriminator"])),
                                  {"feats": mel, "speech": wav},
                                  jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["generator_loss"]))
    assert np.isfinite(float(stats["discriminator_loss"]))
    # generator params actually changed
    a = jax.tree_util.tree_leaves(params["generator"])[0]
    b = jax.tree_util.tree_leaves(p2["generator"])[0]
    assert float(jnp.abs(a - b).max()) > 0


def test_tts_task_e2e(tmp_path):
    """Train FS2 on synthetic aligned data, synthesize via Text2Speech
    (griffin-lim)."""
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.tasks.tts import TTSTask
    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    (d / "wav").mkdir(parents=True)
    fs, hop = 8000, 64
    with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft, \
            open(d / "durations", "w") as fd:
        for i in range(6):
            n_char = rng.randint(2, 5)
            chars = rng.choice(list("AB"), n_char)
            durs = rng.randint(4, 8, n_char)
            n_frames = int(durs.sum())
            wav = rng.randn(n_frames * hop).astype(np.float32) * 0.1
            write_wav(d / "wav" / f"u{i}.wav", fs, wav)
            fw.write(f"u{i} {d / 'wav' / f'u{i}.wav'}\n")
            ft.write(f"u{i} {''.join(chars)}\n")
            fd.write(f"u{i} {' '.join(map(str, durs))}\n")
    (d / "tokens.txt").write_text("<blank>\n<unk>\nA\nB\n<space>\n<sos/eos>\n")
    cfg, params = TTSTask.main({
        "output_dir": str(tmp_path / "exp"),
        "token_list": str(d / "tokens.txt"),
        "feats_extract_conf": {"fs": fs, "n_fft": 128, "hop_length": hop,
                               "n_mels": 8},
        "tts_conf": {"adim": 16, "aheads": 2, "elayers": 1, "eunits": 24,
                     "dlayers": 1, "dunits": 24, "use_postnet": False,
                     "duration_predictor_chans": 16, "dropout_rate": 0.0,
                     "max_frames": 64},
        "optim_conf": {"lr": 0.01},
        "batch_type": "unsorted", "batch_size": 6, "max_epoch": 3,
        "train_data_path_and_name_and_type": [
            f"{d}/wav.scp,speech,sound", f"{d}/text,text,text",
            f"{d}/durations,durations,text_int"],
        "valid_data_path_and_name_and_type": [
            f"{d}/wav.scp,speech,sound", f"{d}/text,text,text",
            f"{d}/durations,durations,text_int"],
    })
    from espnet_tpu.bin.tts_inference import Text2Speech
    t2s = Text2Speech(train_config=tmp_path / "exp" / "config.yaml",
                      model_file=tmp_path / "exp" / "valid.loss.best",
                      griffin_lim_iters=4)
    out = t2s("AB")
    assert out["wav"].ndim == 1 and len(out["wav"]) > 0
    assert np.isfinite(out["wav"]).all()
    assert out["feat_gen"].shape[1] == 8
