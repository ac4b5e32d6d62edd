"""JETS tests + windowed attention encoder."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.jets_gan import JETSGan
from espnet_tpu.train.gan_trainer import make_gan_train_step
from espnet_tpu.train.optim import build_optimizer


def test_jets_gan_step_and_inference():
    gan = JETSGan(
        vocab_size=6, fs=8000, n_fft=64, hop_length=32, n_mels=12,
        jets_conf=dict(adim=16, aheads=2, elayers=1, dlayers=1, units=24,
                       segment_frames=8, dropout_rate=0.0,
                       generator_conf=dict(channels=16,
                                           upsample_scales=(4, 8),
                                           upsample_kernel_sizes=(8, 16),
                                           resblock_kernel_sizes=(3,),
                                           resblock_dilations=((1, 3),))),
        discriminator_conf=dict(periods=(2,), scales=1))
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 32 * 24) * 0.1, jnp.float32)
    text = jnp.asarray(rng.randint(1, 5, (2, 5)))
    batch = {"text": text, "text_lengths": jnp.asarray([5, 3]),
             "speech": wav,
             "speech_lengths": jnp.asarray([32 * 24, 32 * 20])}
    params = gan.init(jax.random.PRNGKey(0), batch["text"],
                      batch["text_lengths"], wav)
    tx_g = build_optimizer("adam", lr=1e-4)
    tx_d = build_optimizer("adam", lr=1e-4)
    step = jax.jit(make_gan_train_step(gan.apply, tx_g, tx_d))
    p2, _, stats, _ = step(params, (tx_g.init(params["generator"]),
                                    tx_d.init(params["discriminator"])),
                           batch, jax.random.PRNGKey(1))
    for k in ("generator_loss", "generator_align_loss",
              "generator_dur_loss", "discriminator_loss"):
        assert np.isfinite(float(stats[k])), k
    wav_out, olens = gan.decode(p2, text, batch["text_lengths"],
                                max_frames=32)
    assert wav_out.shape == (2, 32 * 32)
    assert np.isfinite(np.asarray(wav_out)).all()


def test_windowed_attention_encoder():
    from espnet_tpu.nn.transformer import TransformerEncoder
    enc = TransformerEncoder(input_size=5, output_size=16, attention_heads=2,
                             linear_units=32, num_blocks=1,
                             input_layer="linear", attention_window=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 20, 5), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, jnp.asarray([20]))
    y, _ = enc.apply(params, x, jnp.asarray([20]))
    # frames outside the +-2 window must not influence output: perturb
    # frame 19, frame 0..16 outputs unchanged
    x2 = x.at[0, 19].set(50.0)
    y2, _ = enc.apply(params, x2, jnp.asarray([20]))
    np.testing.assert_allclose(np.asarray(y[0, :17]), np.asarray(y2[0, :17]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(y[0, 18:]), np.asarray(y2[0, 18:]))


def test_visinger_forward_and_inference():
    """VISinger (gan_svs/vits): score-conditioned VITS — midi changes
    the prior; score durations drive inference timing."""
    from espnet_tpu.models.tts.vits import VISinger
    model = VISinger(
        vocab_size=10, z_channels=8, hidden=16, spec_channels=9,
        segment_frames=4, hop_length=16,
        text_encoder_conf=dict(attention_heads=2, linear_units=24,
                               num_blocks=1),
        generator_conf=dict(channels=8, upsample_scales=(4, 4),
                            kernel_size=3))
    B, S, T = 2, 5, 12
    rng = np.random.RandomState(0)
    text = rng.randint(1, 10, (B, S)).astype(np.int32)
    tl = np.asarray([5, 3], np.int32)
    midi = rng.randint(40, 80, (B, S)).astype(np.int32)
    spec = rng.randn(B, T, 9).astype(np.float32)
    sl = np.asarray([12, 8], np.int32)
    params = model.init(jax.random.PRNGKey(0), text, tl, spec, sl,
                        jax.random.PRNGKey(1), midi=midi)
    out = model.apply(params, text, tl, spec, sl, jax.random.PRNGKey(2),
                      midi=midi)
    assert np.isfinite(float(out["kl_loss"]))
    assert np.isfinite(float(out["dur_loss"]))
    assert out["wav_hat"].shape[1] == 4 * 16
    # midi conditioning actually reaches the prior
    out2 = model.apply(params, text, tl, spec, sl, jax.random.PRNGKey(2),
                       midi=midi + 5)
    assert not np.isclose(float(out["kl_loss"]), float(out2["kl_loss"]))
    # inference with score durations: output length == sum of durations
    durs = np.asarray([[3, 2, 2, 0, 0], [4, 1, 0, 0, 0]], np.int32)
    wav, olens = model.apply(params, text, tl, midi=midi,
                             score_durations=durs, max_frames=16,
                             method=model.inference)
    assert olens.tolist() == [7, 5]
    assert wav.shape[1] == 16 * 16


def test_visinger2_ddsp_forward_and_inference():
    """VISinger2 (gan_svs/visinger2): the DDSP branch — score-F0
    harmonic bank + filtered noise — conditions the decoder; midi
    changes the synthesized waveform through the F0 contour (not only
    the prior), and inference follows score durations."""
    from espnet_tpu.models.tts.vits import VISinger2
    model = VISinger2(
        vocab_size=10, z_channels=8, hidden=16, spec_channels=9,
        segment_frames=4, hop_length=16, fs=16000,
        n_harmonics=4, noise_taps=8,
        text_encoder_conf=dict(attention_heads=2, linear_units=24,
                               num_blocks=1),
        generator_conf=dict(channels=8, upsample_scales=(4, 4),
                            upsample_kernel_sizes=(8, 8),
                            kernel_size=3,
                            resblock_kernel_sizes=(3,),
                            resblock_dilations=((1, 3),)))
    B, S, T = 2, 5, 12
    rng = np.random.RandomState(0)
    text = rng.randint(1, 10, (B, S)).astype(np.int32)
    tl = np.asarray([5, 3], np.int32)
    midi = rng.randint(40, 80, (B, S)).astype(np.int32)
    spec = rng.randn(B, T, 9).astype(np.float32)
    sl = np.asarray([12, 8], np.int32)
    params = model.init(jax.random.PRNGKey(0), text, tl, spec, sl,
                        jax.random.PRNGKey(1), midi=midi)
    out = model.apply(params, text, tl, spec, sl, jax.random.PRNGKey(2),
                      midi=midi)
    assert out["wav_hat"].shape == (B, 4 * 16)
    assert np.isfinite(np.asarray(out["wav_hat"])).all()
    assert np.isfinite(float(out["kl_loss"]))
    # grads flow through the DDSP branch into the harmonic head
    g = jax.grad(lambda p: float(0) + jnp.sum(model.apply(
        p, text, tl, spec, sl, jax.random.PRNGKey(2),
        midi=midi)["wav_hat"] ** 2))(params)
    ddsp_g = g["params"]["ddsp"]["harm_amp"]["kernel"]
    assert float(np.abs(np.asarray(ddsp_g)).sum()) > 0
    # inference: midi shifts change the waveform via the F0 contour
    durs = np.asarray([[3, 2, 2, 0, 0], [4, 1, 0, 0, 0]], np.int32)
    wav, olens = model.apply(params, text, tl, midi=midi,
                             score_durations=durs, max_frames=16,
                             method=model.inference)
    assert olens.tolist() == [7, 5] and wav.shape[1] == 16 * 16
    wav2, _ = model.apply(params, text, tl, midi=midi + 12,
                          score_durations=durs, max_frames=16,
                          method=model.inference)
    assert not np.allclose(np.asarray(wav), np.asarray(wav2))
