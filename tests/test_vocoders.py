"""Vocoder zoo: MelGAN / StyleMelGAN / ParallelWaveGAN shape + GAN-step
tests (gan_tts melgan/style_melgan/parallel_wavegan parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HOP_SCALES = (2, 2)  # hop = 4, tiny for tests


def _mel(B=2, T=8, M=10):
    return jnp.asarray(np.random.RandomState(0).randn(B, T, M) * 0.1,
                       jnp.float32)


@pytest.mark.parametrize("name,conf", [
    ("melgan", {"channels": 32, "stacks": 1}),
    ("style_melgan", {"channels": 16, "noise_dim": 8}),
    ("parallel_wavegan", {"layers": 4, "stacks": 2,
                          "residual_channels": 8, "gate_channels": 16,
                          "skip_channels": 8}),
])
def test_generator_shapes(name, conf):
    from espnet_tpu.models.tts.gan_vocoder import GENERATOR_CHOICES
    gen = GENERATOR_CHOICES[name](in_channels=10,
                                  upsample_scales=HOP_SCALES, **conf)
    mel = _mel()
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 8 * 4)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0 + 1e-6


@pytest.mark.parametrize("name,conf", [
    ("melgan", {"channels": 32, "stacks": 1}),
    ("parallel_wavegan", {"layers": 4, "stacks": 2,
                          "residual_channels": 8, "gate_channels": 16,
                          "skip_channels": 8}),
])
def test_vocoder_gan_steps(name, conf):
    """One G and one D step: losses finite, generator params move."""
    from espnet_tpu.models.tts.gan_vocoder import HiFiGANVocoderGAN
    import optax
    model = HiFiGANVocoderGAN(
        fs=800, n_fft=64, hop_length=4, n_mels=10,
        generator=name,
        generator_conf=dict(upsample_scales=HOP_SCALES, **conf),
        discriminator_conf={"periods": (2,), "scales": 1})
    mel = _mel()
    wav = jnp.asarray(np.random.RandomState(1).randn(2, 32) * 0.1,
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel, wav)
    batch = {"feats": mel, "speech": wav}

    def g_loss(gp):
        loss, stats, _ = model.apply(
            {"generator": gp, "discriminator": params["discriminator"]},
            batch, None, forward_generator=True)
        return loss, stats

    (gl, gstats), ggrads = jax.value_and_grad(g_loss, has_aux=True)(
        params["generator"])
    assert np.isfinite(float(gl))
    gnorm = optax.global_norm(ggrads)
    assert float(gnorm) > 0

    def d_loss(dp):
        loss, stats, _ = model.apply(
            {"generator": params["generator"], "discriminator": dp},
            batch, None, forward_generator=False)
        return loss

    dl, dgrads = jax.value_and_grad(d_loss)(params["discriminator"])
    assert np.isfinite(float(dl))
    assert float(optax.global_norm(dgrads)) > 0


def test_multi_resolution_stft_loss_discriminates():
    from espnet_tpu.models.tts.vocoders import multi_resolution_stft_loss
    rng = np.random.RandomState(0)
    real = jnp.asarray(np.sin(np.arange(4000) * 0.1)[None] * 0.5,
                       jnp.float32)
    same = multi_resolution_stft_loss(
        real, real, fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    noise = jnp.asarray(rng.randn(1, 4000) * 0.5, jnp.float32)
    diff = multi_resolution_stft_loss(
        noise, real, fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    assert float(same) < 1e-4
    assert float(diff) > float(same) + 0.1


class TestWaveNetVocoder:
    """AR mu-law WaveNet (gan_tts/wavenet/wavenet.py role): parallel
    teacher-forced training, ring-buffer scan generation."""

    def _net(self):
        from espnet_tpu.models.tts.wavenet import WaveNetVocoder
        return WaveNetVocoder(quantize=32, layers=4, stacks=2,
                              residual_channels=8, gate_channels=16,
                              skip_channels=8, aux_channels=4,
                              hop_length=4)

    def test_mu_law_roundtrip(self):
        from espnet_tpu.models.tts.wavenet import (mu_law_decode,
                                                   mu_law_encode)
        x = jnp.asarray(np.linspace(-1, 1, 101), jnp.float32)
        ids = mu_law_encode(x)
        assert int(ids.min()) >= 0 and int(ids.max()) <= 255
        rt = mu_law_decode(ids)
        assert float(jnp.abs(rt - x).max()) < 0.05

    def test_teacher_forced_loss_and_grad(self):
        net = self._net()
        rng = np.random.RandomState(0)
        wav = jnp.asarray(rng.randn(2, 64) * 0.2, jnp.float32)
        mel = jnp.asarray(rng.randn(2, 16, 4), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), wav, mel)
        loss, logits = net.apply(params, wav, mel)
        assert np.isfinite(float(loss)) and logits.shape == (2, 64, 32)
        g = jax.grad(lambda p: net.apply(p, wav, mel)[0])(params)
        assert all(np.isfinite(np.asarray(t)).all()
                   for t in jax.tree_util.tree_leaves(g))

    def test_incremental_matches_parallel(self):
        """The fast-generation ring buffers must reproduce the parallel
        forward exactly (teacher replay)."""
        from espnet_tpu.models.tts.wavenet import mu_law_encode
        net = self._net()
        rng = np.random.RandomState(1)
        wav = jnp.asarray(rng.randn(2, 64) * 0.2, jnp.float32)
        mel = jnp.asarray(rng.randn(2, 16, 4), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), wav, mel)
        _, logits_par = net.apply(params, wav, mel)
        ids = mu_law_encode(wav, 32)
        _, logits_inc = net.apply(params, mel, ids, method=net.generate)
        np.testing.assert_allclose(np.asarray(logits_inc),
                                   np.asarray(logits_par), atol=2e-4)

    def test_free_running_generation(self):
        net = self._net()
        rng = np.random.RandomState(2)
        wav = jnp.asarray(rng.randn(1, 32) * 0.2, jnp.float32)
        mel = jnp.asarray(rng.randn(1, 8, 4), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), wav, mel)
        out = net.apply(params, mel, method=net.generate)
        assert out.shape == (1, 32)
        assert np.isfinite(np.asarray(out)).all()
