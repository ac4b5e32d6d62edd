"""VITS tests: forward pieces, GAN step, inference."""

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.vits import VITS
from espnet_tpu.models.tts.vits_gan import VITSGan
from espnet_tpu.ops.stft import stft
from espnet_tpu.train.gan_trainer import make_gan_train_step
from espnet_tpu.train.optim import build_optimizer


def small_conf():
    return dict(
        z_channels=8, hidden=16, spec_channels=33, segment_frames=8,
        hop_length=32,
        text_encoder_conf=dict(output_size=16, attention_heads=2,
                               linear_units=24, num_blocks=1,
                               input_layer="embed"),
        generator_conf=dict(channels=16, upsample_scales=(4, 8),
                            upsample_kernel_sizes=(8, 16),
                            resblock_kernel_sizes=(3,),
                            resblock_dilations=((1, 3),)))


def make_batch(B=2, S=6, T=24, n_fft=64, hop=32):
    rng = np.random.RandomState(0)
    wav = rng.randn(B, T * hop).astype(np.float32) * 0.1
    real, imag, _ = stft(jnp.asarray(wav), None, n_fft=n_fft,
                         hop_length=hop)
    spec = jnp.sqrt(real ** 2 + imag ** 2 + 1e-9)[:, :T]
    text = jnp.asarray(rng.randint(1, 5, (B, S)))
    return {
        "text": text, "text_lengths": jnp.asarray([S, S - 2]),
        "spec": spec, "spec_lengths": jnp.asarray([T, T - 6]),
        "speech": jnp.asarray(wav),
    }


def test_vits_forward_and_inference():
    batch = make_batch()
    model = VITS(vocab_size=6, **small_conf())
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch["text"],
                        batch["text_lengths"], batch["spec"],
                        batch["spec_lengths"], rng)
    out = model.apply(params, batch["text"], batch["text_lengths"],
                      batch["spec"], batch["spec_lengths"], rng)
    assert out["wav_hat"].shape == (2, 8 * 32)
    assert np.isfinite(float(out["kl_loss"]))
    assert np.isfinite(float(out["dur_loss"]))
    wav, olens = model.apply(params, batch["text"], batch["text_lengths"],
                             method=model.inference, max_frames=32)
    assert wav.shape == (2, 32 * 32)
    assert np.isfinite(np.asarray(wav)).all()


def test_vits_gan_step():
    batch = make_batch()
    gan = VITSGan(vocab_size=6, fs=8000, n_fft=64, hop_length=32, n_mels=12,
                  vits_conf=small_conf(),
                  discriminator_conf=dict(periods=(2, 3), scales=1))
    params = gan.init(jax.random.PRNGKey(0), batch["text"],
                      batch["text_lengths"], batch["spec"],
                      batch["spec_lengths"], batch["speech"])
    tx_g = build_optimizer("adam", lr=1e-4)
    tx_d = build_optimizer("adam", lr=1e-4)
    step = jax.jit(make_gan_train_step(gan.apply, tx_g, tx_d))
    p2, _, stats, _ = step(params, (tx_g.init(params["generator"]),
                                    tx_d.init(params["discriminator"])),
                           batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["generator_loss"]))
    assert np.isfinite(float(stats["discriminator_loss"]))
    wav, olens = gan.decode(p2, batch["text"], batch["text_lengths"],
                            max_frames=16)
    assert np.isfinite(np.asarray(wav)).all()


def test_residual_coupling_flow_invertible():
    """flow(flow(x)) with reverse=True must reconstruct x — the
    inference path (vits.py:560 contract) inverts the training-time
    flow, so a broken inverse silently destroys synthesis quality."""
    from espnet_tpu.models.tts.vits import ResidualCouplingFlow
    flow = ResidualCouplingFlow(flows=4, hidden=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 8))
    mask = jnp.ones((2, 7), bool)
    p = flow.init(jax.random.PRNGKey(1), x, mask)
    y = flow.apply(p, x, mask, reverse=False)
    xr = flow.apply(p, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x),
                               atol=1e-4, rtol=1e-4)
    # and the forward map is not the identity
    assert float(jnp.abs(y - x).max()) > 1e-3
