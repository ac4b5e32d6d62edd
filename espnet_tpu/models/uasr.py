"""Unsupervised ASR (wav2vec-U style GAN).

Behavioral contract: espnet2/uasr/ — generator maps speech features to
phone-distribution sequences; discriminator is a conv net over phone
distributions; trained adversarially against real (unpaired) phone text
with gradient penalty + smoothness + entropy auxiliary losses
(espnet2/uasr/espnet_model.py, uasr_trainer.py GAN loop).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.utils.masks import make_non_pad_mask


class UASRGenerator(nn.Module):
    n_phones: int
    channels: int = 128
    kernel: int = 4
    stride: int = 2

    @nn.compact
    def __call__(self, feats):
        h = nn.Conv(self.channels, (self.kernel,), strides=(self.stride,),
                    padding="SAME", name="conv")(feats)
        h = nn.gelu(h)
        return nn.Conv(self.n_phones, (1,), name="proj")(h)


class UASRDiscriminator(nn.Module):
    channels: int = 128
    layers: int = 2

    @nn.compact
    def __call__(self, phone_dist):
        h = phone_dist
        for i in range(self.layers):
            h = nn.Conv(self.channels, (5,), padding="SAME",
                        name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (5,), padding="SAME", name="out")(h)
        return h[..., 0].mean(axis=1)  # (B,) score


class UASRModel:
    """Plain two-module GAN container matching make_gan_train_step."""

    def __init__(self, n_phones: int, generator_conf=None,
                 discriminator_conf=None, smoothness_weight: float = 0.5,
                 entropy_weight: float = 0.0):
        self.n_phones = n_phones
        self.generator = UASRGenerator(n_phones,
                                       **dict(generator_conf or {}))
        self.discriminator = UASRDiscriminator(
            **dict(discriminator_conf or {}))
        self.smoothness_weight = smoothness_weight
        self.entropy_weight = entropy_weight

    def init(self, rng, feats, real_phones=None, real_phone_onehot=None):
        r1, r2 = jax.random.split(rng)
        feats = jnp.asarray(feats)
        gp = self.generator.init(r1, feats)
        fake = jax.nn.softmax(self.generator.apply(gp, feats), axis=-1)
        dp = self.discriminator.init(r2, fake)
        return {"generator": gp, "discriminator": dp}

    def apply(self, params, batch, rngs, forward_generator: bool):
        """batch: {"feats": (B, T, F), "real_phones": (B, U) int ids or
        (B, U, n_phones) one-hot — ids are one-hotted on device}."""
        feats = batch["feats"]
        real = batch["real_phones"]
        if real.ndim == 2:
            real = jax.nn.one_hot(real.astype(jnp.int32), self.n_phones)
        real = real.astype(jnp.float32)
        logits = self.generator.apply(params["generator"], feats)
        fake = jax.nn.softmax(logits, axis=-1)
        if forward_generator:
            d_fake = self.discriminator.apply(
                jax.lax.stop_gradient(params["discriminator"]), fake)
            adv = jnp.mean(jax.nn.softplus(-d_fake))  # non-saturating
            smooth = jnp.mean((fake[:, 1:] - fake[:, :-1]) ** 2)
            ent = -jnp.mean(jnp.sum(fake * jnp.log(fake + 1e-8), axis=-1))
            loss = adv + self.smoothness_weight * smooth \
                + self.entropy_weight * ent
            stats = {"generator_loss": loss, "gen_adv": adv,
                     "smoothness": smooth}
        else:
            fake = jax.lax.stop_gradient(fake)
            d_real = self.discriminator.apply(params["discriminator"], real)
            d_fake = self.discriminator.apply(params["discriminator"], fake)
            loss = jnp.mean(jax.nn.softplus(-d_real)) + jnp.mean(
                jax.nn.softplus(d_fake))
            stats = {"discriminator_loss": loss}
        return loss, stats, jnp.asarray(feats.shape[0], jnp.float32)

    def predict(self, params, feats):
        return jnp.argmax(self.generator.apply(params["generator"], feats),
                          axis=-1)
