"""GAN training runtime: alternating generator/discriminator steps.

Behavioral contract: espnet2/train/gan_trainer.py:76-260 — per batch,
loop turns [generator, discriminator] (order flag), model called with
`forward_generator` routing, separate optimizers, optional stochastic
discriminator skip (:149-162).

TPU-first: both turns are fused into ONE jitted step — the generator
update and discriminator update run back-to-back on device with
stop-gradient boundaries (SURVEY.md hard-parts #5); a skip_d flag
(scalar) multiplies the discriminator update to zero when skipped.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def make_gan_train_step(model_apply: Callable, tx_g, tx_d,
                        rng_names=("dropout",)):
    """model_apply(params, batch, rngs, forward_generator) ->
    (loss, stats, weight). params = {"generator": ..., "discriminator": ...}
    (the reference keeps one module tree with two optimizers; we split the
    pytree at the top level)."""

    def step(params, opt_g, opt_d, batch, rng, skip_d):
        rngs = {n: k for n, k in zip(rng_names,
                                     jax.random.split(rng, len(rng_names)))}

        def g_loss(pg):
            loss, stats, w = model_apply({**params, "generator": pg}, batch,
                                         rngs, True)
            return loss, (stats, w)

        (gl, (gstats, weight)), g_grads = jax.value_and_grad(
            g_loss, has_aux=True)(params["generator"])
        g_norm = optax.global_norm(g_grads)
        ok_g = jnp.isfinite(g_norm)
        g_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok_g, g, jnp.zeros_like(g)), g_grads)
        upd_g, opt_g = tx_g.update(g_grads, opt_g, params["generator"])
        new_gen = optax.apply_updates(params["generator"], upd_g)
        params = {**params, "generator": new_gen}

        def d_loss(pd):
            loss, stats, w = model_apply({**params, "discriminator": pd},
                                         batch, rngs, False)
            return loss, (stats, w)

        (dl, (dstats, _)), d_grads = jax.value_and_grad(
            d_loss, has_aux=True)(params["discriminator"])
        d_norm = optax.global_norm(d_grads)
        ok_d = jnp.isfinite(d_norm) & ~skip_d
        d_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok_d, g, jnp.zeros_like(g)), d_grads)
        upd_d, opt_d = tx_d.update(d_grads, opt_d, params["discriminator"])
        new_disc = optax.apply_updates(params["discriminator"], upd_d)
        params = {**params, "discriminator": new_disc}
        stats = {**gstats, **dstats, "grad_norm_g": g_norm,
                 "grad_norm_d": d_norm}
        return params, opt_g, opt_d, stats, weight

    return step
