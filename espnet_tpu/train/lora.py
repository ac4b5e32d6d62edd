"""LoRA parameter-efficient finetuning.

Behavioral contract: espnet2/layers/create_adapter.py (LoRA injection
into attention/linear layers by name pattern; trainer save_strategy
adapter_only). Functional JAX formulation: LoRA factors live in a
SEPARATE pytree mirroring selected kernels; `merge_lora` adds
(alpha/r)·A@B into the base kernels for inference; the finetune step
differentiates only the factors (base params frozen via stop_gradient
closure), which also gives adapter-only checkpoints for free.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _match(path: str, patterns: Sequence[str]) -> bool:
    return any(p in path for p in patterns)


def _iter_kernels(params, patterns):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name.endswith("kernel") and leaf.ndim == 2 and \
                _match(name, patterns):
            yield name, leaf


def init_lora(rng, params, rank: int = 8,
              target_patterns: Sequence[str] = ("linear_q", "linear_v"),
              alpha: float = 16.0):
    """-> lora pytree {name: {"a": (in, r), "b": (r, out)}}."""
    lora = {}
    for name, kernel in _iter_kernels(params, target_patterns):
        rng, k = jax.random.split(rng)
        din, dout = kernel.shape
        lora[name] = {
            "a": jax.random.normal(k, (din, rank)) * (1.0 / np.sqrt(din)),
            "b": jnp.zeros((rank, dout)),
        }
    return lora, alpha / rank


def merge_lora(params, lora, scaling: float):
    """Return params with LoRA deltas added to the matched kernels."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name in lora:
            delta = lora[name]["a"] @ lora[name]["b"] * scaling
            out.append(leaf + delta.astype(leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def trainable_mask(params, patterns: Sequence[str]):
    """bool pytree: True where the param path matches any pattern —
    the functional analogue of requires_grad selection in
    create_adapter.py (e.g. patterns=('houlsby',) trains only injected
    Houlsby adapters)."""

    def f(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return _match(name, patterns)

    return jax.tree_util.tree_map_with_path(f, params)


def make_partial_train_step(model_apply: Callable, tx, patterns,
                            rng_names=("dropout",)):
    """Train only params whose path matches `patterns`: gradients AND
    updates of all other params are zeroed, so frozen params are
    bit-identical after every step (incl. under decoupled weight
    decay). Adapter-only finetuning (trainer.py:392-409 save_strategy
    adapter_only)."""
    import optax

    def step(params, opt_state, batch, rng):
        rngs = {n: k for n, k in
                zip(rng_names, jax.random.split(rng, len(rng_names)))}
        mask = trainable_mask(params, patterns)

        def loss_fn(p):
            loss, stats, w = model_apply(p, batch, rngs)
            return loss, (stats, w)

        (loss, (stats, w)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask)
        params = optax.apply_updates(params, updates)
        return params, opt_state, stats, w

    return step


def extract_adapter(params, patterns: Sequence[str] = ("houlsby",)):
    """Adapter-only checkpoint: sub-pytree of matching params
    (save_strategy adapter_only contract)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if _match(name, patterns):
            out[name] = leaf
    return out


def make_lora_train_step(model_apply: Callable, tx, base_params,
                         scaling: float, rng_names=("dropout",)):
    """Train ONLY the LoRA factors; base params frozen."""
    frozen = jax.lax.stop_gradient(base_params)

    def step(lora, opt_state, batch, rng):
        rngs = {n: k for n, k in
                zip(rng_names, jax.random.split(rng, len(rng_names)))}

        def loss_fn(lr):
            merged = merge_lora(frozen, lr, scaling)
            loss, stats, w = model_apply(merged, batch, rngs)
            return loss, (stats, w)

        (loss, (stats, w)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        import optax
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, stats, w

    return step
