"""Device-mesh parallelism.

Behavioral contract: the reference's entire distributed inventory
(SURVEY.md §2.6 — DDP/FSDP/ZeRO/DeepSpeed, NCCL process groups, rank
discovery) collapses on TPU to ONE mesh + sharding annotations:

- data parallel  = batch sharded over the 'data' axis; gradient psums
  are inserted by XLA from the sharding (replaces DDP allreduce)
- ZeRO/FSDP      = optimizer/param sharding over 'fsdp' via
  NamedSharding on the state pytree (replaces fairscale/deepspeed)
- tensor parallel hooks = 'model' axis for attention-head / FFN sharding
  of large speechlm-class models (the reference has none; we expose the
  axis so scaling beyond DP is a sharding change, not a rewrite)

Multi-host: `jax.distributed.initialize()` once per process; the mesh
spans all global devices (ICI within slice, DCN across).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_fsdp: int = 1,
              n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, fsdp, model) mesh over the given devices."""
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // (n_fsdp * n_model)
    assert n_data * n_fsdp * n_model == n_total, \
        f"{n_data}x{n_fsdp}x{n_model} != {n_total} devices"
    dev_array = np.asarray(devices).reshape(n_data, n_fsdp, n_model)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_leaf_spec(mesh: Mesh, x) -> NamedSharding:
    """Largest divisible axis of `x` sharded over 'fsdp', else replicated."""
    n_fsdp = mesh.shape[FSDP_AXIS]
    ndim = len(getattr(x, "shape", ()))
    if n_fsdp == 1 or ndim == 0:
        return NamedSharding(mesh, P())
    axes = sorted(range(ndim), key=lambda a: -x.shape[a])
    for a in axes:
        if x.shape[a] % n_fsdp == 0 and x.shape[a] >= n_fsdp:
            parts = [None] * ndim
            parts[a] = FSDP_AXIS
            return NamedSharding(mesh, P(*parts))
    return NamedSharding(mesh, P())


def fsdp_param_sharding(mesh: Mesh, params) -> Dict:
    """Shard each parameter's largest divisible axis over 'fsdp'
    (ZeRO-3-style param sharding; optimizer state follows params)."""
    return jax.tree_util.tree_map(
        functools.partial(_fsdp_leaf_spec, mesh), params)


def fsdp_opt_sharding(mesh: Mesh, tx, params):
    """Sharding pytree for `tx.init(params)` matching fsdp_param_sharding.

    optax states are tuple-structured (NOT params-structured), so the
    param sharding tree cannot be reused directly; instead the same
    largest-divisible-axis rule is applied to every leaf of the actual
    state tree — param-shaped moments (adam mu/nu) land on the same spec
    as their parameter, scalars (step counts) stay replicated.
    """
    state_shapes = jax.eval_shape(tx.init, params)
    return jax.tree_util.tree_map(
        functools.partial(_fsdp_leaf_spec, mesh), state_shapes)


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict:
    """Pad batch dim to a multiple of the data axis and device_put."""
    sh = batch_sharding(mesh)
    n = mesh.shape[DATA_AXIS]

    def put(x):
        if x.shape[0] % n != 0:
            reps = -x.shape[0] % n
            x = np.concatenate([x, np.repeat(x[-1:], reps, axis=0)], axis=0)
        return jax.device_put(x, sh)

    return {k: put(np.asarray(v)) for k, v in batch.items()}


def make_parallel_train_step(model_apply, tx, mesh: Mesh,
                             param_sharding=None, params=None,
                             opt_sharding=None, **step_kwargs):
    """jit the fused train step with explicit in/out shardings.

    params replicated (or fsdp-sharded), batch on 'data'; XLA derives the
    gradient psum over 'data' (and reduce-scatter under fsdp) from the
    output shardings. The optimizer-state sharding is derived from the
    actual `tx.init` tree (tuple-structured, not params-structured) when
    `params` is given; otherwise from `opt_sharding`/replicated.
    """
    from espnet_tpu.train.trainer import make_train_step
    step = make_train_step(model_apply, tx, **step_kwargs)
    if param_sharding is None:
        param_sharding = replicated(mesh)
    if opt_sharding is None:
        if params is not None and not isinstance(param_sharding,
                                                 NamedSharding):
            # fsdp tree: the largest-divisible-axis rule is deterministic
            # on shape, so re-deriving over the state tree matches each
            # param-shaped moment to its parameter's sharding
            opt_sharding = fsdp_opt_sharding(mesh, tx, params)
        else:
            opt_sharding = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(param_sharding, opt_sharding, batch_sharding(mesh),
                      replicated(mesh)),
        out_shardings=(param_sharding, opt_sharding, replicated(mesh),
                       replicated(mesh)),
        donate_argnums=(0, 1))
