"""Tensor (model-axis) parallelism: Megatron-style sharding rules.

Behavioral contract: the reference has no tensor parallelism at all —
its largest models train data-parallel (espnet2/train/trainer.py DDP
path). On TPU, scaling a speechlm-class model past one chip's HBM is a
sharding annotation, not a rewrite: column-parallel projections (QKV,
relative-position, FFN w_1, vocab heads) shard their OUTPUT features
over the mesh 'model' axis, row-parallel projections (attention output,
FFN w_2) shard their INPUT features, and XLA's sharding propagation
inserts the one all-reduce per block that Megatron-LM codes by hand.

The rules are name-based over the param tree paths (the flax module
names are stable across encoder/decoder/LM):

- column-parallel: ``linear_q  linear_k  linear_v  linear_pos  w_1
  ctc_lo  output_layer`` — kernel ``P(fsdp?, 'model')``, bias
  ``P('model')``
- row-parallel: ``linear_out  w_2`` — kernel ``P('model', fsdp?)``,
  bias replicated (added once, after the all-reduce)
- per-head tables: ``pos_bias_u / pos_bias_v`` (H, dk) shard heads
- everything else falls back to the ZeRO 'fsdp' largest-axis rule
  (parallel/mesh.py) or replication.

Because the head dim H*dk is laid out head-major, sharding a QKV
kernel's output axis by n_model | H splits on whole-head boundaries —
attention math never crosses a shard.

The same path-name rules applied to ``jax.eval_shape(tx.init, params)``
shard adam moments like their parameters (optax state tuples embed
params-structured subtrees, so the names survive).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from espnet_tpu.parallel.mesh import FSDP_AXIS, MODEL_AXIS, _fsdp_leaf_spec

COLUMN_PARALLEL = {"linear_q", "linear_k", "linear_v", "linear_pos",
                   "w_1", "ctc_lo", "output_layer"}
ROW_PARALLEL = {"linear_out", "w_2"}
HEAD_TABLES = {"pos_bias_u", "pos_bias_v"}


def _path_names(path) -> list:
    names = []
    for e in path:
        if isinstance(e, jtu.DictKey):
            names.append(str(e.key))
        elif isinstance(e, jtu.GetAttrKey):
            names.append(e.name)
        elif isinstance(e, jtu.FlattenedIndexKey):
            names.append(str(e.key))
        # SequenceKey (optax tuple position) carries no module name
    return names


def _tp_leaf_spec(mesh: Mesh, path, x) -> NamedSharding:
    """TP rule by module/param name; fsdp/replicated fallback."""
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    n_fsdp = mesh.shape.get(FSDP_AXIS, 1)
    shape = getattr(x, "shape", ())
    names = _path_names(path)
    parent = names[-2] if len(names) >= 2 else ""
    leaf = names[-1] if names else ""

    def fsdp_axis_ok(a):
        return n_fsdp > 1 and shape[a] % n_fsdp == 0 and shape[a] >= n_fsdp

    if leaf in HEAD_TABLES and len(shape) == 2 \
            and shape[0] % n_model == 0 and n_model > 1:
        return NamedSharding(mesh, P(MODEL_AXIS, None))
    if parent in COLUMN_PARALLEL and n_model > 1:
        if leaf == "kernel" and len(shape) == 2 \
                and shape[1] % n_model == 0:
            return NamedSharding(
                mesh, P(FSDP_AXIS if fsdp_axis_ok(0) else None, MODEL_AXIS))
        if leaf == "bias" and len(shape) == 1 \
                and shape[0] % n_model == 0:
            return NamedSharding(mesh, P(MODEL_AXIS))
    if parent in ROW_PARALLEL and n_model > 1:
        if leaf == "kernel" and len(shape) == 2 \
                and shape[0] % n_model == 0:
            return NamedSharding(
                mesh, P(MODEL_AXIS, FSDP_AXIS if fsdp_axis_ok(1) else None))
        # row-parallel bias: replicated, added once after the all-reduce
        if leaf == "bias":
            return NamedSharding(mesh, P())
    return _fsdp_leaf_spec(mesh, x)


def tp_param_sharding(mesh: Mesh, params):
    """Sharding pytree for `params` under the TP + fsdp rules above."""
    return jtu.tree_map_with_path(
        functools.partial(_tp_leaf_spec, mesh), params)


def tp_opt_sharding(mesh: Mesh, tx, params):
    """Sharding for `tx.init(params)`: the path-name rules recover each
    adam moment's parameter identity inside the optax state tuples."""
    state_shapes = jax.eval_shape(tx.init, params)
    return jtu.tree_map_with_path(
        functools.partial(_tp_leaf_spec, mesh), state_shapes)


def auto_param_sharding(mesh: Optional[Mesh], params, fsdp: bool = False,
                        tp: bool = False):
    """One entry point: TP rules iff tp, ZeRO rules iff fsdp, else
    replicated — the Trainer's sharding policy switch."""
    from espnet_tpu.parallel.mesh import fsdp_param_sharding, replicated
    if mesh is None:
        return None
    if tp and mesh.shape.get(MODEL_AXIS, 1) > 1:
        return tp_param_sharding(mesh, params)
    if fsdp and mesh.shape.get(FSDP_AXIS, 1) > 1:
        return fsdp_param_sharding(mesh, params)
    return replicated(mesh)


def auto_opt_sharding(mesh: Optional[Mesh], tx, params, fsdp: bool = False,
                      tp: bool = False):
    from espnet_tpu.parallel.mesh import fsdp_opt_sharding, replicated
    if mesh is None:
        return None
    if tp and mesh.shape.get(MODEL_AXIS, 1) > 1:
        return tp_opt_sharding(mesh, tx, params)
    if fsdp and mesh.shape.get(FSDP_AXIS, 1) > 1:
        return fsdp_opt_sharding(mesh, tx, params)
    return replicated(mesh)
