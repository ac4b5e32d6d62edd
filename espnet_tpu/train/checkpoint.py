"""Checkpoint save/load.

Behavioral contract: espnet2/train/trainer.py:391-503 — per-epoch
`checkpoint` {model, optimizers, schedulers, reporter}, `{n}epoch` model
snapshots, `latest`/best symlinks, n-best pruning, final n-best weight
averaging (espnet2/main_funcs/average_nbest_models.py:14).

Format: a directory per checkpoint with msgpack-serialized pytrees
(flax.serialization) + a JSON meta file. Device arrays are pulled to
host numpy; orbax-style fully-sharded async checkpointing is layered on
later for multi-host (the on-disk params format is a plain pytree either
way).
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, params, opt_state=None, meta: Optional[dict] = None,
                    use_orbax: bool = False):
    if use_orbax:
        return save_checkpoint_orbax(path, params, opt_state, meta)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    # atomic write-then-rename: a kill mid-save must never leave a
    # truncated pickle where the resume path expects a valid one
    def _dump(obj, name):
        tmp = path / (name + ".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(_to_host(obj), f)
        tmp.replace(path / name)

    _dump(params, "params.pkl")
    if opt_state is not None:
        _dump(opt_state, "opt_state.pkl")
    if meta is not None:
        tmp = path / "meta.json.tmp"
        tmp.write_text(json.dumps(meta))
        tmp.replace(path / "meta.json")


def load_checkpoint(path, with_opt: bool = False):
    """Format auto-detect: orbax directory, compressed fp16 npz (committed
    bench/release assets), or pickled host pytree."""
    path = Path(path)
    if (path / "params_orbax").exists():
        return load_checkpoint_orbax(path, with_opt=with_opt)
    if (path / "params_f16.npz").exists() or path.suffix == ".npz":
        from flax.traverse_util import unflatten_dict
        f = path if path.suffix == ".npz" else path / "params_f16.npz"
        z = np.load(f)
        flat = {tuple(k.split("/")):
                (z[k].astype(np.float32) if z[k].dtype == np.float16
                 else z[k]) for k in z.files}
        params = unflatten_dict(flat)
        meta = {}
        if (path / "meta.json").exists():
            meta = json.loads((path / "meta.json").read_text())
        return params, None, meta
    with open(path / "params.pkl", "rb") as f:
        params = pickle.load(f)
    opt_state = None
    if with_opt and (path / "opt_state.pkl").exists():
        try:
            with open(path / "opt_state.pkl", "rb") as f:
                opt_state = pickle.load(f)
        except (EOFError, pickle.UnpicklingError):
            # truncated by a kill mid-save (pre-atomic-write checkpoints):
            # params-only resume beats refusing to start
            import logging
            logging.getLogger(__name__).warning(
                "corrupt opt_state.pkl in %s - resuming params-only "
                "(optimizer state reinitialized)", path)
    meta = {}
    if (path / "meta.json").exists():
        meta = json.loads((path / "meta.json").read_text())
    return params, opt_state, meta


def save_checkpoint_orbax(path, params, opt_state=None,
                          meta: Optional[dict] = None):
    """Orbax-backed variant for multi-host sharded arrays: each host
    writes only its shards (the TPU answer to rank-0 torch.save)."""
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path / "params_orbax", params, force=True)
    if opt_state is not None:
        ckptr.save(path / "opt_state_orbax", opt_state, force=True)
    if meta is not None:
        path.mkdir(parents=True, exist_ok=True)
        (path / "meta.json").write_text(json.dumps(meta))


def load_checkpoint_orbax(path, params_like=None, with_opt: bool = False):
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    params = ckptr.restore(path / "params_orbax", item=params_like)
    opt_state = None
    if with_opt and (path / "opt_state_orbax").exists():
        opt_state = ckptr.restore(path / "opt_state_orbax")
    meta = {}
    if (path / "meta.json").exists():
        meta = json.loads((path / "meta.json").read_text())
    return params, opt_state, meta


def average_checkpoints(paths: List, out_path=None):
    """Uniform weight averaging of n-best snapshots
    (average_nbest_models.py:14 semantics)."""
    acc = None
    n = len(paths)
    for p in paths:
        params, _, _ = load_checkpoint(p)
        flat, treedef = jax.tree_util.tree_flatten(params)
        if acc is None:
            acc = [np.asarray(x, np.float64) for x in flat]
            tdef = treedef
        else:
            for i, x in enumerate(flat):
                acc[i] += np.asarray(x, np.float64)
    avg = [(a / n).astype(np.float32) if a.dtype.kind == "f" else a
           for a in acc]
    params = jax.tree_util.tree_unflatten(tdef, avg)
    if out_path is not None:
        save_checkpoint(out_path, params, meta={"averaged_from":
                                                [str(p) for p in paths]})
    return params
