"""espnet3-style parallel inference / evaluation driver.

Behavioral contract: espnet3/parallel/parallel.py:83-228 — a generic
`parallel_map(fn, items)` that fans work out over a worker pool
(espnet3 uses Dask LocalCluster/SLURMCluster with per-worker setup
plugins), plus the eval loop pattern in espnet3's inference utilities:
shard a key list, run a model function per shard, gather + aggregate
metric dicts.

TPU-native re-design (no Dask in-image, and device access must stay in
one process per host):

- worker setup runs ONCE per worker (`setup_fn` -> context object
  passed to every call), the analogue of espnet3's WorkerPlugin;
- backend "thread": a thread pool in this process — the right choice
  when fn dispatches jitted device work (the GIL is released inside
  XLA; one process keeps one TPU client);
- backend "serial": plain loop (debugging, tiny jobs);
- backend "hosts": multi-host SPMD — each host takes the strided shard
  keys[process_index::process_count] (the asr.sh `_nj` split,
  espnet_tpu/parallel/launch.py:shard_keys) and only its local results
  are returned;
- `ParallelEvaluator` composes parallel_map with metric aggregation:
  per-item dicts are reduced by weighted mean (weight key optional),
  the espnet3 eval-loop contract.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

logger = logging.getLogger(__name__)


def parallel_map(fn: Callable, items: Sequence,
                 backend: str = "thread",
                 num_workers: int = 4,
                 setup_fn: Optional[Callable[[], Any]] = None,
                 chunk_size: int = 1) -> List:
    """Apply fn(item[, ctx]) over items; returns results in order.

    setup_fn, if given, is called once per worker; its return value is
    passed to fn as a second argument (worker-plugin contract).
    """
    want_ctx = setup_fn is not None
    if backend == "hosts":
        import jax
        local = items[jax.process_index()::jax.process_count()]
        return parallel_map(fn, local, backend="thread",
                            num_workers=num_workers, setup_fn=setup_fn,
                            chunk_size=chunk_size)
    if backend == "serial" or num_workers <= 1:
        ctx = setup_fn() if want_ctx else None
        return [fn(it, ctx) if want_ctx else fn(it) for it in items]
    if backend != "thread":
        raise ValueError(f"unknown backend {backend!r}")

    import threading
    local = threading.local()

    def call(it):
        if want_ctx:
            if not hasattr(local, "ctx"):
                local.ctx = setup_fn()
            return fn(it, local.ctx)
        return fn(it)

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        return list(ex.map(call, items))


def aggregate_metrics(dicts: Iterable[Dict[str, float]],
                      weight_key: Optional[str] = None
                      ) -> Dict[str, float]:
    """Weighted-mean reduction of per-item metric dicts (the espnet3
    eval aggregation / Reporter semantics)."""
    sums: Dict[str, float] = {}
    wsum: Dict[str, float] = {}
    n = 0
    for d in dicts:
        if d is None:
            continue
        n += 1
        w = float(d.get(weight_key, 1.0)) if weight_key else 1.0
        for k, v in d.items():
            if k == weight_key or v is None:
                continue
            sums[k] = sums.get(k, 0.0) + float(v) * w
            wsum[k] = wsum.get(k, 0.0) + w
    out = {k: sums[k] / max(wsum[k], 1e-20) for k in sums}
    out["n_items"] = n
    return out


class ParallelEvaluator:
    """Evaluate `fn(key, ctx) -> metrics dict` over keys in parallel and
    aggregate (espnet3 inference/eval loop shape).

    Example:
        ev = ParallelEvaluator(score_one, setup_fn=build_model,
                               num_workers=4)
        report = ev(utt_keys)           # {"wer": ..., "n_items": N}
    """

    def __init__(self, fn: Callable, setup_fn: Optional[Callable] = None,
                 backend: str = "thread", num_workers: int = 4,
                 weight_key: Optional[str] = None):
        self.fn = fn
        self.setup_fn = setup_fn
        self.backend = backend
        self.num_workers = num_workers
        self.weight_key = weight_key

    def __call__(self, keys: Sequence) -> Dict[str, float]:
        results = parallel_map(self.fn, keys, backend=self.backend,
                               num_workers=self.num_workers,
                               setup_fn=self.setup_fn)
        report = aggregate_metrics(results, weight_key=self.weight_key)
        logger.info("parallel eval over %d items: %s", len(keys), report)
        return report


# ---- multi-host decode orchestration (espnet3/parallel/parallel.py
# Dask-worker analogue + asr.sh _nj decode-dir merge) -------------------

def distributed_decode(fn: Callable, keys: Sequence[str], output_dir,
                       rank: Optional[int] = None,
                       world: Optional[int] = None,
                       setup_fn: Optional[Callable] = None,
                       num_workers: int = 1) -> "Path":
    """Decode a strided shard of `keys` into output_dir/output.<rank>/.

    fn(key, writer[, ctx]) writes its outputs through the passed
    DatadirWriter (e.g. writer["1best_recog"]["text"][key] = hyp) — the
    per-job half of the reference recipe's embarrassingly-parallel
    decode (asr.sh:1589-1616 `_nj` split). rank/world default to
    jax.process_index()/process_count(), so the same script run on N
    TPU hosts shards automatically (the espnet3 Dask-cluster role);
    passing them explicitly drives single-host multi-job splits.

    Returns this rank's shard directory. Call `merge_decode_dirs`
    afterwards (any host; it is idempotent) to produce the merged maps.
    """
    from pathlib import Path

    from espnet_tpu.data.fileio import DatadirWriter
    from espnet_tpu.parallel.launch import shard_keys

    if rank is None or world is None:
        import jax
        rank = jax.process_index() if rank is None else rank
        world = jax.process_count() if world is None else world
    shard = shard_keys(list(keys), rank, world)
    shard_dir = Path(output_dir) / f"output.{rank}"
    shard_dir.mkdir(parents=True, exist_ok=True)
    writer = DatadirWriter(shard_dir)
    if setup_fn is not None:
        parallel_map(lambda k, ctx: fn(k, writer, ctx), shard,
                     backend="thread", num_workers=num_workers,
                     setup_fn=setup_fn)
    elif num_workers > 1:
        parallel_map(lambda k: fn(k, writer), shard, backend="thread",
                     num_workers=num_workers)
    else:
        for k in shard:
            fn(k, writer)
    writer.close()
    return shard_dir


def merge_decode_dirs(output_dir, remove_shards: bool = False) -> dict:
    """Merge output.*/ shard trees into key-sorted files at output_dir
    (the `cat ${_logdir}/output.*/1best_recog/text | sort` stage of
    asr.sh:1617-1637). Returns {relative file path: n_lines}."""
    from pathlib import Path

    output_dir = Path(output_dir)
    shard_dirs = sorted(output_dir.glob("output.*"),
                        key=lambda p: int(p.name.split(".")[1]))
    merged: Dict[str, Dict[str, str]] = {}
    for sd in shard_dirs:
        for f in sorted(sd.rglob("*")):
            if not f.is_file():
                continue
            rel = str(f.relative_to(sd))
            table = merged.setdefault(rel, {})
            for line in f.read_text(encoding="utf-8").splitlines():
                if not line.strip():
                    continue
                key, *rest = line.split(maxsplit=1)
                table[key] = rest[0] if rest else ""
    counts = {}
    for rel, table in merged.items():
        out = output_dir / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        with out.open("w", encoding="utf-8") as fo:
            for key in sorted(table):
                fo.write(f"{key} {table[key]}\n")
        counts[rel] = len(table)
    if remove_shards:
        import shutil
        for sd in shard_dirs:
            shutil.rmtree(sd, ignore_errors=True)
    return counts


def gather_metrics(local: Dict[str, float],
                   weight_key: Optional[str] = None) -> Dict[str, float]:
    """Combine per-host metric dicts into the global weighted mean.

    Single-process: identity. Multi-host: numeric values ride a
    jax all-gather (multihost_utils), keys must match across hosts —
    the Reporter all_reduce role of the reference's distributed eval.
    """
    import jax

    if jax.process_count() == 1:
        return dict(local)
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(local)
    vec = np.asarray([float(local[k]) for k in keys], np.float32)
    allv = np.asarray(multihost_utils.process_allgather(vec))  # (P, K)
    dicts = [{k: float(allv[p, i]) for i, k in enumerate(keys)}
             for p in range(allv.shape[0])]
    return aggregate_metrics(dicts, weight_key=weight_key)
