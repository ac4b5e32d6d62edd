"""Multi-host launch + host-parallel inference sharding.

Behavioral contract:
- espnet2/bin/launch.py + distributed_utils.py rank discovery: on TPU
  this collapses to `jax.distributed.initialize()` per host (TPU pods
  auto-discover coordinator/rank from the runtime; SLURM/GCE metadata
  handled by JAX).
- the recipe layer's `_nj` scp-split decode parallelism
  (egs2/TEMPLATE/asr1/asr.sh:1589-1616, bin/split_scps.py): replaced by
  `shard_keys` — each host/job takes a strided slice of the utterance
  key list.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

logger = logging.getLogger(__name__)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX. No-op on single host."""
    import jax
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    info = {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}
    logger.info("distributed: %s", info)
    return info


def shard_keys(keys: Sequence[str], job_id: int, num_jobs: int
               ) -> List[str]:
    """Strided utterance sharding for embarrassingly-parallel decode
    (split_scp.pl semantics: contiguous-balanced)."""
    n = len(keys)
    base, rem = divmod(n, num_jobs)
    start = job_id * base + min(job_id, rem)
    size = base + (1 if job_id < rem else 0)
    return list(keys[start:start + size])


def split_scps(scp_path: str, num_jobs: int, outdir: str) -> List[str]:
    """bin/split_scps.py contract: write <outdir>/<name>.<j>.scp."""
    from pathlib import Path
    lines = Path(scp_path).read_text(encoding="utf-8").splitlines(True)
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    name = Path(scp_path).name
    paths = []
    for j in range(num_jobs):
        shard = shard_keys(lines, j, num_jobs)
        p = out / f"{name}.{j + 1}"
        p.write_text("".join(shard), encoding="utf-8")
        paths.append(str(p))
    return paths


def sync_min_steps(n_local: int) -> int:
    """Uneven-data stop (espnet2/train/trainer.py:569-581 equivalent):
    all hosts agree to run min(local step counts) so ragged per-host
    epochs cannot deadlock a collective. No-op on a single process."""
    import jax
    if jax.process_count() == 1:
        return int(n_local)
    import numpy as np
    from jax.experimental import multihost_utils
    all_n = multihost_utils.process_allgather(np.asarray(int(n_local)))
    return int(np.min(all_n))
