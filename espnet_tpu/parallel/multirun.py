"""Config-driven multi-run driver (espnet3 Hydra/OmegaConf multirun
role; espnet3/utils/config_utils.py + the `-m key=a,b` sweep syntax).

A sweep is a base task config plus per-key value lists; the driver
expands the cartesian product (or zipped lists), materializes one
`output_dir` per run (`run0_key=val/...`), executes them through the
task's normal `main()` spine (sequentially by default — one host owns
one TPU client — or thread-parallel for CPU-bound sweeps), and collects
each run's best validation metrics into a summary table.

This is deliberately NOT a scheduler: multi-host scale-out is the job
of bin/launch.py (each generated process can run its own sweep shard
via the `shard`/`num_shards` arguments — the espnet3 Dask-cluster
scale-out path mapped onto hosts).
"""

from __future__ import annotations

import itertools
import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)


def parse_sweep(specs: Sequence[str]) -> Dict[str, List[Any]]:
    """['optim_conf.lr=0.1,0.01', 'encoder=a,b'] -> {key: [values]}
    (Hydra multirun syntax). Values parse as YAML scalars."""
    import yaml
    out: Dict[str, List[Any]] = {}
    for spec in specs:
        if "=" not in spec:
            raise ValueError(f"sweep spec {spec!r} needs key=v1,v2,...")
        key, vals = spec.split("=", 1)
        out[key.strip()] = [yaml.safe_load(v) for v in vals.split(",")]
    return out


def _set_dotted(cfg: Dict, key: str, value) -> None:
    parts = key.split(".")
    d = cfg
    for p in parts[:-1]:
        d = d.setdefault(p, {})
        if not isinstance(d, dict):
            raise TypeError(f"{key}: {p} is not a dict")
    d[parts[-1]] = value


def expand_sweep(sweep: Dict[str, List[Any]],
                 mode: str = "product") -> List[Dict[str, Any]]:
    """-> list of {key: value} override dicts. mode: product | zip."""
    keys = list(sweep)
    if not keys:
        return [{}]
    if mode == "zip":
        n = len(sweep[keys[0]])
        if any(len(sweep[k]) != n for k in keys):
            raise ValueError("zip sweep requires equal-length value lists")
        combos = zip(*[sweep[k] for k in keys])
    else:
        combos = itertools.product(*[sweep[k] for k in keys])
    return [dict(zip(keys, c)) for c in combos]


def _run_name(i: int, overrides: Dict[str, Any]) -> str:
    parts = [f"{k.split('.')[-1]}={v}" for k, v in overrides.items()]
    return f"run{i}" + (("_" + "_".join(parts)) if parts else "")


def _best_metrics(exp_dir: Path) -> Dict[str, float]:
    """Pull the final reporter state (valid metrics of the best epoch)
    from the run's reporter dump, tolerating missing files."""
    for name in ("reporter.json", "RESULTS.json"):
        p = exp_dir / name
        if p.exists():
            try:
                return json.loads(p.read_text())
            except Exception:
                pass
    return {}


def multirun(task_cls, base_config: Dict[str, Any],
             sweep: Dict[str, List[Any]],
             output_dir, mode: str = "product",
             shard: int = 0, num_shards: int = 1,
             backend: str = "serial",
             num_workers: int = 2) -> List[Dict[str, Any]]:
    """Execute the sweep; returns one summary dict per run:
    {name, overrides, output_dir, metrics}. A `summary.json` is written
    under output_dir. shard/num_shards stride the run list so N hosts
    (bin/launch.py) can split one sweep."""
    out_root = Path(output_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    runs = expand_sweep(sweep, mode=mode)
    my_runs = list(enumerate(runs))[shard::num_shards]

    def one(item):
        i, overrides = item
        name = _run_name(i, overrides)
        cfg = json.loads(json.dumps(base_config))  # deep copy
        for k, v in overrides.items():
            _set_dotted(cfg, k, v)
        exp = out_root / name
        cfg["output_dir"] = str(exp)
        logger.info("multirun %s: %s", name, overrides)
        task_cls.main(cfg)
        return {"name": name, "overrides": overrides,
                "output_dir": str(exp), "metrics": _best_metrics(exp)}

    if backend == "thread":
        from espnet_tpu.parallel.eval import parallel_map
        results = parallel_map(one, my_runs, backend="thread",
                               num_workers=num_workers)
    else:
        results = [one(it) for it in my_runs]
    (out_root / f"summary_shard{shard}.json").write_text(
        json.dumps(results, indent=1, default=str))
    if num_shards == 1:
        (out_root / "summary.json").write_text(
            json.dumps(results, indent=1, default=str))
    return results


def main(argv=None):
    """CLI: python -m espnet_tpu.parallel.multirun --task asr
    --base config.yaml --output_dir exp/sweep -m optim_conf.lr=1e-3,1e-4
    """
    import argparse
    import sys

    from espnet_tpu.utils.config import load_yaml
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True)
    ap.add_argument("--base", required=True, help="base config YAML")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("-m", "--multirun", nargs="+", default=[],
                    help="key=v1,v2 sweep specs")
    ap.add_argument("--mode", default="product", choices=["product", "zip"])
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    args = ap.parse_args(argv if argv is not None else sys.argv[1:])
    from espnet_tpu.tasks.registry import TASKS
    task_cls = TASKS[args.task]
    logging.basicConfig(level=logging.INFO)
    multirun(task_cls, dict(load_yaml(args.base)),
             parse_sweep(args.multirun), args.output_dir, mode=args.mode,
             shard=args.shard, num_shards=args.num_shards)


if __name__ == "__main__":
    main()
