"""lightning_train CLI (espnet2/bin/lightning_train.py:95-144 role).

The reference launches any task through Lightning with a strategy
choice (DDPStrategy / FSDPStrategy, bf16 precision, N devices). The
TPU-native equivalent is one device mesh: `--strategy ddp` is
data-parallel sharding, `--strategy fsdp` additionally ZeRO-shards
params and optimizer state over the 'fsdp' axis, and `--precision
bf16-mixed` maps to the mixed-precision train step. Everything else is
the task's own config, passed through unchanged:

    python -m espnet_tpu.bin.lightning_train --task asr \
        --strategy fsdp --devices 8 --precision bf16-mixed \
        --config conf/train.yaml [--key value ...]
"""

from __future__ import annotations

import sys

from espnet_tpu.tasks.registry import TASKS
from espnet_tpu.utils.config import parse_cli_overrides


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    args = parse_cli_overrides(argv)
    task = args.pop("task", None)
    if task not in TASKS:
        raise SystemExit(
            f"--task must be one of {sorted(TASKS.keys())}, got {task!r}")
    strategy = str(args.pop("strategy", "ddp")).lower()
    devices = int(args.pop("devices", 0) or 0)
    precision = str(args.pop("precision", "32"))
    if strategy not in ("ddp", "fsdp", "auto", "single"):
        raise SystemExit(f"unknown strategy {strategy!r}")
    if strategy in ("ddp", "fsdp"):
        args.setdefault("use_mesh", True)
        mesh_conf = dict(args.get("mesh_conf") or {})
        if strategy == "fsdp":
            args.setdefault("fsdp", True)
            if devices:
                mesh_conf.setdefault("n_fsdp", max(devices // 2, 1))
                mesh_conf.setdefault("n_data",
                                     devices // mesh_conf["n_fsdp"])
        elif devices:
            mesh_conf.setdefault("n_data", devices)
        if mesh_conf:
            args["mesh_conf"] = mesh_conf
    if precision.startswith(("bf16", "bfloat16", "16")):
        args.setdefault("train_dtype", "bfloat16")
    TASKS[task].main(args)


if __name__ == "__main__":
    main()
