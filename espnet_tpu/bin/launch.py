"""Multi-host launch generator (contract: espnet2/bin/launch.py:91 —
expand one training command into per-host processes over ssh or a slurm
batch script; the TPU-native rendezvous is `jax.distributed.initialize`
via --launch_conf instead of torch's init_method).

Each generated process runs the SAME command plus:
    --launch_conf coordinator_address=HOST0:PORT \
                  num_processes=N process_id=i
which espnet_tpu/parallel/launch.py:init_distributed consumes. On TPU
pods the JAX runtime discovers these automatically, so launch.py is for
DCN-connected CPU/GPU hosts or explicit multi-host CPU testing.

Modes:
  --host a,b,c      ssh: one process per host (writes launch_<i>.sh and,
                    unless --dry_run, execs `ssh host bash script`)
  --slurm           emit a single sbatch script using SLURM_PROCID
  (default)         local: N processes on this host (testing)
"""

from __future__ import annotations

import argparse
import logging
import shlex
import subprocess
import sys
from pathlib import Path
from typing import List

logger = logging.getLogger(__name__)


def build_commands(cmd: List[str], hosts: List[str], port: int,
                   log_dir: Path) -> List[dict]:
    """-> [{host, process_id, argv, script}] — one entry per process."""
    n = len(hosts)
    coord = f"{hosts[0]}:{port}"
    out = []
    for i, h in enumerate(hosts):
        argv = list(cmd) + [
            "--launch_conf",
            f"coordinator_address={coord}",
            f"num_processes={n}",
            f"process_id={i}",
        ]
        script = log_dir / f"launch_{i}.sh"
        out.append({"host": h, "process_id": i, "argv": argv,
                    "script": script})
    return out


def write_scripts(cmds: List[dict], log_dir: Path, envfile=None) -> None:
    log_dir.mkdir(parents=True, exist_ok=True)
    for c in cmds:
        body = ["#!/usr/bin/env bash", "set -euo pipefail"]
        if envfile:
            body.append(f"source {envfile}")
        body.append(f"cd {shlex.quote(str(Path.cwd()))}")
        body.append(" ".join(shlex.quote(a) for a in c["argv"])
                    + f" > {log_dir}/proc{c['process_id']}.log 2>&1")
        Path(c["script"]).write_text("\n".join(body) + "\n",
                                     encoding="utf-8")
        Path(c["script"]).chmod(0o755)


def write_sbatch(cmd: List[str], num_nodes: int, port: int,
                 log_dir: Path, envfile=None,
                 slurm_opts: str = "") -> Path:
    """One sbatch script: rank/coordinator from SLURM env (the
    reference's slurm path, launch.py srun mode)."""
    log_dir.mkdir(parents=True, exist_ok=True)
    sh = log_dir / "launch.sbatch"
    inner = " ".join(shlex.quote(a) for a in cmd) + (
        " --launch_conf"
        f" coordinator_address=$MASTER_ADDR:{port}"
        " num_processes=$SLURM_NTASKS process_id=$SLURM_PROCID")
    body = [
        "#!/usr/bin/env bash",
        f"#SBATCH --nodes={num_nodes}",
        "#SBATCH --ntasks-per-node=1",
        f"#SBATCH --output={log_dir}/slurm-%j.log",
    ]
    if slurm_opts:
        body += [f"#SBATCH {o}" for o in slurm_opts.split(";") if o]
    if envfile:
        body.append(f"source {envfile}")
    body += [
        "export MASTER_ADDR=$(scontrol show hostnames "
        "$SLURM_JOB_NODELIST | head -n1)",
        f"srun {inner}",
    ]
    sh.write_text("\n".join(body) + "\n", encoding="utf-8")
    return sh


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cmd", required=True,
                    help="training command, e.g. 'python -m "
                         "espnet_tpu.bin.asr_train --config c.yaml'")
    ap.add_argument("--host", default=None,
                    help="comma-separated ssh hosts (host1,host2,...)")
    ap.add_argument("--slurm", action="store_true")
    ap.add_argument("--num_nodes", type=int, default=1)
    ap.add_argument("--port", type=int, default=12355)
    ap.add_argument("--log_dir", default="exp/launch")
    ap.add_argument("--envfile", default=None)
    ap.add_argument("--slurm_opts", default="",
                    help="';'-separated extra #SBATCH options")
    ap.add_argument("--dry_run", action="store_true",
                    help="generate scripts only, do not execute")
    args = ap.parse_args(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(level=logging.INFO)
    cmd = shlex.split(args.cmd)
    log_dir = Path(args.log_dir)

    if args.slurm:
        sh = write_sbatch(cmd, args.num_nodes, args.port, log_dir,
                          args.envfile, args.slurm_opts)
        logger.info("wrote %s — submit with: sbatch %s", sh, sh)
        if not args.dry_run:
            subprocess.run(["sbatch", str(sh)], check=True)
        return sh

    hosts = (args.host.split(",") if args.host
             else ["localhost"] * args.num_nodes)
    cmds = build_commands(cmd, hosts, args.port, log_dir)
    write_scripts(cmds, log_dir, args.envfile)
    logger.info("wrote %d launch scripts under %s", len(cmds), log_dir)
    if args.dry_run:
        return [c["script"] for c in cmds]
    procs = []
    for c in cmds:
        if args.host:
            p = subprocess.Popen(["ssh", c["host"], "bash",
                                  str(c["script"])])
        else:
            p = subprocess.Popen(["bash", str(c["script"])])
        procs.append(p)
    rc = [p.wait() for p in procs]
    if any(rc):
        raise RuntimeError(f"launch failed, return codes {rc}")
    return [c["script"] for c in cmds]


if __name__ == "__main__":
    main()
