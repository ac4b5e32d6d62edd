"""Split scp files for parallel (nj) processing (contract:
espnet2/bin/split_scps.py; delegates to parallel/launch.split_scps)."""

import sys

from espnet_tpu.parallel.launch import split_scps  # noqa: F401


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    paths = split_scps(kw["scp"], int(kw["num_jobs"]), kw["outdir"])
    for p in paths:
        print(p)


if __name__ == "__main__":
    main()
