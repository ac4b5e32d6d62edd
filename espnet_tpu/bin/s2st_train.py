"""s2st_train CLI (contract: espnet2/bin/s2st_train.py — thin
`S2STTask.main` wrapper)."""

import sys

from espnet_tpu.tasks.s2st import S2STTask


def main(argv=None):
    S2STTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
