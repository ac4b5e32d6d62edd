"""st_train CLI (contract: espnet2/bin/st_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.st import STTask


def main(argv=None):
    STTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
