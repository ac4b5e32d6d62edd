"""slu_train CLI (contract: espnet2/bin/slu_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.misc import SLUTask


def main(argv=None):
    SLUTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
