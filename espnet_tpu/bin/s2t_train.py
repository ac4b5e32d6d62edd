"""s2t_train CLI (contract: espnet2/bin/s2t_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.misc import S2TTask


def main(argv=None):
    S2TTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
