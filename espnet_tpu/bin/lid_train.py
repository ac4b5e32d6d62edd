"""lid_train CLI (contract: espnet2/bin/lid_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.spk import LIDTask


def main(argv=None):
    LIDTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
