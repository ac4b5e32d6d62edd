"""beats_train CLI (contract: espnet2/bin/beats_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.ssl import BeatsTask


def main(argv=None):
    BeatsTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
