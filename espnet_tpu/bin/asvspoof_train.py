"""asvspoof_train CLI (contract: espnet2/bin/asvspoof_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.misc import ASVSpoofTask


def main(argv=None):
    ASVSpoofTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
