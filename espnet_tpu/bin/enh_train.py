"""enh_train CLI (contract: espnet2/bin/enh_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.enh import EnhancementTask


def main(argv=None):
    EnhancementTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
