"""cls_train CLI (contract: espnet2/bin/cls_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.spk import ClassificationTask


def main(argv=None):
    ClassificationTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
