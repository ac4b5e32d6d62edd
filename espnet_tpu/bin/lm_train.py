"""LM training CLI (contract: espnet2/bin/lm_train.py)."""

import sys

from espnet_tpu.tasks.lm import LMTask


def main(argv=None):
    LMTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
