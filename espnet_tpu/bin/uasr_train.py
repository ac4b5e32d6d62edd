"""uasr_train CLI (contract: espnet2/bin/uasr_train.py — thin
`UASRTask.main` wrapper)."""

import sys

from espnet_tpu.tasks.uasr import UASRTask


def main(argv=None):
    UASRTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
