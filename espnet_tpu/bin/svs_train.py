"""svs_train CLI (contract: espnet2/bin/svs_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.svs import SVSTask


def main(argv=None):
    SVSTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
