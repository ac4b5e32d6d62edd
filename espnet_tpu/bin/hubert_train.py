"""hubert_train CLI (contract: espnet2/bin/hubert_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.ssl import HubertTask


def main(argv=None):
    HubertTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
