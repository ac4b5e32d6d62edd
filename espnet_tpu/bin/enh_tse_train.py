"""enh_tse_train CLI (contract: espnet2/bin/enh_tse_train.py — thin
`EnhTSETask.main` wrapper)."""

import sys

from espnet_tpu.tasks.enh import EnhTSETask


def main(argv=None):
    EnhTSETask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
