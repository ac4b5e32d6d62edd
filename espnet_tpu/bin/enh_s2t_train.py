"""enh_s2t_train CLI (contract: espnet2/bin/enh_s2t_train.py — thin
`EnhS2TTask.main` wrapper)."""

import sys

from espnet_tpu.tasks.enh import EnhS2TTask


def main(argv=None):
    EnhS2TTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
