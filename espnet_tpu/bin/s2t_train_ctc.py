"""s2t_train_ctc CLI (contract: espnet2/bin/s2t_train_ctc.py — thin
`S2TCTCTask.main` wrapper; OWSM-CTC encoder-only training)."""

import sys

from espnet_tpu.tasks.misc import S2TCTCTask


def main(argv=None):
    S2TCTCTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
