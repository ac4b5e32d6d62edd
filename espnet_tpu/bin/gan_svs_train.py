"""gan_svs_train CLI (contract: espnet2/bin/gan_svs_train.py — thin
`GANSVSTask.main` wrapper; two optimizers via the GANTrainer spine)."""

import sys

from espnet_tpu.tasks.svs import GANSVSTask


def main(argv=None):
    GANSVSTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
