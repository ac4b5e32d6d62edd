"""gan_tts_train CLI (contract: espnet2/bin/gan_tts_train.py — thin
`GANTTSTask.main` wrapper; VITS end-to-end adversarial training)."""

import sys

from espnet_tpu.tasks.gan_tts import GANTTSTask


def main(argv=None):
    GANTTSTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
