"""GAN vocoder training CLI (contract: espnet2/bin/gan_tts_train.py,
specialized to vocoder training)."""

import sys

from espnet_tpu.tasks.gan_tts import GANVocoderTask


def main(argv=None):
    GANVocoderTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
