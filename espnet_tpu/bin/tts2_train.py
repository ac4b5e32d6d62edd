"""tts2_train CLI (contract: espnet2/bin/tts2_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.tts2 import TTS2Task


def main(argv=None):
    TTS2Task.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
