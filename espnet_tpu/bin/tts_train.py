"""TTS training CLI (contract: espnet2/bin/tts_train.py)."""

import sys

from espnet_tpu.tasks.tts import TTSTask


def main(argv=None):
    TTSTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
