"""asr_transducer_train CLI (contract: espnet2/bin/asr_transducer_train.py — thin `Task.main` wrapper)."""

import sys

from espnet_tpu.tasks.asr_transducer import ASRTransducerTask


def main(argv=None):
    ASRTransducerTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
