"""ASR training CLI (contract: espnet2/bin/asr_train.py:19).

Usage: python -m espnet_tpu.bin.asr_train --config conf/train.yaml \
           --output_dir exp/asr [--key value ...]
"""

import sys

from espnet_tpu.tasks.asr import ASRTask


def main(argv=None):
    ASRTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
