"""speechlm_train CLI (contract: espnet2/speechlm/bin/train.py — thin
`SpeechLMTask.main` wrapper)."""

import sys

from espnet_tpu.tasks.speechlm import SpeechLMTask


def main(argv=None):
    SpeechLMTask.main(argv=argv if argv is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
