"""Anti-spoofing inference (contract: espnet2/bin/asvspoof_inference.py):
binary spoof/bonafide classification via ClassifySpeech."""

import sys

from espnet_tpu.bin.cls_inference import ClassifySpeech, main  # noqa: F401

if __name__ == "__main__":
    main(sys.argv[1:])
