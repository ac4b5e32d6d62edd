"""Language-ID inference (contract: espnet2/bin/lid_inference.py):
single-label classification over languages via ClassifySpeech."""

import sys

from espnet_tpu.bin.cls_inference import ClassifySpeech, main  # noqa: F401

if __name__ == "__main__":
    main(sys.argv[1:])
