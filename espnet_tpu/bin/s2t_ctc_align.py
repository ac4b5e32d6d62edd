"""OWSM CTC alignment (contract: espnet2/bin/s2t_ctc_align.py): forced
alignment of a transcript against S2T CTC posteriors — delegates to the
shared CTC-segmentation machinery (bin/asr_align.py)."""

import sys

from espnet_tpu.bin.asr_align import CTCSegmentation, main  # noqa: F401

if __name__ == "__main__":
    main(sys.argv[1:])
