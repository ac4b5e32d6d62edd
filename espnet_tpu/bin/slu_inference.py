"""SLU inference (contract: espnet2/bin/slu_inference.py
Speech2Understand): intent/slots are decoded as token streams by the
same hybrid beam search as ASR."""

import sys

from espnet_tpu.bin.asr_inference import Speech2Text, inference  # noqa: F401

Speech2Understand = Speech2Text


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**kw)


if __name__ == "__main__":
    main()
