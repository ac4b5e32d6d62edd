"""Speech-translation inference (contract: espnet2/bin/st_inference.py
Speech2Text): the ST model is the hybrid attention architecture over
target-language tokens, so the ASR Speech2Text machinery decodes it."""

import sys

from espnet_tpu.bin.asr_inference import Speech2Text, inference  # noqa: F401


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**kw)


if __name__ == "__main__":
    main()
