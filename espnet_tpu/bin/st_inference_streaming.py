"""Streaming speech translation (contract:
espnet2/bin/st_inference_streaming.py): the ST model shares the hybrid
architecture, so the streaming ASR machinery (chunked encoder + block-
synchronous beam) drives it unchanged."""

import sys

from espnet_tpu.bin.asr_inference_streaming import (  # noqa: F401
    Speech2TextStreaming, StreamingSessionPool)


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    Speech2TextStreaming(**kw)


if __name__ == "__main__":
    main()
