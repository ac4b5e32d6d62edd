"""Export a whisper tokenizer vocabulary (contract: espnet2/bin/
whisper_export_vocabulary.py). Whisper's multilingual tokenizer is
distributed as HF tokenizer files; this delegates to the shared local
HF exporter (offline: pass a local tokenizer dir/file)."""

from __future__ import annotations

import sys

from espnet_tpu.bin.hugging_face_export_vocabulary import \
    export_vocabulary


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    n = export_vocabulary(**kw)
    print(f"wrote {n} tokens")


if __name__ == "__main__":
    main()
