"""Export a HuggingFace tokenizer's vocabulary as a token_list file
(contract: espnet2/bin/hugging_face_export_vocabulary.py — one token
per line, index = token id, for building ASR/LM configs around an HF
tokenizer). Offline: only local tokenizer files/dirs are accepted."""

from __future__ import annotations

import sys
from pathlib import Path


def export_vocabulary(output: str, model: str, add_symbols=()):
    """Write the id-ordered vocab of a local HF tokenizer to `output`.
    `add_symbols` entries are appended after the HF vocab (the
    reference prepends/appends task specials the same way)."""
    from espnet_tpu.text.tokenizer import HuggingFaceTokenizer
    tok = HuggingFaceTokenizer(model).tokenizer
    vocab = tok.get_vocab()                      # token -> id
    inv = [None] * (max(vocab.values()) + 1)
    for t, i in vocab.items():
        inv[i] = t
    lines = [t if t is not None else f"<unused_{i}>"
             for i, t in enumerate(inv)]
    lines += list(add_symbols)
    out = Path(output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return len(lines)


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    n = export_vocabulary(**kw)
    print(f"wrote {n} tokens")


if __name__ == "__main__":
    main()
