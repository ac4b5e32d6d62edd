"""Corpus tokenization + token-list building
(contract: espnet2/bin/tokenize_text.py — recipe stage 5: tokenize a
'key text' corpus and emit the vocabulary with special symbols)."""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

from espnet_tpu.text.tokenizer import build_tokenizer
from espnet_tpu.utils.config import parse_cli_overrides


def tokenize_text(input, output=None, token_type: str = "char",
                  bpemodel=None, write_vocabulary: bool = False,
                  vocabulary_size: int = 0, cutoff: int = 0,
                  add_symbol=("<blank>:0", "<unk>:1", "<sos/eos>:-1"),
                  field=None, delimiter=None):
    """Tokenize `input` ('key text' lines or raw text with field=None).

    With write_vocabulary=True, `output` receives the sorted token list
    (specials spliced at their :positions); otherwise tokenized lines.
    """
    tok = build_tokenizer(token_type, bpemodel=bpemodel, delimiter=delimiter)
    counter: Counter = Counter()
    out_lines = []
    for line in Path(input).read_text(encoding="utf-8").splitlines():
        if field == "2-" or field is None and " " in line:
            key, text = (line.split(maxsplit=1) + [""])[:2]
        else:
            key, text = None, line
        tokens = tok.text2tokens(text)
        counter.update(tokens)
        out_lines.append(((key + " ") if key else "") + " ".join(tokens))
    if write_vocabulary:
        vocab = [t for t, c in counter.most_common() if c > cutoff]
        if vocabulary_size > 0:
            vocab = vocab[:vocabulary_size]
        vocab.sort()
        specials = []
        for spec in add_symbol:
            sym, pos = spec.rsplit(":", 1)
            specials.append((int(pos), sym))
        for pos, sym in sorted(specials, key=lambda x: x[0] if x[0] >= 0
                               else 10 ** 9):
            if pos >= 0:
                vocab.insert(pos, sym)
            else:
                vocab.insert(len(vocab) + pos + 1, sym)
        result = vocab
    else:
        result = out_lines
    if output:
        Path(output).parent.mkdir(parents=True, exist_ok=True)
        Path(output).write_text("\n".join(result) + "\n", encoding="utf-8")
    return result


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    tokenize_text(**args)


if __name__ == "__main__":
    main()
