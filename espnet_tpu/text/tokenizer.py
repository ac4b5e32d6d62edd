"""Tokenizers + token-id conversion.

Behavioral contract: espnet2/text/ — `build_tokenizer` choices
char/word/bpe (sentencepiece)/phn, `TokenIDConverter`
(espnet2/text/token_id_converter.py: unk fallback), `TextCleaner`.
sentencepiece is not in this image, so BPE loads sentencepiece .vocab
or .model via a pure-Python reader when available and otherwise raises a
clear error; char/word cover the test recipes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, List, Union


class CharTokenizer:
    """Char tokenizer (espnet2/text/char_tokenizer.py behavior):
    space -> <space> token, non-linguistic symbols kept whole."""

    def __init__(self, non_linguistic_symbols: Iterable[str] = (),
                 space_symbol: str = "<space>",
                 remove_non_linguistic_symbols: bool = False):
        self.space_symbol = space_symbol
        self.non_linguistic_symbols = set(non_linguistic_symbols)
        self.remove_non_linguistic_symbols = remove_non_linguistic_symbols

    def text2tokens(self, line: str) -> List[str]:
        tokens = []
        while line:
            for w in self.non_linguistic_symbols:
                if line.startswith(w):
                    if not self.remove_non_linguistic_symbols:
                        tokens.append(w)
                    line = line[len(w):]
                    break
            else:
                t = line[0]
                tokens.append(self.space_symbol if t == " " else t)
                line = line[1:]
        return tokens

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return "".join(" " if t == self.space_symbol else t for t in tokens)


class WordTokenizer:
    """Whitespace tokenizer (espnet2/text/word_tokenizer.py)."""

    def __init__(self, delimiter: str | None = None,
                 non_linguistic_symbols: Iterable[str] = (),
                 remove_non_linguistic_symbols: bool = False):
        self.delimiter = delimiter
        self.non_linguistic_symbols = set(non_linguistic_symbols)
        self.remove = remove_non_linguistic_symbols

    def text2tokens(self, line: str) -> List[str]:
        toks = line.split(self.delimiter)
        if self.remove:
            toks = [t for t in toks if t not in self.non_linguistic_symbols]
        return [t for t in toks if t]

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return (self.delimiter or " ").join(tokens)


class SentencepiecesTokenizer:
    """BPE via sentencepiece if importable (espnet2/text/
    sentencepiece_tokenizer.py); clear error otherwise."""

    def __init__(self, model: Union[Path, str]):
        try:
            import sentencepiece as spm
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "sentencepiece is not available in this environment; "
                "use char/word tokenization or install sentencepiece") from e
        self.sp = spm.SentencePieceProcessor()
        self.sp.load(str(model))

    def text2tokens(self, line: str) -> List[str]:
        return self.sp.EncodeAsPieces(line)

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return self.sp.DecodePieces(list(tokens))


class HuggingFaceTokenizer:
    """HuggingFace tokenizers (espnet2/text/hugging_face_tokenizer.py
    behavior): wraps a local `tokenizers`/`transformers` tokenizer file
    or directory. This environment has no network, so only local files
    are accepted (`local_files_only`); a hub name raises a clear error
    instead of hanging on a download."""

    def __init__(self, model: Union[Path, str]):
        p = Path(model)
        try:
            if p.is_file() and p.suffix == ".json":
                # a raw `tokenizers` JSON file
                from transformers import PreTrainedTokenizerFast
                self.tokenizer = PreTrainedTokenizerFast(
                    tokenizer_file=str(p))
            else:
                from transformers import AutoTokenizer
                self.tokenizer = AutoTokenizer.from_pretrained(
                    str(model), local_files_only=True)
        except Exception as e:
            raise RuntimeError(
                f"could not load a local HuggingFace tokenizer from "
                f"{model!r} (offline environment: hub names are not "
                f"downloadable; pass a local tokenizer.json or a saved "
                f"tokenizer directory)") from e

    def text2tokens(self, line: str) -> List[str]:
        return self.tokenizer.tokenize(line)

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return self.tokenizer.convert_tokens_to_string(
            list(tokens)).strip()


def build_tokenizer(token_type: str, bpemodel=None, delimiter=None,
                    space_symbol: str = "<space>",
                    non_linguistic_symbols: Iterable[str] = (),
                    remove_non_linguistic_symbols: bool = False,
                    g2p_type=None):
    """espnet2/text/build_tokenizer.py registry equivalent."""
    if token_type == "char":
        return CharTokenizer(non_linguistic_symbols, space_symbol,
                             remove_non_linguistic_symbols)
    if token_type == "word":
        return WordTokenizer(delimiter, non_linguistic_symbols,
                             remove_non_linguistic_symbols)
    if token_type == "bpe":
        return SentencepiecesTokenizer(bpemodel)
    if token_type in ("hugging_face", "whisper"):
        # whisper's multilingual tokenizer is distributed as HF files;
        # both resolve to the same local-file wrapper here
        return HuggingFaceTokenizer(bpemodel)
    if token_type == "phn":
        from espnet_tpu.text.phoneme import PhonemeTokenizer
        return PhonemeTokenizer(g2p_type=g2p_type,
                                non_linguistic_symbols=non_linguistic_symbols,
                                space_symbol=space_symbol)
    raise ValueError(f"unsupported token_type: {token_type}")


class TokenIDConverter:
    """token list <-> id (espnet2/text/token_id_converter.py: OOV -> <unk>)."""

    def __init__(self, token_list: Union[Path, str, List[str]],
                 unk_symbol: str = "<unk>"):
        if isinstance(token_list, (Path, str)):
            token_list = [line.rstrip("\n").split(maxsplit=1)[0] if line.strip()
                          else line.rstrip("\n")
                          for line in Path(token_list).read_text(
                              encoding="utf-8").splitlines()]
            token_list = [t for t in token_list if t]
        self.token_list = list(token_list)
        self.token2id = {t: i for i, t in enumerate(self.token_list)}
        if len(self.token2id) != len(self.token_list):
            raise RuntimeError("duplicated tokens in token_list")
        self.unk_symbol = unk_symbol

    def get_num_vocabulary_size(self) -> int:
        return len(self.token_list)

    def ids2tokens(self, ids) -> List[str]:
        return [self.token_list[int(i)] for i in ids]

    def tokens2ids(self, tokens: Iterable[str]) -> List[int]:
        if self.unk_symbol not in self.token2id:
            unk = None
        else:
            unk = self.token2id[self.unk_symbol]
        out = []
        for t in tokens:
            if t in self.token2id:
                out.append(self.token2id[t])
            elif unk is not None:
                out.append(unk)
            else:
                raise RuntimeError(f"OOV token {t!r} and no {self.unk_symbol}")
        return out


_ABBREVIATIONS = {
    "mrs": "misess", "mr": "mister", "dr": "doctor", "st": "saint",
    "co": "company", "jr": "junior", "maj": "major", "gen": "general",
    "drs": "doctors", "rev": "reverend", "lt": "lieutenant",
    "hon": "honorable", "sgt": "sergeant", "capt": "captain",
    "esq": "esquire", "ltd": "limited", "col": "colonel", "ft": "fort",
}

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen",
         "fourteen", "fifteen", "sixteen", "seventeen", "eighteen",
         "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty",
         "seventy", "eighty", "ninety"]


def _num_to_words(n: int) -> str:
    """Integer -> English words (the tacotron cleaner's
    number-normalization role, original recursive implementation)."""
    if n < 0:
        return "minus " + _num_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t = _TENS[n // 10]
        return t if n % 10 == 0 else f"{t} {_ONES[n % 10]}"
    for div, name in ((10 ** 9, "billion"), (10 ** 6, "million"),
                      (10 ** 3, "thousand"), (100, "hundred")):
        if n >= div:
            head = _num_to_words(n // div) + " " + name
            return head if n % div == 0 else \
                f"{head} {_num_to_words(n % div)}"
    return _ONES[0]


def tacotron_clean(text: str) -> str:
    """English tacotron cleaner (espnet2 uses tacotron_cleaner/cleaners.py:
    lowercase, expand abbreviations and numbers, collapse whitespace —
    same normalization contract, original implementation)."""
    import re
    text = text.lower()
    text = re.sub(r"([a-z]+)\.", lambda m: _ABBREVIATIONS.get(
        m.group(1), m.group(0)), text)
    text = re.sub(r"\$(\d+)", lambda m: m.group(1) + " dollars", text)
    text = re.sub(r"(\d+)%", lambda m: m.group(1) + " percent", text)
    text = re.sub(r"\d+", lambda m: _num_to_words(int(m.group(0))), text)
    text = re.sub(r"[^a-z' .,?!-]", " ", text)
    return " ".join(text.split())


class TextCleaner:
    """Text cleaner chain (espnet2/text/cleaner.py registry role).
    Supported: lower/upper/whitespace primitives + the 'tacotron'
    English normalizer (abbreviation + number expansion)."""

    def __init__(self, cleaner_types=None):
        if cleaner_types is None:
            cleaner_types = []
        elif isinstance(cleaner_types, str):
            cleaner_types = [cleaner_types]
        self.cleaner_types = cleaner_types

    def __call__(self, text: str) -> str:
        for t in self.cleaner_types:
            if t == "lower":
                text = text.lower()
            elif t == "upper":
                text = text.upper()
            elif t == "whitespace":
                text = " ".join(text.split())
            elif t == "tacotron":
                text = tacotron_clean(text)
            else:
                raise RuntimeError(f"unsupported cleaner: {t}")
        return text
