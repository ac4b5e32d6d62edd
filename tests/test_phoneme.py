"""Phoneme tokenizer / rule-based English g2p tests
(espnet2/text/phoneme_tokenizer.py contract)."""

import numpy as np
import pytest


def test_g2p_english_basic_words():
    from espnet_tpu.text.phoneme import g2p_english
    cases = {
        "cat": ["K", "AE1", "T"],
        "dog": ["D", "AO1", "G"],
        "speech": ["S", "P", "IY1", "CH"],
        "hello": ["HH", "EH1", "L", "OW1"],
        "sing": ["S", "IH1", "NG"],
        "the": ["DH", "AH0"],
        "phone": ["F", "OW1", "N"],
    }
    for word, want in cases.items():
        got = g2p_english(word)
        assert got == want, (word, got, want)


def test_g2p_deterministic_and_covers_sentences():
    from espnet_tpu.text.phoneme import PhonemeTokenizer
    pt = PhonemeTokenizer("english_rule")
    s = "the quick brown fox jumps over the lazy dog"
    toks = pt.text2tokens(s)
    assert toks == pt.text2tokens(s)
    # words separated by <space>, all symbols are ARPAbet-ish
    assert toks.count("<space>") == 8
    for t in toks:
        assert t == "<space>" or t.rstrip("012").isalpha()


def test_phoneme_tokenizer_no_space_and_lexicon(tmp_path):
    from espnet_tpu.text.phoneme import PhonemeTokenizer
    pt = PhonemeTokenizer("g2p_en_no_space")
    assert "<space>" not in pt.text2tokens("two words")
    lex = tmp_path / "dict.txt"
    lex.write_text("ZORP Z AO1 R P\n")
    pl = PhonemeTokenizer(f"lexicon:{lex}")
    assert pl.text2tokens("zorp")[:4] == ["Z", "AO1", "R", "P"]
    with pytest.raises(ImportError):
        PhonemeTokenizer("pyopenjtalk")


def test_build_tokenizer_phn_and_preprocessor():
    from espnet_tpu.data.preprocessor import CommonPreprocessor
    from espnet_tpu.text.tokenizer import build_tokenizer
    tok = build_tokenizer("phn", g2p_type="english_rule")
    phones = tok.text2tokens("red sun")
    token_list = ["<blank>", "<unk>"] + sorted(set(phones)) + ["<sos/eos>"]
    pre = CommonPreprocessor(train=False, token_type="phn",
                             token_list=token_list,
                             g2p_type="english_rule")
    out = pre("utt1", {"text": "red sun"})
    ids = out["text"]
    assert ids.dtype.kind == "i" and len(ids) == len(phones)
    assert all(i > 1 for i in ids)  # no <unk>


def test_tacotron_cleaner_numbers_and_abbreviations():
    """'tacotron' cleaner (espnet2 TextCleaner registry): lowercase,
    abbreviation + number/currency expansion, whitespace collapse."""
    from espnet_tpu.text.tokenizer import TextCleaner
    c = TextCleaner("tacotron")
    assert c("Dr. Smith paid $20.") == "doctor smith paid twenty dollars."
    assert c("It is 1999!") == \
        "it is one thousand nine hundred ninety nine!"
    assert c("Mr.  Jones   & co.") == "mister jones company"
    assert TextCleaner(["lower", "whitespace"])("A  B") == "a b"
