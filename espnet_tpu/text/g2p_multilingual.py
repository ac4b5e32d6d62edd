"""Multilingual rule-based G2P backends.

Behavioral contract: espnet2/text/phoneme_tokenizer.py g2p_choices —
the reference registers 60+ external backends (espeak-ng phonemizers,
pyopenjtalk, g2pk, ...) none of which are installable offline. For
languages with (near-)transparent orthographies the mapping is a rule
system, so these are ORIGINAL in-repo implementations, not wrappers:

- spanish / italian / finnish / german: contextual digraph + letter
  rules producing IPA-ish phone strings
- korean_jamo: pure unicode Hangul syllable -> jamo decomposition
  (the reference's `korean_jamo` choice is the same arithmetic)
- japanese_romaji: romaji -> mora phones (CV splitting, geminates,
  long vowels) — a pyopenjtalk-free path for romanized input

Each g2p(text) -> list of phones with " " word separators, matching
text/phoneme.py g2p_english's output convention.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

# ---------------------------------------------------------------------------
# generic contextual rewriter
# ---------------------------------------------------------------------------


def _apply_rules(word: str, rules: List[Tuple[str, str]],
                 default: Dict[str, str]) -> List[str]:
    """Longest-match left-to-right rewrite: `rules` are (pattern,
    phones) tried in order at each position (pattern is a regex anchored
    at the position); fall back to per-letter `default` map."""
    out: List[str] = []
    i = 0
    compiled = [(re.compile(p), ph) for p, ph in rules]
    while i < len(word):
        for pat, ph in compiled:
            m = pat.match(word, i)
            if m:
                if ph:
                    out.extend(ph.split())
                i = m.end()
                break
        else:
            ch = word[i]
            ph = default.get(ch)
            if ph:
                out.extend(ph.split())
            i += 1
    return out


_ES_RULES = [
    (r"ch", "tʃ"), (r"ll", "ʝ"), (r"rr", "r"), (r"qu(?=[ei])", "k"),
    (r"gu(?=[ei])", "g"), (r"gü(?=[ei])", "g w"),
    (r"c(?=[eiéí])", "θ"), (r"g(?=[eiéí])", "x"),
    (r"^r", "r"), (r"h", ""), (r"ñ", "ɲ"), (r"j", "x"),
    (r"z", "θ"), (r"v", "b"), (r"y$", "i"), (r"y", "ʝ"),
    (r"á", "a"), (r"é", "e"), (r"í", "i"), (r"ó", "o"), (r"ú", "u"),
    (r"ü", "u"),
]
_ES_DEFAULT = {c: c for c in "abcdefgiklmnopqrstuwx"}
_ES_DEFAULT.update({"c": "k", "r": "ɾ"})

_IT_RULES = [
    (r"sch(?=[ei])", "s k"), (r"sc(?=[ei])", "ʃ"),
    (r"ch(?=[ei])", "k"), (r"gh(?=[ei])", "g"),
    (r"c(?=[ei])", "tʃ"), (r"g(?=[ei])", "dʒ"),
    (r"gli", "ʎ i"), (r"gn", "ɲ"), (r"z", "ts"), (r"h", ""),
    (r"à", "a"), (r"è", "ɛ"), (r"é", "e"), (r"ì", "i"), (r"ò", "ɔ"),
    (r"ó", "o"), (r"ù", "u"),
]
_IT_DEFAULT = {c: c for c in "abdefgiklmnopqrstuv"}
_IT_DEFAULT.update({"c": "k"})

_DE_RULES = [
    (r"sch", "ʃ"), (r"tsch", "tʃ"), (r"ch(?=[ei])", "ç"), (r"ch", "x"),
    (r"ck", "k"), (r"ei", "aɪ"), (r"ie", "iː"), (r"eu", "ɔʏ"),
    (r"äu", "ɔʏ"), (r"au", "aʊ"), (r"sp(?=\w)", "ʃ p"),
    (r"st(?=\w)", "ʃ t"), (r"ß", "s"), (r"w", "v"), (r"z", "ts"),
    (r"v", "f"), (r"j", "j"), (r"qu", "k v"),
    (r"ä", "ɛ"), (r"ö", "ø"), (r"ü", "y"),
    (r"b$", "p"), (r"d$", "t"), (r"g$", "k"),   # final devoicing
    (r"h(?<=\wh)", ""),
]
_DE_DEFAULT = {c: c for c in "abdefghiklmnoprstu"}
_DE_DEFAULT.update({"c": "k", "y": "y", "x": "k s"})

# Finnish: essentially 1:1; doubled letters = long (mark with ː)
_FI_RULES = [
    (r"([aeiouyäö])\1", r""), (r"ng", "ŋ"), (r"([kpt])\1", ""),
    (r"ä", "æ"), (r"ö", "ø"), (r"y", "y"),
]
_FI_DEFAULT = {c: c for c in "abdefghijklmnoprstuv"}
_FI_DEFAULT["ː"] = "ː"


def _make_latin_g2p(rules, default, doubles_long=False):
    def g2p(text: str) -> List[str]:
        out: List[str] = []
        for w in re.findall(r"[^\W\d_]+", text.lower(), re.UNICODE):
            if doubles_long:
                # collapse doubled letters into letter + length mark
                w2 = re.sub(r"([a-zäöy])\1", r"\1ː", w)
            else:
                w2 = w
            phones = _apply_rules(w2, rules, default)
            if phones:
                if out:
                    out.append(" ")
                out.extend(phones)
        return out

    return g2p


g2p_spanish = _make_latin_g2p(_ES_RULES, _ES_DEFAULT)
g2p_italian = _make_latin_g2p(_IT_RULES, _IT_DEFAULT)
g2p_german = _make_latin_g2p(_DE_RULES, _DE_DEFAULT)
g2p_finnish = _make_latin_g2p(_FI_RULES, _FI_DEFAULT, doubles_long=True)


# ---------------------------------------------------------------------------
# Korean jamo (unicode arithmetic — the reference 'korean_jamo' choice)
# ---------------------------------------------------------------------------

_CHOSEONG = ["ᄀ", "ᄁ", "ᄂ", "ᄃ", "ᄄ", "ᄅ", "ᄆ", "ᄇ", "ᄈ", "ᄉ",
             "ᄊ", "ᄋ", "ᄌ", "ᄍ", "ᄎ", "ᄏ", "ᄐ", "ᄑ", "ᄒ"]
_JUNGSEONG = ["ᅡ", "ᅢ", "ᅣ", "ᅤ", "ᅥ", "ᅦ", "ᅧ", "ᅨ", "ᅩ", "ᅪ",
              "ᅫ", "ᅬ", "ᅭ", "ᅮ", "ᅯ", "ᅰ", "ᅱ", "ᅲ", "ᅳ", "ᅴ",
              "ᅵ"]
_JONGSEONG = ["", "ᆨ", "ᆩ", "ᆪ", "ᆫ", "ᆬ", "ᆭ", "ᆮ", "ᆯ", "ᆰ",
              "ᆱ", "ᆲ", "ᆳ", "ᆴ", "ᆵ", "ᆶ", "ᆷ", "ᆸ", "ᆹ", "ᆺ",
              "ᆻ", "ᆼ", "ᆽ", "ᆾ", "ᆿ", "ᇀ", "ᇁ", "ᇂ"]


def g2p_korean_jamo(text: str) -> List[str]:
    """Hangul syllables -> conjoining jamo phones; other chars pass
    through per character. Words separated by ' '."""
    out: List[str] = []
    for w in text.split():
        phones: List[str] = []
        for ch in w:
            code = ord(ch)
            if 0xAC00 <= code <= 0xD7A3:
                idx = code - 0xAC00
                cho = idx // (21 * 28)
                jung = (idx % (21 * 28)) // 28
                jong = idx % 28
                phones.append(_CHOSEONG[cho])
                phones.append(_JUNGSEONG[jung])
                if jong:
                    phones.append(_JONGSEONG[jong])
            else:
                phones.append(ch)
        if phones:
            if out:
                out.append(" ")
            out.extend(phones)
    return out


# ---------------------------------------------------------------------------
# Japanese romaji -> mora phones
# ---------------------------------------------------------------------------

_ROMAJI_DIGRAPHS = ["kya", "kyu", "kyo", "sha", "shu", "sho", "cha",
                    "chu", "cho", "nya", "nyu", "nyo", "hya", "hyu",
                    "hyo", "mya", "myu", "myo", "rya", "ryu", "ryo",
                    "gya", "gyu", "gyo", "ja", "ju", "jo", "bya", "byu",
                    "byo", "pya", "pyu", "pyo", "shi", "chi", "tsu",
                    "fu"]
_ROMAJI_MAP = {d: (d[:-1] + " " + d[-1] if len(d) == 3
                   and d not in ("shi", "chi", "tsu")
                   else {"shi": "sh i", "chi": "ch i", "tsu": "ts u",
                         "fu": "f u"}.get(d, d))
               for d in _ROMAJI_DIGRAPHS}


def g2p_japanese_romaji(text: str) -> List[str]:
    """Romaji text -> mora-ish phone list: consonant+vowel splitting,
    geminate 'Q' for doubled consonants, moraic 'N' for syllable-final
    n, long-vowel mark for doubled vowels."""
    out: List[str] = []
    for w in re.findall(r"[a-z']+", text.lower()):
        phones: List[str] = []
        i = 0
        while i < len(w):
            # geminate: doubled consonant
            if (i + 1 < len(w) and w[i] == w[i + 1]
                    and w[i] not in "aeioun"):
                phones.append("Q")
                i += 1
                continue
            matched = False
            for L in (3, 2):
                seg = w[i:i + L]
                if seg in _ROMAJI_MAP:
                    phones.extend(_ROMAJI_MAP[seg].split())
                    i += L
                    matched = True
                    break
            if matched:
                continue
            ch = w[i]
            if ch == "n" and (i + 1 >= len(w)
                              or w[i + 1] not in "aeiouy"):
                phones.append("N")
            elif ch in "aeiou":
                if phones and phones[-1] == ch:
                    phones[-1] = ch + "ː"
                else:
                    phones.append(ch)
            elif ch == "'":
                pass
            else:
                phones.append(ch)
            i += 1
        if phones:
            if out:
                out.append(" ")
            out.extend(phones)
    return out


G2P_BACKENDS = {
    "spanish": g2p_spanish,
    "italian": g2p_italian,
    "german": g2p_german,
    "finnish": g2p_finnish,
    "korean_jamo": g2p_korean_jamo,
    "japanese_romaji": g2p_japanese_romaji,
}
