"""Text front-end: g2p processors + Chinese NSW normalization.

Parity targets (AaronZ345/StyleSinger):
- processor registry (``data_gen/tts/txt_processors/base_text_processor.py``)
- zh: pypinyin initials/finals + tone5 + rule-based normalizer
  (``txt_processors/zh.py:29-44``, ``utils/text_norm.py``).  Re-designed
  self-contained: a longest-prefix pinyin syllable splitter replaces
  pypinyin's initial/final tables (pypinyin itself is only needed for raw
  hanzi input and is loaded lazily when present);
- en: g2p_en (``txt_processors/en.py:44-80``); without the CMU dict in the
  image, a deterministic letter-to-sound fallback keeps the pipeline
  runnable (ARPAbet-ish units), and g2p_en is used when importable.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple, Type

REGISTERED_TEXT_PROCESSORS: Dict[str, Type] = {}


def register_txt_processors(name: str):
    def wrap(cls):
        REGISTERED_TEXT_PROCESSORS[name] = cls
        return cls
    return wrap


def get_txt_processor_cls(name: str):
    return REGISTERED_TEXT_PROCESSORS[name]


class BaseTxtProcessor:
    @staticmethod
    def sp_phonemes() -> List[str]:
        return ["|"]

    @classmethod
    def process(cls, txt: str) -> Tuple[List[str], str]:
        """text -> (phoneme list, normalized text)."""
        raise NotImplementedError


# ---------------------------------------------------------------------------
# zh: pinyin initial/final splitting (pypinyin-free for pinyin input)
# ---------------------------------------------------------------------------

# standard pinyin initials, longest first for prefix matching
_INITIALS = ["zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l",
             "g", "k", "h", "j", "q", "x", "r", "z", "c", "s", "y", "w"]

def split_pinyin(syllable: str) -> List[str]:
    """'xiao' -> ['x', 'iao']; 'ang' -> ['ang']; keeps trailing tone digit
    on the final ('hao3' -> ['h', 'ao3'])."""
    s = syllable.strip().lower()
    if not s:
        return []
    for ini in _INITIALS:
        if s.startswith(ini) and len(s) > len(ini):
            return [ini, s[len(ini):]]
    return [s]


# full NSW engine (dates, money, phones, fractions, percent, digit
# strings — the reference's complete utils/text_norm.py rule set)
from stylesinger_tpu.text_norm_zh import (  # noqa: E402
    NSWNormalizer, hanzi_to_num, num_to_hanzi,
)


def normalize_zh(text: str) -> str:
    """Full NSW normalization, punctuation preserved (the zh g2p pipeline
    strips it separately — reference txt_processors/zh.py:15-26)."""
    return NSWNormalizer(text).normalize(remove_punc=False)


@register_txt_processors("zh")
class ZhTxtProcessor(BaseTxtProcessor):
    """Accepts space-separated pinyin directly; raw hanzi goes through
    pypinyin when available."""

    @classmethod
    def process(cls, txt: str) -> Tuple[List[str], str]:
        txt = normalize_zh(txt.strip())
        if re.search(r"[一-鿿]", txt):
            try:
                from pypinyin import Style, pinyin  # type: ignore
                sylls = [p[0] for p in pinyin(txt, style=Style.TONE3,
                                              neutral_tone_with_five=True)]
            except ImportError:
                raise RuntimeError(
                    "raw hanzi input needs pypinyin; pass pinyin directly")
            txt = " ".join(sylls)
        phs: List[str] = []
        for syll in txt.split():
            if syll in ("AP", "SP", "|", "<AP>", "<SP>"):
                phs.append(syll)
                continue
            phs.extend(split_pinyin(syll))
        return phs, txt


# ---------------------------------------------------------------------------
# en
# ---------------------------------------------------------------------------

_EN_DIGRAPHS = {"ch": "CH", "sh": "SH", "th": "TH", "ph": "F", "ng": "NG",
                "qu": "K W", "ck": "K", "wh": "W", "ee": "IY", "oo": "UW",
                "ea": "IY", "ai": "EY", "ay": "EY", "ou": "AW", "ow": "OW"}
_EN_SINGLE = {"a": "AE", "b": "B", "c": "K", "d": "D", "e": "EH", "f": "F",
              "g": "G", "h": "HH", "i": "IH", "j": "JH", "k": "K", "l": "L",
              "m": "M", "n": "N", "o": "AA", "p": "P", "q": "K", "r": "R",
              "s": "S", "t": "T", "u": "AH", "v": "V", "w": "W", "x": "K S",
              "y": "Y", "z": "Z"}


def _letter_to_sound(word: str) -> List[str]:
    phs: List[str] = []
    i = 0
    w = word.lower()
    while i < len(w):
        if i + 1 < len(w) and w[i: i + 2] in _EN_DIGRAPHS:
            phs.extend(_EN_DIGRAPHS[w[i: i + 2]].split())
            i += 2
        elif w[i] in _EN_SINGLE:
            phs.extend(_EN_SINGLE[w[i]].split())
            i += 1
        else:
            i += 1
    return phs


@register_txt_processors("en")
class EnTxtProcessor(BaseTxtProcessor):
    @classmethod
    def process(cls, txt: str) -> Tuple[List[str], str]:
        txt = re.sub(r"[^ a-zA-Z'.,?!\-]", "", txt.strip()).lower()
        try:
            from g2p_en import G2p  # type: ignore
            g2p = G2p()
            phs = [p for p in g2p(txt) if p.strip()]
        except ImportError:
            phs = []
            for word in txt.split():
                word = word.strip(".,?!-'")
                if word:
                    phs.extend(_letter_to_sound(word))
                    phs.append("|")
            if phs and phs[-1] == "|":
                phs.pop()
        return phs, txt
