"""Character-class predicates.

Semantics match the reference's compiled char classes
(/root/reference/corrector/base_corrector.py:121-247):

- ``alphabet``   : ASCII + fullwidth Latin letters  ``[a-zA-ZＡ-Ｚａ-ｚ]``
- ``chinese``    : CJK unified range                 ``[一-龥]``
- ``number``     : ASCII digits                      ``[0-9]``
- ``traditional``: a ~3k-char traditional-Chinese blacklist.  The reference
  embeds the set as one giant regex char class; this engine stores the same
  character SET (deduplicated, sorted) as a data file and tests membership
  of the candidate's first character, which is equivalent to the
  reference's anchored ``re.match`` on a char class
  (bert_corrector.py:105-106, single-char candidates).
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

from .. import DATA_DIR

ALPHABET_RE = re.compile(r"[a-zA-ZＡ-Ｚａ-ｚ]")
CHINESE_RE = re.compile(r"[一-龥]")
NUMBER_RE = re.compile(r"[0-9]")

_TRAD_PATH = os.path.join(DATA_DIR, "traditional_chars.txt")


@lru_cache(maxsize=1)
def traditional_set() -> frozenset:
    with open(_TRAD_PATH, encoding="utf-8") as f:
        return frozenset(f.read().strip())


def has_alphabet(text: str) -> bool:
    return ALPHABET_RE.search(text) is not None


def count_chinese(text: str) -> int:
    return len(CHINESE_RE.findall(text))


def is_number_char(c: str) -> bool:
    return bool(c) and NUMBER_RE.match(c) is not None


def starts_traditional(text: str) -> bool:
    """Equivalent of ``re.match(traditional_class, text)``: membership of
    the first character in the blacklist."""
    return bool(text) and text[0] in traditional_set()
