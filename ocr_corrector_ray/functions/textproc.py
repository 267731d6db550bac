"""Per-span text decision functions (pure, shared by the serial oracle and
the Ray actor stages).

Each function re-states one reference behavior (citations into
/root/reference/corrector/):

- ``find_err_pos``            : base_corrector.py:109-119  (strict ``<``)
- ``base_correct_filter``     : base_corrector.py:96-106   (>=2 CJK chars)
- ``lm_correct_filter``       : bert_corrector.py:81-93    (no Latin letters,
                                >=3 CJK, len <= max_seq_length-2)
- ``normalize_digits``        : bert_corrector.py:37-42    (1:1 digit ->
                                Chinese-numeral substitution, preserves
                                char positions)
- ``regulation``              : keyword_corrector.py:124-146
- ``check_lm_candidate``      : bert_corrector.py:95-107
- acceptance curves           : bert_corrector.py:122-149  (FASPell curves)
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

from . import regexes

DEFAULT_PROB_THRESHOLD = 0.9
DEFAULT_MAX_SEQ_LENGTH = 64

DIGIT_TO_NUMERAL = {
    "1": "一", "2": "二", "3": "三", "4": "四", "5": "五",
    "6": "六", "7": "七", "8": "八", "9": "九", "0": "零",
}
_DIGIT_RE = re.compile("[0-9]")


def find_err_pos(probs: Sequence[float], threshold: float = DEFAULT_PROB_THRESHOLD) -> List[int]:
    """Positions whose confidence is strictly below ``threshold``."""
    if not probs:
        return []
    return [i for i, p in enumerate(probs) if p < threshold]


def base_correct_filter(text: str) -> bool:
    """True when the span is eligible for keyword correction."""
    return regexes.count_chinese(text) >= 2


def lm_correct_filter(text: str, max_seq_length: int = DEFAULT_MAX_SEQ_LENGTH) -> bool:
    """True when the span is eligible for LM correction."""
    if regexes.has_alphabet(text):
        return False
    if regexes.count_chinese(text) < 3:
        return False
    if len(text) > max_seq_length - 2:
        return False
    return True


def normalize_digits(text: str) -> str:
    """Replace ASCII digits with Chinese numerals (1:1, keeps positions)."""
    return _DIGIT_RE.sub(lambda m: DIGIT_TO_NUMERAL[m.group(0)], text)


def regulation(text: str, errors: Sequence[int]) -> Tuple[str, str]:
    """Build the structural regex + error-char string for keyword matching:
    ``('宋还本全', [0, 3]) -> ('^(.)还本(.)$', '宋全')``."""
    reg = list(text)
    error_chars = []
    for err in errors:
        reg[err] = "(.)"
        error_chars.append(text[err])
    return "^" + "".join(reg) + "$", "".join(error_chars)


def check_lm_candidate(original: str, corrected_to: str) -> bool:
    """Candidate admissibility: rejects ``[UNK]``, wordpiece continuations,
    length mismatches, Latin letters and traditional-blacklist chars."""
    if corrected_to == "[UNK]":
        return False
    if "#" in corrected_to:
        return False
    if len(corrected_to) != len(original):
        return False
    if regexes.has_alphabet(corrected_to):
        return False
    if regexes.starts_traditional(corrected_to):
        return False
    return True


def curve_null(confidence: float, similarity: float) -> bool:
    return True


def curve_full(confidence: float, similarity: float) -> bool:
    return False


def curve_02(confidence: float, similarity: float) -> bool:
    """FASPell confidence x similarity decision curve
    (https://www.aclweb.org/anthology/D19-5522/)."""
    return (
        confidence + similarity - 1 >= 0
        and confidence - 0.05 >= 0
        and similarity - 0.4 >= 0
    )


CURVES = {"null": curve_null, "full": curve_full, "02": curve_02}
