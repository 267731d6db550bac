"""Character-shape similarity primitives (FASPell-style).

From-scratch re-implementation of the decision semantics of the
reference's char-similarity module (all citations into
/root/reference/corrector/utils/char_sim.py):

- ``edit_distance``        : char_sim.py:57-98   (Levenshtein + 'Canonical'
                             substitution-cost-2 variant)
- ``CharMeta`` loader      : char_sim.py:334-346 (TSV: code_point, char,
                             pronunciation, decompositions...)
- ``decompose_text``       : char_sim.py:313-331 (concat FIRST decomposition
                             of each char; unknown chars silently skipped)
- ``shape_similarity``     : char_sim.py:237-275 (1 - ED/maxlen over
                             IDC-safe-encoded concatenated decompositions)
- ``shape_distance``       : char_sim.py:119-168 (min ED over all
                             decomposition pairs)
- ``pronunciation_*``      : char_sim.py:172-205, 277-311 (including the
                             reference's asymmetric 'null' check quirk)
- ``string_to_tree``       : char_sim.py:349-402 (IDS string -> bracket tree)

The implementation here is independent: plain two-row DP (not the
reference's full numpy matrix), dict-based metadata, and an optional
memo cache for hot pair lookups used by the Ray actor stages.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

# 12 ideographic description characters (U+2FF0..U+2FFB) and their arity.
IDCS: Dict[str, int] = {
    "⿰": 2, "⿱": 2, "⿲": 3, "⿳": 3,
    "⿴": 2, "⿵": 2, "⿶": 2, "⿷": 2,
    "⿸": 2, "⿹": 2, "⿺": 2, "⿻": 2,
}

# IDC -> ASCII letter substitution ("safe" encoding).  The mapping skips 'K'
# exactly as the reference does (char_sim.py:106-117); since it is a
# bijection over characters appearing in decompositions, edit distances are
# unchanged — kept for bit-for-bit parity of intermediate strings.
SAFE: Dict[str, str] = {
    "⿰": "A", "⿱": "B", "⿲": "C", "⿳": "D",
    "⿴": "E", "⿵": "F", "⿶": "G", "⿷": "H",
    "⿸": "I", "⿹": "J", "⿺": "L", "⿻": "M",
}


def _edit_distance_np(a: Sequence[str], b: Sequence[str], sub_cost: int) -> int:
    """Row-vectorized DP for LONG inputs (decomposition strings routinely
    reach dozens of components): the ``cur[j-1]+1`` chain resolves as a
    prefix-min after subtracting the column index, so each row is a handful
    of numpy kernels instead of ``len(b)`` Python iterations.  Identical
    recurrence (and outputs) to the scalar loop below."""
    import numpy as np

    B = np.array(list(b))
    lb = len(b)
    idx = np.arange(1, lb + 1)
    pad0 = np.array([0])
    prev = np.arange(lb + 1)
    for i, ai in enumerate(a, 1):
        cost = np.where(B == ai, 0, sub_cost)
        t = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        # cur[j] = min(t[j], cur[j-1]+1)  <=>  (cur-j) = running min of (t-j)
        w = np.minimum.accumulate(np.concatenate(([i], t - idx)))
        prev = w + np.concatenate((pad0, idx))
    return int(prev[-1])


def edit_distance(a: Sequence[str], b: Sequence[str], name: str = "Levenshtein") -> int:
    """Edit distance between two sequences.

    ``name='Levenshtein'`` is classic unit-cost Levenshtein;
    ``name='Canonical'`` charges 2 for substitution (char_sim.py:90-96).
    Accepts strings or lists of strings (the reference's doctests use both).
    """
    la, lb = len(a), len(b)
    if la == 0:
        return lb  # pure insertions: substitution cost never applies
    if lb == 0:
        return la
    sub_cost = 1 if name == "Levenshtein" else 2
    if la * lb >= 6400:  # measured crossover (~80x80); numpy wins beyond
        return _edit_distance_np(a, b, sub_cost)
    prev = list(range(lb + 1))
    for i, ai in enumerate(a, 1):
        cur = [i]
        append = cur.append
        left = i          # cur[j-1]
        diag = prev[0]    # prev[j-1]
        for bj, pj in zip(b, prev[1:]):
            if ai == bj:
                d = diag
                t = pj + 1
                if t < d:
                    d = t
                t = left + 1
                if t < d:
                    d = t
            else:
                d = diag + sub_cost
                t = pj + 1
                if t < d:
                    d = t
                t = left + 1
                if t < d:
                    d = t
            append(d)
            left = d
            diag = pj
        prev = cur
    return prev[lb]


def safe_encode_string(decomp: str) -> str:
    """Per-character IDC -> ASCII substitution (char_sim.py:249-256)."""
    return "".join(SAFE.get(c, c) for c in decomp)


def load_char_meta_tsv(path: str) -> Dict[str, dict]:
    """Load a char-meta TSV (same format the reference consumes,
    char_sim.py:334-346): ``code_point \\t char \\t pronunciation \\t
    decomposition [\\t decomposition ...]``."""
    data: Dict[str, dict] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            items = line.rstrip("\n").split("\t")
            if len(items) < 4:
                continue
            char = items[1]
            if char in data:
                raise ValueError(f"duplicate char in char meta: {char!r}")
            data[char] = {
                "code_point": items[0],
                "pronunciation": items[2],
                "decompositions": items[3:],
            }
    return data


class CharMeta:
    """Character metadata + similarity functions.

    ``data``: dict char -> {code_point, pronunciation, decompositions}.
    Designed to be built once per Ray actor (``__init__`` of the corrector
    stage) and probed per batch; ``shape_similarity`` results are memoised
    because candidate/origin pairs repeat heavily across a corpus.
    """

    def __init__(self, data: Dict[str, dict], memoize: bool = True):
        self.data = data
        self._memo: Dict[Tuple[str, str], float] = {} if memoize else None
        # SAFE-encoded FIRST decomposition per char, computed once at actor
        # init: shape_similarity misses then do two dict probes + one DP
        # instead of re-decomposing and re-encoding per call.  SAFE is a
        # 1:1 per-char substitution, so len(encoded) == len(decomposition)
        # and the reference's denominator is unchanged.
        self._enc: Dict[str, str] = {
            ch: safe_encode_string(m["decompositions"][0]) for ch, m in data.items()
        }

    @classmethod
    def from_tsv(cls, path: str) -> "CharMeta":
        return cls(load_char_meta_tsv(path))

    @classmethod
    def from_arrow(cls, table) -> "CharMeta":
        """Build from a pyarrow Table with columns
        (code_point, char, pronunciation, decompositions:list<string>)."""
        data: Dict[str, dict] = {}
        cps = table.column("code_point").to_pylist()
        chars = table.column("char").to_pylist()
        prons = table.column("pronunciation").to_pylist()
        decs = table.column("decompositions").to_pylist()
        for cp, ch, pr, de in zip(cps, chars, prons, decs):
            data[ch] = {"code_point": cp, "pronunciation": pr, "decompositions": list(de)}
        return cls(data)

    # -- decomposition ----------------------------------------------------
    def decompose_text(self, text: str) -> str:
        """Concatenate the FIRST decomposition of every char; chars absent
        from the table are silently skipped (char_sim.py:327-328)."""
        parts: List[str] = []
        data = self.data
        for t in text:
            meta = data.get(t)
            if meta is None:
                continue
            parts.append(meta["decompositions"][0])
        return "".join(parts)

    # -- similarity -------------------------------------------------------
    def shape_similarity(self, s1: str, s2: str) -> float:
        """``1 - ED(safe(dec1), safe(dec2)) / max(len(dec1), len(dec2))``
        over concatenated first decompositions (char_sim.py:237-275).
        Raises ZeroDivisionError when both decompositions are empty, exactly
        like the reference (callers rely on per-row error containment)."""
        if self._memo is not None:
            key = (s1, s2)
            v = self._memo.get(key)
            if v is not None:
                return v
        enc = self._enc
        # single-char inputs are the hot case (LM candidate vs origin char)
        e1 = (enc.get(s1, "") if len(s1) == 1
              else "".join(e for e in (enc.get(t) for t in s1) if e is not None))
        e2 = (enc.get(s2, "") if len(s2) == 1
              else "".join(e for e in (enc.get(t) for t in s2) if e is not None))
        ed = edit_distance(e1, e2)
        sim = max(0.0, 1 - ed / max(len(e1), len(e2)))
        if self._memo is not None:
            self._memo[key] = sim
        return sim

    def shape_distance(self, char1: str, char2: str) -> int:
        """Min edit distance over all decomposition pairs
        (char_sim.py:119-168, string mode)."""
        decomps1 = self.data[char1]["decompositions"]
        decomps2 = self.data[char2]["decompositions"]
        best = None
        for d1 in decomps1:
            for d2 in decomps2:
                ed = edit_distance(safe_encode_string(d1), safe_encode_string(d2))
                if best is None or ed < best:
                    best = ed
        return best

    def similarity(
        self, char1: str, char2: str, weights=(1.0, 0.0, 0.0)
    ) -> float:
        """Weighted combination of shape and pronunciation similarity
        (char_sim.py:218-235; the frequency term is constant-zero there
        because char_dict values are initialised to 0 — reproduced)."""
        shape_w, sound_w, freq_w = weights
        if char1 not in self.data or char2 not in self.data:
            return 0.0
        shape_sim = self.shape_similarity(char1, char2)
        sound_sim = self.pronunciation_similarity(char1, char2)
        # reference computes 1.0 - |f1 - f2| / max_freq with all char_dict
        # frequencies initialised to 0, which evaluates to 1.0 exactly
        freq_sim = 1.0
        return shape_sim * shape_w + sound_sim * sound_w + freq_sim * freq_w

    # -- pronunciation ----------------------------------------------------
    def pronunciation_similarity(self, char1: str, char2: str) -> float:
        """Per-language best-pair match averaged over languages
        (char_sim.py:277-311).  The first operand's 'null' test checks only
        its first character while the second checks the whole string — a
        reference quirk preserved deliberately."""
        p1 = self.data[char1]["pronunciation"]
        p2 = self.data[char2]["pronunciation"]
        if p1[0] == "null" or p2 == "null":
            return 0.0
        sim_total, count = 0.0, 0
        for lan1, lan2 in zip(p1.split(";"), p2.split(";")):
            if lan1 == "null" or lan2 == "null":
                continue
            best = 0.0
            for a in lan1.split(","):
                for b in lan2.split(","):
                    best = max(best, 1 - edit_distance(a, b) / max(len(a), len(b)))
            sim_total += best
            count += 1
        return sim_total / count if count else 0.0

    def pronunciation_distance(self, char1: str, char2: str) -> float:
        """char_sim.py:172-205 (same language zip + 'null' quirk).

        Raises ``ZeroDivisionError`` when no language pair is comparable,
        mirroring the reference's uncontained division — returning 0.0
        here would report the pair as maximally CLOSE, the wrong-direction
        default for anyone enabling sound-weighted distances."""
        p1 = self.data[char1]["pronunciation"]
        p2 = self.data[char2]["pronunciation"]
        if p1[0] == "null" or p2 == "null":
            return 0.0
        dist_total, count = 0.0, 0
        for lan1, lan2 in zip(p1.split(";"), p2.split(";")):
            if lan1 == "null" or lan2 == "null":
                continue
            best = None
            for a in lan1.split(","):
                for b in lan2.split(","):
                    d = edit_distance(a, b)
                    if best is None or d < best:
                        best = d
            dist_total += best
            count += 1
        return dist_total / count


def string_to_tree(string: str) -> str:
    """Convert an IDS decomposition string to the bracketed tree form used
    by APTED (char_sim.py:349-402).  Pure re-implementation driven by the
    reference's doctest vectors."""
    if string[0] in IDCS and len(string) != 1:
        bracket_stack: List[str] = []
        tree: List[str] = []
        just_put_global = "{"
        for c in string:
            tree.append(c)
            if c in IDCS:
                if just_put_global == "}":
                    raise ValueError(f"invalid IDS string: {string!r}")
                if IDCS[c] == 2:
                    bracket_stack.extend(["}", "{", "}"])
                else:
                    bracket_stack.extend(["}", "{", "}", "{", "}"])
                tree.append("{")
                just_put_global = "{"
            else:
                just_put = ""
                while just_put != "{" and bracket_stack:
                    just_put = bracket_stack.pop()
                    tree.append(just_put)
                just_put_global = just_put
        res = "".join(tree)
        if not res.endswith("}"):
            raise ValueError(f"invalid IDS string: {string!r}")
    else:
        if not (len(string) == 1 or string == "null"):
            raise ValueError(f"invalid IDS string: {string!r}")
        res = string[0]
    return "{" + res + "}"
