"""BK-tree fuzzy keyword index.

From-scratch implementation of the metric-tree keyword lookup the
reference uses for its credit-report corrector
(/root/reference/corrector/utils/BKtree.py:26-84).  Differences by design:

- Pure-Python Levenshtein (the C ``python-Levenshtein`` lib is a drop-in
  speedup, not a semantic; see SURVEY.md §7.0).
- Deterministic construction: the reference inserts keywords in Python
  ``set`` iteration order, which varies across processes with hash
  randomisation; since BFS discovery order can influence which candidate a
  downstream argmax tie-break picks, this engine ALWAYS inserts keywords in
  sorted order so every worker/actor builds the identical tree.

Intended use: built once per Ray actor in ``__init__`` (broadcast small
side, SURVEY.md §2.4 J2), probed per span.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional


def levenshtein(a: str, b: str) -> int:
    """Unit-cost Levenshtein distance (two-row DP)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i, ai in enumerate(a, 1):
        cur = [i]
        append = cur.append
        left = i          # cur[j-1]
        diag = prev[0]    # prev[j-1]
        for bj, pj in zip(b, prev[1:]):
            if ai == bj:
                d = diag
            else:
                d = diag + 1
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


class _Node:
    __slots__ = ("word", "children")

    def __init__(self, word: str):
        self.word = word
        # dist -> child node; dict preserves insertion order, which is
        # deterministic because insertion order is deterministic.
        self.children: Dict[int, "_Node"] = {}


class BKTree:
    """Metric tree over a keyword set keyed by edit distance.

    ``search(word, max_dist)`` returns all keywords within ``max_dist``
    in BFS discovery order (mirrors BKtree.py:49-72: FIFO queue, root
    first, children pruned by the triangle inequality).
    """

    def __init__(self, words: Iterable[str], dist_func: Callable[[str, str], int] = levenshtein):
        self.dist_func = dist_func
        self.root: Optional[_Node] = None
        self.words = sorted(set(words))
        for w in self.words:
            self._add(w)

    @classmethod
    def from_file(cls, path: str, dist_func: Callable[[str, str], int] = levenshtein) -> "BKTree":
        with open(path, encoding="utf-8") as f:
            words = [line.strip() for line in f if line.strip()]
        return cls(words, dist_func)

    def _add(self, word: str) -> None:
        if self.root is None:
            self.root = _Node(word)
            return
        curr = self.root
        dist = self.dist_func(word, curr.word)
        while dist in curr.children:
            curr = curr.children[dist]
            dist = self.dist_func(word, curr.word)
        curr.children[dist] = _Node(word)

    def search(self, word: str, max_dist: int) -> List[str]:
        if self.root is None:
            return []
        queue = [self.root]
        found: List[str] = []
        dist_func = self.dist_func
        head = 0
        while head < len(queue):
            node = queue[head]
            head += 1
            dist = dist_func(node.word, word)
            if dist <= max_dist:
                found.append(node.word)
            lo, hi = dist - max_dist, dist + max_dist
            for child_dist, child in node.children.items():
                if lo <= child_dist <= hi:
                    queue.append(child)
        return found
