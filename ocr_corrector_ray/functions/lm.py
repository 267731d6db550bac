"""Candidate language models.

The reference scores masked positions with a fine-tuned Chinese BERT whose
checkpoint is an external download and is unavailable by design
(/root/reference/README.md:69-74).  This module defines the scorer
*contract* (``find_topn_candidates(sentences, error_positions) ->
[[[(char, confidence)]]]`` — per sentence, per error position, top-n sorted
descending, mirroring masked_lm.py:400-447 and the top-k at
masked_lm.py:76-77) and ships a **deterministic synthetic backend** used by
both the serial oracle and the Ray pipeline, so exact span-sequence
equality is testable without model weights.

The synthetic model is a pure function of (digit-normalised sentence,
error position): batch composition can never change its output — unlike
the reference's per-batch max-error padding (masked_lm.py:233-234), which
is output-neutral there and must stay output-neutral here.

It also reproduces the reference's mask-vs-keep branch
(masked_lm.py:285-302): with <= 3 errors the error chars are masked and the
model predicts replacements; with > 3 errors the original char is kept in
the input, so the model's top candidate echoes the input char.

A real-BERT backend can be plugged in by implementing ``CandidateModel``.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence, Tuple

Candidate = Tuple[str, float]

MASK_ERROR_LIMIT = 3  # masked_lm.py:293: <=3 errors -> [MASK], else keep


_MASK64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (splitmix64) — derives independent
    streams from one digest without re-hashing."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


def _pos_seed(sent: str, pos: int) -> int:
    """One md5 per (sentence, position); all per-candidate randomness is
    derived from it via splitmix64 (PYTHONHASHSEED-independent, stable
    across processes and nodes — and ~10x cheaper than hashing per salt)."""
    h = hashlib.md5(f"{sent}\x1f{pos}".encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big")


def _unit(seed: int, salt: int) -> float:
    # _splitmix64(seed ^ salt*C) inlined — this runs ~6x per candidate
    # position in the hot path and the call overhead was measurable
    x = ((seed ^ (salt * 0xA24BAED4963EE407)) + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return (x ^ (x >> 31)) / 2**64


class CandidateModel:
    """Scorer contract (masked_lm.py:400-412)."""

    topn: int = 3

    def find_topn_candidates(
        self, sentences: Sequence[str], error_positions: Sequence[Sequence[int]]
    ) -> List[List[List[Candidate]]]:
        raise NotImplementedError


class SyntheticLM(CandidateModel):
    """Deterministic confusion-table LM.

    ``confusion_rev``: wrong-char -> list of plausible corrections (the
    reverse of the corpus confusion table, sorted for determinism).
    ``inventory``: closed character inventory used for filler candidates.

    Confidence scheme (chosen to exercise every branch of the acceptance
    logic, FIXTURES.md §6):
      * correction candidate: conf = 0.05 + 0.9*u  (sometimes fails the
        curve_02 sum test when u is small)
      * echo candidate (>3-error keep branch): conf = 0.5 + 0.49*u
      * fillers: conf < 0.05 (always curve-rejected) and occasionally
        '[UNK]' / '##piece' / ASCII / multi-char to exercise
        check_lm_candidate rejections.
    """

    def __init__(
        self,
        confusion_rev: Dict[str, List[str]],
        inventory: Sequence[str],
        topn: int = 3,
    ):
        self.confusion_rev = {k: sorted(v) for k, v in confusion_rev.items()}
        self.inventory = sorted(set(inventory))
        self.topn = topn

    def _candidates_for(self, sent: str, pos: int, n_errors: int) -> List[Candidate]:
        ch = sent[pos] if 0 <= pos < len(sent) else ""
        seed = _pos_seed(sent, pos)
        u0 = _unit(seed, 0)
        u1 = _unit(seed, 1)
        cands: List[Candidate] = []

        if n_errors > MASK_ERROR_LIMIT and ch:
            # keep-branch: model sees the original char and echoes it.
            cands.append((ch, 0.5 + 0.49 * u0))

        rights = self.confusion_rev.get(ch)
        if rights:
            pick = rights[int(u0 * len(rights)) % len(rights)]
            cands.append((pick, 0.05 + 0.9 * u1))

        # fillers: low-confidence noise, some inadmissible by construction.
        inv = self.inventory
        k = 0
        while len(cands) < self.topn:
            uk = _unit(seed, 10 + k)
            conf = 0.049 * _unit(seed, 20 + k)
            if uk < 0.06:
                cand = "[UNK]"
            elif uk < 0.12:
                cand = "##" + inv[int(uk * 1e6) % len(inv)]
            elif uk < 0.18:
                cand = "x"
            elif uk < 0.24 and ch:
                cand = ch  # duplicate of the original -> skipped upstream
            else:
                cand = inv[int(uk * 1e9) % len(inv)]
            cands.append((cand, conf))
            k += 1

        cands.sort(key=lambda t: -t[1])
        return cands[: self.topn]

    def find_topn_candidates(
        self, sentences: Sequence[str], error_positions: Sequence[Sequence[int]]
    ) -> List[List[List[Candidate]]]:
        result = []
        for sent, errs in zip(sentences, error_positions):
            errs = list(errs)
            result.append([self._candidates_for(sent, e, len(errs)) for e in errs])
        return result
