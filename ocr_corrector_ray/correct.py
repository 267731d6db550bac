"""Correction core: configuration, shared per-actor resources, and the
per-text correction functions used by the Ray actor stages.

The decision logic is a from-scratch restatement of the reference's two
correctors (citations into /root/reference/corrector/):

- keyword path : keyword_corrector.py:43-108 (exact-set skip -> BK-tree
  search with distance = #errors capped at len-1 -> structural regex
  filter -> shape-similarity argmax -> threshold -> substitution;
  per-text exception => original text returned)
- LM path      : bert_corrector.py:27-78 (digit normalisation for the model
  input only, per-error candidate scan with digit skip, admissibility
  check, confidence x similarity curve; per-text exception => original
  text returned)

Per-row error containment is part of the conformance surface
(SURVEY.md §1.2): a poison span must never kill a batch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from . import DATA_DIR
from .functions import textproc
from .functions.bktree import BKTree
from .functions.charsim import CharMeta
from .functions.extract import extract_span
from .functions.lm import CandidateModel, SyntheticLM  # noqa: F401 (CandidateModel re-exported)
from .functions.regexes import is_number_char


@dataclass
class CorrectorConfig:
    """Mirrors the reference's per-biz_type config surface
    (config/config.json:1-21; keyword_corrector.py:20-31;
    masked_lm.py:29-43)."""

    prob_threshold: float = 0.9
    kw_similarity_threshold: float = 0.55
    topn: int = 3
    max_seq_length: int = 64
    curve: str = "02"
    # "synthetic": hash-derived confusion-table LM (default; cheap, exact
    # goldens).  "scorer": the full tokenize/frame/mask/score harness with
    # the deterministic random-projection network (model/scorer.py) — the
    # path a real BERT backend plugs into.
    lm_backend: str = "synthetic"
    lm_batch_size: int = 16
    keywords_file: str = os.path.join(DATA_DIR, "keywords_credit_report.txt")
    # detector for spans WITHOUT recogniser confidences:
    #   "all"  — every position suspect (the reference's probs=None branch;
    #            default, conformance surface)
    #   "lm"   — per-character likelihoods from the detector network over a
    #            sliding context window; the lowest-likelihood chars
    #            (bottom lm_detect_quantile, capped at 3 so the masked
    #            branch applies) are flagged
    nonprob_detector: str = "all"
    lm_detect_quantile: float = 0.2

    @property
    def effective_prob_threshold(self) -> float:
        """The detection threshold quantised to float32: stored probs are
        float32 (FIXTURES.md §1), so a recogniser confidence of exactly
        0.9 round-trips to 0.89999997... — comparing against the same-
        quantised threshold keeps the reference's strict-< semantics
        (prob 0.9 is NOT suspicious) instead of flipping clean chars.
        Cached: this is read once per span in the hot path."""
        v = self.__dict__.get("_eff_thr")
        if v is None or self.__dict__.get("_eff_thr_src") != self.prob_threshold:
            import numpy as np

            v = float(np.float32(self.prob_threshold))
            self.__dict__["_eff_thr"] = v
            self.__dict__["_eff_thr_src"] = self.prob_threshold
        return v


class CorrectorResources:
    """Everything a corrector actor loads ONCE in ``__init__``: the
    char-meta similarity table, the BK-tree + keyword set, and the
    candidate LM (SURVEY.md §2.3 ST1-ST4)."""

    def __init__(
        self,
        char_meta: CharMeta,
        keywords: Sequence[str],
        lm: CandidateModel,
        detector=None,
    ):
        self.char_meta = char_meta
        self.keywords_list = sorted(set(keywords))
        self.keywords = set(self.keywords_list)
        self.bktree = BKTree(self.keywords_list)
        self.lm = lm
        self._detector = detector  # built lazily when nonprob_detector="lm"

    def detector(self):
        if self._detector is None:
            from .model.detector import LikelihoodDetector

            self._detector = LikelihoodDetector()
        return self._detector


import re as _re


def correct_keyword_text(
    text: str,
    err_positions: Sequence[int],
    res: CorrectorResources,
    cfg: CorrectorConfig,
) -> str:
    """Correct one span via the keyword/BK-tree path; returns the original
    text on any internal error (containment, keyword_corrector.py:102-106)."""
    try:
        if text in res.keywords:
            return text
        err = list(err_positions)
        distance = len(err)
        if distance == len(text):
            distance = len(text) - 1
        near = res.bktree.search(text, distance)
        if not near:
            return text
        reg, origin = textproc.regulation(text, err)
        pattern = _re.compile(reg)
        candidates: List[str] = []
        for word in near:
            m = pattern.match(word)
            if not m:
                continue
            candidates.append("".join(m.group(i + 1) for i in range(len(err))))
        if not candidates:
            return text
        sims = [res.char_meta.shape_similarity(origin, cnd) for cnd in candidates]
        best = max(sims)
        if best < cfg.kw_similarity_threshold:
            return text
        substitution = list(candidates[sims.index(best)])
        out = list(text)
        for pos in err:
            out[pos] = substitution.pop(0)
        return "".join(out)
    except Exception:
        return text


def correct_lm_texts(
    texts: Sequence[str],
    err_positions: Sequence[Sequence[int]],
    res: CorrectorResources,
    cfg: CorrectorConfig,
) -> List[str]:
    """Correct a batch of spans via the LM path.  The model consumes
    digit-normalised sentences; corrections are applied to the ORIGINAL
    text (bert_corrector.py:37-49).  Per-text exception => original text.

    Fast path (VERDICT r3 #3, output-neutral by construction): with the
    synthetic confusion-table LM and a filler-rejecting curve ("02"
    requires confidence >= 0.05; "full" rejects everything — filler
    candidates are capped below 0.049 by SyntheticLM), a span can only
    ever change at a position that is in-range, non-digit (digit
    positions are skipped before candidates are read) and whose char has
    a confusion_rev entry (echo candidates equal the original char for
    every non-digit position, since normalize_digits touches exactly the
    ASCII digits is_number_char skips).  A span with NO such position
    provably comes back unchanged — including the raise-containment
    cases, which also return the original text — so the model call is
    skipped for it.  Pinned output-equal to the unpruned path in
    tests/test_correct.py."""
    curve = textproc.CURVES[cfg.curve]
    lm = res.lm
    if cfg.curve in ("02", "full") and isinstance(lm, SyntheticLM):
        conf_rev = lm.confusion_rev
        needed = [
            i for i, (t, errs) in enumerate(zip(texts, err_positions))
            if any(
                0 <= e < len(t)
                and not is_number_char(t[e])
                and conf_rev.get(t[e])
                for e in errs
            )
        ]
        if len(needed) < len(texts):
            out = list(texts)
            if needed:
                sub = _correct_lm_texts_full(
                    [texts[i] for i in needed],
                    [err_positions[i] for i in needed],
                    res, cfg, curve,
                )
                for i, v in zip(needed, sub):
                    out[i] = v
            return out
    return _correct_lm_texts_full(texts, err_positions, res, cfg, curve)


def _correct_lm_texts_full(
    texts: Sequence[str],
    err_positions: Sequence[Sequence[int]],
    res: CorrectorResources,
    cfg: CorrectorConfig,
    curve,
) -> List[str]:
    normed = [textproc.normalize_digits(t) for t in texts]
    try:
        lm_out = res.lm.find_topn_candidates(normed, err_positions)
    except Exception:
        # a model-level failure must not kill the batch (per-row error
        # containment): retry per sentence, containing failures
        # individually (a failed sentence gets no candidates => its text
        # passes through unchanged below)
        lm_out = []
        for s, e in zip(normed, err_positions):
            try:
                lm_out.append(res.lm.find_topn_candidates([s], [e])[0])
            except Exception:
                lm_out.append([[] for _ in e])
    results: List[str] = []
    for i, text in enumerate(texts):
        try:
            err = list(err_positions[i])
            origin = list(text)
            for j, e in enumerate(err):
                if is_number_char(origin[e]):
                    continue
                cands = lm_out[i][j]
                for k in range(min(cfg.topn, len(cands))):
                    pred, confidence = cands[k]
                    # similarity is computed before the equality/admissibility
                    # checks, exactly as the reference does (it can raise on
                    # fully-unknown decompositions -> containment).
                    sim = res.char_meta.shape_similarity(pred, origin[e])
                    if origin[e] == pred:
                        continue
                    if not textproc.check_lm_candidate(origin[e], pred):
                        continue
                    if curve(confidence, sim):
                        origin[e] = pred
                        break
            results.append("".join(origin))
        except Exception:
            results.append(text)
    return results


def detect_span(
    text: str,
    probs: Optional[Sequence[float]],
    biz: str,
    cfg: CorrectorConfig,
    res: Optional[CorrectorResources] = None,
) -> Optional[List[int]]:
    """Eligibility filter + error detection on an (already extracted) span.
    Returns the suspicious positions, or None when the span passes through
    uncorrected.

    ``probs`` is None for spans with no recogniser confidences.  Default:
    every position becomes suspect (the reference's ``probs=None`` branch,
    base_corrector.py:36-39); with ``cfg.nonprob_detector="lm"`` (and
    ``res`` given) the LM likelihood detector flags only the chars the
    model finds least likely in context.  An EMPTY probs list means
    "confidences present, nothing suspicious" => pass-through.
    """
    if biz == "report":
        if not textproc.base_correct_filter(text):
            return None
    else:
        if not textproc.lm_correct_filter(text, cfg.max_seq_length):
            return None
    if probs is None:
        if cfg.nonprob_detector == "lm" and res is not None:
            err = res.detector().suspicious_positions(text, cfg.lm_detect_quantile)
            return err if err else None
        return list(range(len(text)))
    err = textproc.find_err_pos(probs, cfg.effective_prob_threshold)
    return err if err else None


def correct_one_span(
    kind: str,
    text: str,
    probs: Optional[Sequence[float]],
    biz: str,
    res: CorrectorResources,
    cfg: CorrectorConfig,
) -> str:
    """Full per-span semantics: extraction -> eligibility filter ->
    error detection -> correction.  Media spans pass through untouched."""
    if kind == "image" or not text:
        return text
    text = extract_span(kind, text)
    err = detect_span(text, probs if kind == "text" else None, biz, cfg, res)
    if err is None:
        return text
    if biz == "report":
        return correct_keyword_text(text, err, res, cfg)
    return correct_lm_texts([text], [err], res, cfg)[0]


def build_resources(
    char_meta_data: Dict[str, dict],
    keywords: Sequence[str],
    confusion_rev: Dict[str, List[str]],
    inventory: Sequence[str],
    topn: int = 3,
    lm_backend: str = "synthetic",
    max_seq_length: int = 64,
    lm_batch_size: int = 16,
) -> CorrectorResources:
    """Convenience constructor used by actors and the oracle."""
    if lm_backend == "scorer":
        from .functions.tokenization import FullTokenizer, build_synthetic_vocab
        from .model.scorer import MaskedLMScorer

        tokenizer = FullTokenizer(build_synthetic_vocab(inventory))
        lm: CandidateModel = MaskedLMScorer(
            tokenizer,
            topn=topn,
            max_seq_length=max_seq_length,
            batch_size=lm_batch_size,
        )
    else:
        lm = SyntheticLM(confusion_rev, inventory, topn=topn)
    return CorrectorResources(
        char_meta=CharMeta(char_meta_data),
        keywords=keywords,
        lm=lm,
    )
