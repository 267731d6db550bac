"""Serial oracle: a single-process, faithful restatement of the reference
corrector control flow, used as the ground truth for the Ray pipeline's
span-sequence conformance tests.

Unlike the Ray stages (which carry a needs-correction mask through one
stream), the oracle mirrors the reference's explicit ROUTING structure
(/root/reference/corrector/base_corrector.py:33-94): split the document's
span texts into a to-correct list and a pass list remembering original
indices, run the corrector over the to-correct list only, then re-insert
passed texts at their original indices.  The two compositions must agree
on every document — that differential is exactly what the conformance
tests assert (FIXTURES.md §2).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from .correct import (
    CorrectorConfig,
    CorrectorResources,
    correct_keyword_text,
    correct_lm_texts,
)
from .functions import textproc
from .functions.extract import extract_span


def _correct_page(
    texts: List[str],
    probs: List[Optional[List[float]]],
    biz: str,
    res: CorrectorResources,
    cfg: CorrectorConfig,
) -> List[str]:
    """The reference's ``BaseCorrector.correct`` flow generalised to
    per-text probs: preprocess (filter + detect, remembering pass indices)
    -> correct_all -> post_process (order-restoring insert,
    base_corrector.py:88-94)."""
    to_correct: List[str] = []
    err_positions: List[List[int]] = []
    to_pass: List[Tuple[int, str]] = []

    for i, (text, p) in enumerate(zip(texts, probs)):
        if biz == "report":
            eligible = textproc.base_correct_filter(text)
        else:
            eligible = textproc.lm_correct_filter(text, cfg.max_seq_length)
        if not eligible:
            to_pass.append((i, text))
            continue
        if p is None:
            if cfg.nonprob_detector == "lm":
                err = res.detector().suspicious_positions(text, cfg.lm_detect_quantile)
                if not err:
                    to_pass.append((i, text))
                else:
                    to_correct.append(text)
                    err_positions.append(err)
            else:
                to_correct.append(text)
                err_positions.append(list(range(len(text))))
            continue
        err = textproc.find_err_pos(p, cfg.effective_prob_threshold)
        if not err:
            to_pass.append((i, text))
        else:
            to_correct.append(text)
            err_positions.append(err)

    if not to_correct:
        return list(texts)

    if biz == "report":
        results = [
            correct_keyword_text(t, e, res, cfg)
            for t, e in zip(to_correct, err_positions)
        ]
    else:
        results = correct_lm_texts(to_correct, err_positions, res, cfg)

    # post_process: pass indices ascend, so sequential insert restores order
    for i, s in to_pass:
        results.insert(i, s)
    return results


def correct_document(
    spans: Sequence[dict],
    probs: Optional[Sequence[Optional[Sequence[float]]]],
    biz: str,
    res: CorrectorResources,
    cfg: CorrectorConfig,
) -> List[dict]:
    """Correct one interleaved document.

    ``spans``: list of {kind, text, media_ref, offset} dicts (may arrive in
    any order; processed in offset order).  ``probs``: parallel per-span
    confidence lists (None entries and a None list both mean "no
    confidences").  Returns the corrected span dicts sorted by offset —
    media spans byte-identical, text spans extracted + corrected.
    """
    order = sorted(range(len(spans)), key=lambda i: spans[i]["offset"])
    page_texts: List[str] = []
    page_probs: List[Optional[List[float]]] = []
    page_slots: List[int] = []
    out: List[Optional[dict]] = [None] * len(spans)

    for slot, i in enumerate(order):
        sp = spans[i]
        if sp["kind"] == "image" or not sp["text"]:
            out[slot] = dict(sp)
            continue
        text = extract_span(sp["kind"], sp["text"])
        p = None
        if probs is not None and sp["kind"] == "text":
            raw = probs[i]
            p = list(raw) if raw is not None else None
        page_texts.append(text)
        page_probs.append(p)
        page_slots.append(slot)

    corrected = _correct_page(page_texts, page_probs, biz, res, cfg)
    for k, slot in enumerate(page_slots):
        src = spans[order[slot]]
        out[slot] = {
            "kind": src["kind"],
            "text": corrected[k],
            "media_ref": src["media_ref"],
            "offset": src["offset"],
        }
    return [sp for sp in out if sp is not None]


def correct_table(docs: Sequence[dict], res: CorrectorResources, cfg: CorrectorConfig) -> List[dict]:
    """Correct a list of {doc_id, biz, spans, probs} rows; returns
    {doc_id, spans} rows with spans sorted by offset."""
    out = []
    for row in docs:
        out.append(
            {
                "doc_id": row["doc_id"],
                "spans": correct_document(
                    row["spans"], row.get("probs"), row.get("biz", "doc"), res, cfg
                ),
            }
        )
    return out
