"""Stateful corrector stages (actor pools).

``SpanCorrector`` consumes exploded span rows (after extraction);
``DocCorrector`` is the fused no-shuffle variant consuming whole document
rows.  Both load the char-meta table, BK-tree + keyword set and the
candidate LM ONCE per actor in ``__init__`` (the reference builds the same
state eagerly per corrector instance — SURVEY.md §2.3) and share the
per-actor shape-similarity memo across batches.

Side data arrives as a ``ray.put`` object ref (broadcast once per node,
read by every actor) — never re-shipped per batch.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from .. import datagen
from ..correct import (
    CorrectorConfig,
    build_resources,
    correct_keyword_text,
    correct_lm_texts,
    detect_span,
)
from ..functions.extract import extract_span


def default_side_data() -> dict:
    """The broadcastable side-data bundle (char meta, keywords, confusion
    reverse map, inventory)."""
    keywords, inventory, _ = datagen.static_tables()
    return {
        "char_meta": datagen.build_char_meta(),
        "keywords": keywords,
        "confusion_rev": datagen.confusion_rev(),
        "inventory": inventory,
    }


def _resolve_side(side) -> dict:
    if side is None:
        return default_side_data()
    try:  # ObjectRef -> materialize once per actor
        import ray

        if isinstance(side, ray.ObjectRef):
            return ray.get(side)
    except ImportError:
        pass
    return side


class _CorrectorBase:
    _CACHE_MAX = 200_000

    def __init__(
        self,
        cfg: Optional[CorrectorConfig] = None,
        side=None,
        num_partitions: Optional[int] = None,
    ):
        self.cfg = cfg or CorrectorConfig()
        # when set, the output gets the reassembly partition id appended
        # here (fused into this stage: one fewer operator pass over the
        # span stream before the shuffle)
        self.num_partitions = num_partitions
        sd = _resolve_side(side)
        # a non-default keywords_file on the config overrides the side
        # bundle's keyword set (the reference's key_words_file knob)
        import os as _os

        from ..correct import CorrectorConfig as _CC

        kwf = getattr(self.cfg, "keywords_file", None)
        if kwf and kwf != _CC().keywords_file:
            # explicit config must not fall back silently: a typo'd path
            # would run the whole corpus against the wrong keyword set
            with open(kwf, encoding="utf-8") as f:  # raises on a bad path
                sd = dict(sd)
                sd["keywords"] = [line.strip() for line in f if line.strip()]
        # which biz values route to the keyword path (custom biz types from
        # the config registry route by corrector_type, like the reference)
        self.keyword_bizs = set(getattr(self.cfg, "keyword_biz_types", ("report",)))
        self.res = build_resources(
            sd["char_meta"],
            sd["keywords"],
            sd["confusion_rev"],
            sd["inventory"],
            topn=self.cfg.topn,
            lm_backend=getattr(self.cfg, "lm_backend", "synthetic"),
            max_seq_length=self.cfg.max_seq_length,
            lm_batch_size=getattr(self.cfg, "lm_batch_size", 16),
        )
        # correction is a pure function of (text, err positions); corpora
        # repeat boilerplate heavily, so a per-actor memo amortises the
        # BK-tree/LM work across batches (bounded; misses cost one lookup)
        self._kw_cache: dict = {}
        self._lm_cache: dict = {}

    def _correct_span_lists(
        self,
        kinds: List[str],
        texts: List[str],
        probs: List[Optional[list]],
        bizs: List[str],
    ) -> List[str]:
        """Shared batch kernel: detect per span, batch all LM-path spans
        into ONE model call (mirrors the reference's batched inference,
        masked_lm.py:326-345), correct keyword-path spans inline."""
        n = len(texts)
        out = list(texts)
        lm_idx: List[int] = []
        lm_keys: List[tuple] = []
        lm_texts: List[str] = []
        lm_errs: List[List[int]] = []
        kw_cache, lm_cache = self._kw_cache, self._lm_cache
        for i in range(n):
            kind = kinds[i]
            text = texts[i]
            if kind == "image" or not text:
                continue
            p = probs[i] if kind == "text" else None
            biz = "report" if bizs[i] in self.keyword_bizs else "doc"
            err = detect_span(text, p, biz, self.cfg, self.res)
            if err is None:
                continue
            key = (text, tuple(err))
            if biz == "report":
                hit = kw_cache.get(key)
                if hit is None:
                    hit = correct_keyword_text(text, err, self.res, self.cfg)
                    if len(kw_cache) < self._CACHE_MAX:
                        kw_cache[key] = hit
                out[i] = hit
            else:
                hit = lm_cache.get(key)
                if hit is not None:
                    out[i] = hit
                else:
                    lm_idx.append(i)
                    lm_keys.append(key)
                    lm_texts.append(text)
                    lm_errs.append(err)
        if lm_idx:
            corrected = correct_lm_texts(lm_texts, lm_errs, self.res, self.cfg)
            for i, key, c in zip(lm_idx, lm_keys, corrected):
                out[i] = c
                if len(lm_cache) < self._CACHE_MAX:
                    lm_cache[key] = c
        return out


class SpanCorrector(_CorrectorBase):
    """Actor-pool stage over exploded span rows: replaces the ``text``
    column with its corrected form.  Use with
    ``map_batches(SpanCorrector, fn_constructor_kwargs=..., concurrency=N,
    batch_format="pyarrow")``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        texts = batch.column("text").to_pylist()
        probs = batch.column("probs").to_pylist()
        bizs = batch.column("biz").to_pylist()
        out = self._correct_span_lists(kinds, texts, probs, bizs)
        col_idx = batch.column_names.index("text")
        batch = batch.set_column(col_idx, "text", pa.array(out, pa.string()))
        if self.num_partitions is not None:
            from .reassemble import add_partition_column

            # heading into the reassembly shuffle: drop the columns the
            # rebuild never reads (probs is the widest column in the row)
            # before every byte crosses the exchange
            drop = [c for c in ("probs", "biz") if c in batch.column_names]
            if drop:
                batch = batch.drop_columns(drop)
            batch = add_partition_column(batch, self.num_partitions)
        return batch


class DocCorrector(_CorrectorBase):
    """Fused no-shuffle variant: whole document rows in, corrected document
    rows (doc_id, spans) out.  Extraction + detection + correction +
    reassembly happen inside one stage, so no groupby is needed — the
    right choice when documents are known to be small; the exploded path
    handles pathological skew."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        bizs = batch.column("biz").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        probs_col = (
            batch.column("probs").to_pylist()
            if "probs" in batch.column_names
            else [None] * len(doc_ids)
        )
        out_spans = []
        for spans, probs, biz in zip(spans_col, probs_col, bizs):
            order = sorted(range(len(spans)), key=lambda i: spans[i]["offset"])
            kinds, texts, plist = [], [], []
            for i in order:
                sp = spans[i]
                kinds.append(sp["kind"])
                texts.append(
                    extract_span(sp["kind"], sp["text"]) if sp["text"] else sp["text"]
                )
                plist.append(probs[i] if probs is not None else None)
            corrected = self._correct_span_lists(kinds, texts, plist, [biz] * len(order))
            out_spans.append(
                [
                    {
                        "kind": kinds[j],
                        "text": corrected[j],
                        "media_ref": spans[i]["media_ref"],
                        "offset": spans[i]["offset"],
                    }
                    for j, i in enumerate(order)
                ]
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "spans": pa.array(out_spans, type=pa.list_(datagen.SPAN_TYPE)),
            }
        )
