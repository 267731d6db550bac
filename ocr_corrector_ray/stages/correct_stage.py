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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import datagen
from ..correct import (
    CorrectorConfig,
    build_resources,
    correct_keyword_text,
    correct_lm_texts,
    detect_span,
)


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
            # without recogniser confidences the error set is a pure
            # function of the text (all-positions or the deterministic LM
            # detector), so the memo key skips materializing tuple(err)
            # for every span (VERDICT r3 #3: cache-key churn)
            key = (text, None) if p is None else (text, tuple(err))
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

    def _eligible_mask(self, batch: pa.Table) -> np.ndarray:
        """Arrow-level eligibility pre-mask (VERDICT r1 item 2): clean
        spans never cross into Python.  The mask is a strict SUPERSET of
        the spans ``detect_span`` would flag — every gate below restates
        one of its cheap checks as a vectorized kernel (same regexes as
        ``functions.regexes``, same float32-quantised threshold), and any
        span the kernels can't decide (no recogniser confidences) falls
        through to Python, which re-runs the exact reference semantics."""
        n = batch.num_rows
        kind = batch.column("kind")
        text = batch.column("text")
        ln = pc.fill_null(pc.utf8_length(text), 0)
        n_cjk = pc.fill_null(pc.count_substring_regex(text, "[一-龥]"), 0)
        has_alpha = pc.fill_null(
            pc.match_substring_regex(text, "[a-zA-ZＡ-Ｚａ-ｚ]"), False
        )
        is_report = pc.is_in(
            batch.column("biz"), value_set=pa.array(sorted(self.keyword_bizs))
        )
        base_ok = pc.greater_equal(n_cjk, 2)  # base_correct_filter
        lm_ok = pc.and_(                       # lm_correct_filter
            pc.and_(pc.invert(has_alpha), pc.greater_equal(n_cjk, 3)),
            pc.less_equal(ln, self.cfg.max_seq_length - 2),
        )
        # NOTE: an Arrow-level "contains a confusion-key char" regex gate
        # here was measured NET NEGATIVE (the char-class scan over every
        # span costs more than the Python-boundary crossing it saves);
        # the provably-no-op spans are skipped by correct_lm_texts' fast
        # path instead (dict probes on the flagged positions only).
        eligible = pc.and_(
            pc.and_(pc.invert(pc.equal(kind, "image")), pc.greater(ln, 0)),
            pc.if_else(is_report, base_ok, lm_ok),
        )

        # probs gate: rows with confidences need a strictly-below-threshold
        # position (find_err_pos); rows without go to the Python detector
        probs = batch.column("probs").combine_chunks()
        probs_used = pc.and_(pc.equal(kind, "text"), pc.is_valid(probs))
        flat = pc.list_flatten(probs)
        thr = pa.scalar(np.float32(self.cfg.effective_prob_threshold), pa.float32())
        susp = pc.fill_null(pc.less(flat, thr), True)  # null prob => suspect
        parent = pc.list_parent_indices(probs).to_numpy(zero_copy_only=False)
        any_susp = np.zeros(n, dtype=bool)
        if len(parent):
            s = susp.to_numpy(zero_copy_only=False).astype(bool)
            any_susp[parent[s]] = True
        mask = eligible.to_numpy(zero_copy_only=False).astype(bool)
        used = probs_used.to_numpy(zero_copy_only=False).astype(bool)
        return mask & (any_susp | ~used)

    def _correct_span_table(self, batch: pa.Table) -> pa.Table:
        """Correct the ``text`` column of a span-row table: Arrow pre-mask
        -> Python correction of only the flagged subset -> vectorized
        scatter of the corrections (``replace_with_mask``)."""
        mask = self._eligible_mask(batch)
        if not mask.any():
            return batch
        idx = np.flatnonzero(mask)
        sub = batch.take(pa.array(idx))
        out = self._correct_span_lists(
            sub.column("kind").to_pylist(),
            sub.column("text").to_pylist(),
            sub.column("probs").to_pylist(),
            sub.column("biz").to_pylist(),
        )
        new_text = pc.replace_with_mask(
            batch.column("text").combine_chunks(),
            pa.array(mask),
            pa.array(out, pa.string()),
        )
        col_idx = batch.column_names.index("text")
        return batch.set_column(col_idx, "text", new_text)

    def _correct_span_table_delta(self, batch: pa.Table) -> pa.Table:
        """Delta-exchange kernel (stages/delta.py): correct the batch,
        keep ONLY the spans whose text the correction actually changed,
        and encode each change against the original text as a compact
        binary patch (delta.encode_patch — substitution ops or a range
        replace, whichever is smaller).  A correction typically touches
        1-3 chars of a ~60-char span, so the exchange row is a few
        bytes instead of the whole corrected text.  The clean majority
        never crosses the shuffle at all — the reassembly side
        reconstructs everything from its co-partitioned bucket file."""
        from .delta import encode_patch

        orig = batch.column("text").combine_chunks()
        corrected = self._correct_span_table(batch)
        new = corrected.column("text").combine_chunks()
        changed = pa.array(
            np.asarray(
                pc.fill_null(pc.invert(pc.equal(new, orig)), False)
            ).astype(bool)
        )
        sub = corrected.filter(changed)
        patches = [
            encode_patch(o or "", n or "")
            for o, n in zip(
                orig.filter(changed).to_pylist(), new.filter(changed).to_pylist()
            )
        ]
        return pa.table({
            "doc_id": sub.column("doc_id"),
            "offset": sub.column("offset"),
            "patch": pa.array(patches, pa.binary()),
        })


class SpanCorrector(_CorrectorBase):
    """Actor-pool stage over exploded span rows: replaces the ``text``
    column with its corrected form.  Use with
    ``map_batches(SpanCorrector, fn_constructor_kwargs=..., concurrency=N,
    batch_format="pyarrow")``.

    ``delta=True`` (stages/delta.py plan): emit only the CHANGED spans
    as minimal (doc_id, offset, text, pid) exchange rows."""

    def __init__(self, *args, delta: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.delta = delta

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.delta:
            from .reassemble import add_partition_column

            out = self._correct_span_table_delta(batch)
            if self.num_partitions is not None:
                out = add_partition_column(out, self.num_partitions)
            return out
        batch = self._correct_span_table(batch)
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


_TASK_STATE: dict = {}


def span_corrector_task(batch: pa.Table, cfg=None, side=None, num_partitions=None) -> pa.Table:
    """Task-pool flavour of ``SpanCorrector`` for RARE/TAIL streams (the
    hybrid plan's oversized-doc branch): corrector state is built once per
    WORKER PROCESS (Ray reuses worker processes across tasks) and cached
    in a module global, so a stream that is usually empty reserves no
    CPUs — an actor pool would hold its CPUs even with no batches to
    process, starving the busy branch."""
    if batch.num_rows == 0:
        # the tail stream is empty most of the time: never build corrector
        # state for a 0-row block (one build per worker process × many
        # workers would dominate the whole pipeline)
        out = batch
        drop = [c for c in ("probs", "biz") if c in out.column_names]
        if drop:
            out = out.drop_columns(drop)
        if num_partitions is not None and "pid" not in out.column_names:
            from .reassemble import encode_exchange

            out = out.append_column("pid", pa.array([], pa.int32()))
            # match the non-empty path's dictionary-encoded exchange
            # schema, or the shuffle sees two schemas on one edge
            out = encode_exchange(out)
        return out
    key = (
        getattr(side, "hex", lambda: str(id(side)))(),
        num_partitions,
        repr(sorted((getattr(cfg, "__dict__", None) or {}).items())),
    )
    sc = _TASK_STATE.get(key)
    if sc is None:
        sc = SpanCorrector(cfg=cfg, side=side, num_partitions=num_partitions)
        _TASK_STATE.clear()  # one live config per worker is enough
        _TASK_STATE[key] = sc
    return sc(batch)


class DocCorrector(_CorrectorBase):
    """Fused no-shuffle variant: whole document rows in, corrected document
    rows (doc_id, spans) out.  Extraction + detection + correction +
    reassembly happen inside one stage, so no groupby is needed — the
    right choice when documents are known to be small; the exploded path
    handles pathological skew.

    Internally it IS the exploded plan, run batch-locally: the same pure
    kernels (zero-copy explode -> extraction -> Arrow pre-mask ->
    correction -> vectorized run-length reassembly) with the shuffle
    replaced by an in-batch sort — one code path for both physical plans."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .explode import explode_docs
        from .extract_stage import extract_batch
        from .reassemble import reassemble_partition

        spans = extract_batch(explode_docs(batch))
        spans = self._correct_span_table(spans)
        return reassemble_partition(
            spans.select(["doc_id", "kind", "text", "media_ref", "offset"])
        )
