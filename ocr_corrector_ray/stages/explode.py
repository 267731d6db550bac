"""Explode interleaved documents to one row per span (zero-copy Arrow).

This is the engine's "salt split": after this stage the unit of work is a
single span, so a 10^4-span document costs no more per task than 10^4
small documents — skew in document length disappears from every
downstream map stage (SURVEY.md §4.2).  The document structure is
restored later by the hash-partitioned reassembly stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

SPAN_ROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("biz", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("probs", pa.list_(pa.float32())),
    ]
)


def explode_docs(batch: pa.Table) -> pa.Table:
    """doc rows (doc_id, biz, spans, probs) -> span rows.

    Pure Arrow: list offsets drive the repeat of doc-level columns; the
    span struct fields and the inner probs lists are reused zero-copy."""
    batch = batch.combine_chunks()
    spans = batch.column("spans").chunk(0) if batch.column("spans").num_chunks else batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):  # empty table edge
        return pa.table({f.name: pa.array([], f.type) for f in SPAN_ROW_SCHEMA})
    parent = pc.list_parent_indices(spans)
    flat = spans.flatten()

    out = {
        "doc_id": pc.take(batch.column("doc_id"), parent),
        "biz": pc.take(batch.column("biz"), parent),
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    }
    if "probs" in batch.column_names:
        probs = batch.column("probs").chunk(0)
        if probs.null_count:
            # a null DOC-LEVEL probs value (legal: "no recogniser
            # confidences for this whole document", the reference's
            # probs=None branch) contributes zero elements to flatten();
            # expand such rows to one null entry per span so alignment
            # holds.  Rare path -> python rebuild is fine.
            span_lens = pc.list_value_length(spans).to_pylist()
            probs_py = probs.to_pylist()
            filled = []
            for plist, n in zip(probs_py, span_lens):
                filled.extend([None] * n if plist is None else plist)
            flat_probs = pa.array(filled, type=pa.list_(pa.float32()))
        else:
            flat_probs = probs.flatten()
        if len(flat_probs) != len(flat):
            raise ValueError(
                "probs/spans misalignment: "
                f"{len(flat_probs)} probs for {len(flat)} spans"
            )
        out["probs"] = flat_probs
    else:
        out["probs"] = pa.nulls(len(flat), pa.list_(pa.float32()))
    return pa.table(out)
