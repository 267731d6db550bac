"""Stateless extraction stage: HTML boilerplate strip / PDF layout cleanup
on span rows (north-star extraction step; runs BEFORE scoring).

Only html/pdf rows are touched; the common case (text/image spans) stays
zero-copy.  Per-row error containment: an extraction failure leaves the
span text unchanged."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.extract import extract_html, extract_pdf


def extract_batch(batch: pa.Table) -> pa.Table:
    kind = batch.column("kind")
    mask = pc.is_in(kind, value_set=pa.array(["html", "pdf"]))
    if not pc.any(mask).as_py():
        return batch
    idx = pc.indices_nonzero(mask)
    kinds = pc.take(kind, idx).to_pylist()
    texts = pc.take(batch.column("text"), idx).to_pylist()
    extracted = []
    for k, t in zip(kinds, texts):
        try:
            extracted.append(extract_html(t) if k == "html" else extract_pdf(t))
        except Exception:
            extracted.append(t)

    # scatter the extracted strings back (clean rows stay zero-copy)
    new_text = pc.replace_with_mask(
        batch.column("text").combine_chunks(), mask.combine_chunks()
        if isinstance(mask, pa.ChunkedArray) else mask,
        pa.array(extracted, pa.string()),
    )
    col_idx = batch.column_names.index("text")
    return batch.set_column(col_idx, "text", new_text)
