"""Reader for the reference's OCR-result JSON fixture format
(``{"texts": [...], "probs": [[...]]}`` — demo.py:24-34) and the
interleaved-doc storage layer.

``read_ocr_json`` turns one or more fixture files into the engine's
interleaved-document Dataset: one document per file, one text span per
recognised line (offset = reading-order index), probs carried alongside —
so a user of the reference's demo flow can run the same inputs through
this engine unchanged.

``read_docs`` / ``write_docs``: Lance when the library is importable,
parquet otherwise (identical schema; SURVEY.md §7.0).
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence

import pyarrow as pa

import ray.data

from ..datagen import DOC_SCHEMA, SPAN_TYPE

try:  # pragma: no cover - lance is not installed in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def docs_from_ocr_json(paths: Sequence[str], biz: str = "doc") -> pa.Table:
    """Parse fixture files into the interleaved-doc Arrow table."""
    doc_ids: List[str] = []
    bizs: List[str] = []
    spans_col: List[list] = []
    probs_col: List[list] = []
    for path in paths:
        with open(path, encoding="utf-8") as f:
            payload = json.load(f)
        texts = payload["texts"]
        probs = payload.get("probs")
        spans = [
            {"kind": "text", "text": t, "media_ref": "", "offset": i}
            for i, t in enumerate(texts)
        ]
        if probs is None:
            p = [None] * len(texts)
        else:
            p = [list(map(float, pp)) for pp in probs]
        doc_ids.append(os.path.splitext(os.path.basename(path))[0])
        bizs.append(biz)
        spans_col.append(spans)
        probs_col.append(p)
    return pa.table(
        {
            "doc_id": doc_ids,
            "biz": bizs,
            "spans": pa.array(spans_col, type=pa.list_(SPAN_TYPE)),
            "probs": pa.array(probs_col, type=pa.list_(pa.list_(pa.float32()))),
        },
        schema=DOC_SCHEMA,
    )


def read_ocr_json(paths: Sequence[str], biz: str = "doc"):
    """Fixture files -> interleaved-document Dataset."""
    return ray.data.from_arrow(docs_from_ocr_json(paths, biz))


def read_docs(path: str):
    """Interleaved-doc table -> Dataset (Lance if available, else parquet)."""
    if HAVE_LANCE and os.path.isdir(path) and path.endswith(".lance"):
        return ray.data.read_lance(path)
    return ray.data.read_parquet(path)


def write_docs(ds, path: str, **kwargs):
    if HAVE_LANCE and path.endswith(".lance"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
