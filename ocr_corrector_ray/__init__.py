"""ocr_corrector_ray — a Ray-Data-native main-content-extraction +
OCR-correction engine.

Brand-new implementation (NOT a port) with the query/data-processing
capabilities of the reference repo ``tiantian91091317/OCR-Corrector``
(read-only at /root/reference).  The reference supplies the per-span
correction *semantics* (error detection by per-char OCR confidence,
keyword/BK-tree correction, masked-LM candidate + shape-similarity
acceptance); the document model (interleaved text/media spans), the
extraction stage, and the distributed execution are idiomatic Ray Data:

    ray.data.read_parquet (Lance when available)
      -> map_batches        (explode docs to span rows, zero-copy Arrow)
      -> map_batches        (stateless extraction: HTML boilerplate strip,
                             PDF layout cleanup)
      -> map_batches(Actor)  (stateful corrector pool: BK-tree + char-meta
                             + LM loaded once per actor)
      -> groupby(doc_id).map_groups  (reassemble span sequences by offset)
      -> write_parquet       (partitioned, resumable, with lineage manifest)

Per-row invariant vs the reference: span-sequence equality on
``(kind, text, media_ref, order)``.
"""

__version__ = "0.1.0"

import os

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

# driver-side workaround for Ray 2.49's hash-shuffle schema-broadcast
# race (empty first block eats the one-shot schema fan-out and empty
# output partitions crash at finalize) — see rayfix.py for the analysis
# and tests/test_rayfix.py for the deterministic reproducer
from . import rayfix as _rayfix

_rayfix.apply()
