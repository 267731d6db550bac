"""Multimodal span processing (actor-pool stages over opaque media).

Media spans carry an opaque ``media_ref`` (and, when materialised, a
``payload: binary`` column).  Real decoding (image decode / resize /
audio feature extraction / video frame sampling) needs libraries that are
not in this container, so the DECODE KERNEL is stubbed — either a
``NotImplementedError`` (strict mode) or a deterministic fake — while all
the Ray-side plumbing is real and tested: schema, batch sizing for large
binary payloads, actor signature, zero-copy binary columns, output
layout.

Scale notes baked into the design:
- binary payloads ride in Arrow ``large_binary`` columns; batches stay
  SMALL (``batch_size<=64``) so batch x concurrency fits worker heaps;
- the decoder is an actor pool (model/codec init once per actor);
- outputs are fixed-size float32 feature vectors + typed metadata, never
  decoded frames (keep the object store lean).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_FEATURE_DIM = 32

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("media_ref", pa.string()),
        ("payload", pa.large_binary()),
    ]
)


def fetch_media_payloads(batch: pa.Table) -> pa.Table:
    """Stand-in media fetch: materialises a deterministic payload per
    media_ref (in production this stage reads object storage)."""
    refs = batch.column("media_ref").to_pylist()
    payloads = [
        hashlib.blake2b(r.encode("utf-8"), digest_size=32).digest() * 8 for r in refs
    ]
    return batch.append_column("payload", pa.array(payloads, pa.large_binary()))


def _decode_image_real(payload: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "real image decode requires an imaging library not present in this "
        "container; plug in e.g. PIL/cv2 here — the surrounding Ray "
        "plumbing (schema, actor pool, batch sizing) is already real"
    )


class MediaFeaturizer:
    """Actor-pool stage: media payload -> fixed-size feature vector.

    ``backend='fake'`` (default) produces a deterministic hash-derived
    float32 vector so the distributed plumbing is testable end-to-end;
    ``backend='real'`` raises NotImplementedError from the decode kernel.
    Use with ``map_batches(MediaFeaturizer, batch_size=64,
    concurrency=N, num_cpus=1, batch_format="pyarrow")``.
    """

    def __init__(self, backend: str = "fake", dim: int = MEDIA_FEATURE_DIM):
        self.backend = backend
        self.dim = dim
        # per-actor init: in a real backend this is codec/model setup

    def _featurize(self, payload: Optional[bytes], media_ref: str) -> np.ndarray:
        if self.backend == "real":
            _decode_image_real(payload or b"")
        seed_bytes = hashlib.blake2b(
            (media_ref.encode("utf-8") + (payload or b"")[:64]), digest_size=8
        ).digest()
        rng = np.random.RandomState(int.from_bytes(seed_bytes[:4], "big"))
        v = rng.standard_normal(self.dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = (
            batch.column("payload").to_pylist()
            if "payload" in batch.column_names
            else [None] * len(refs)
        )
        feats = [self._featurize(p, r) for p, r in zip(payloads, refs)]
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "offset": batch.column("offset"),
                "media_ref": batch.column("media_ref"),
                "feature": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32(), self.dim)
                ),
            }
        )
        return out


def media_features(doc_ds, concurrency=(1, 8)):
    """Interleaved docs -> media feature rows: explode, keep media spans,
    fetch payloads, featurize via the actor pool."""
    import pyarrow.compute as pc

    from .explode import explode_docs

    def media_only(batch: pa.Table) -> pa.Table:
        b = explode_docs(batch)
        b = b.filter(pc.equal(b.column("kind"), "image"))
        return b.select(["doc_id", "offset", "media_ref"])

    spans = doc_ds.map_batches(media_only, batch_format="pyarrow")
    spans = spans.map_batches(fetch_media_payloads, batch_format="pyarrow", batch_size=64)
    return spans.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        num_cpus=1,
    )
