"""Multimodal span processing (actor-pool stages over opaque media).

Media spans carry an opaque ``media_ref`` (and, when materialised, a
``payload: binary`` column).  ``backend='real'`` decodes UNCOMPRESSED
image formats with a pure-numpy codec (PPM P6 and 24-bit BI_RGB BMP —
no imaging library needed) and derives features from actual pixels;
compressed formats (JPEG/PNG/video/audio) need codecs not present in
this container — plug them into ``decode_image`` — while all the
Ray-side plumbing is real and tested: schema, batch sizing for large
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


def fetch_media_payloads(batch: pa.Table, fmt: str = "hash") -> pa.Table:
    """Stand-in media fetch: materialises a deterministic payload per
    media_ref (in production this stage reads object storage).

    ``fmt='hash'``: opaque hash bytes (plumbing tests).
    ``fmt='ppm'`` / ``'bmp'``: a small deterministic image ENCODED in
    that real uncompressed format, decodable by ``decode_image`` — the
    fixture path for ``backend='real'``."""
    refs = batch.column("media_ref").to_pylist()
    if fmt == "hash":
        payloads = [
            hashlib.blake2b(r.encode("utf-8"), digest_size=32).digest() * 8
            for r in refs
        ]
    else:
        payloads = [synthesize_image_payload(r, fmt=fmt) for r in refs]
    return batch.append_column("payload", pa.array(payloads, pa.large_binary()))


# ---- pure-numpy uncompressed-image codec ------------------------------
# PPM (P6, maxval 255) and BMP (24-bit, BI_RGB, bottom-up) cover the
# "decode real pixels with zero native deps" case; compressed formats
# plug into decode_image below.

def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = 4 whitespace-separated tokens (magic, w, h, maxval) with
    # optional '#' comment lines
    toks, i = [], 2
    while len(toks) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # single whitespace byte after maxval
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return data.reshape(h, w, 3)


def encode_bmp(img: np.ndarray) -> bytes:
    import struct

    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = np.ascontiguousarray(img[::-1, :, ::-1], dtype=np.uint8)  # bottom-up BGR
    for r in range(h):
        body += bgr[r].tobytes() + b"\x00" * pad
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return rgb[::-1] if flip else rgb


def decode_image(payload: bytes) -> np.ndarray:
    """payload -> HxWx3 uint8 RGB.  Sniffs the magic bytes; PPM/BMP are
    decoded with the pure-numpy codec above.  Compressed formats raise —
    plug PIL/cv2 in HERE when available; the surrounding Ray plumbing
    (schema, actor pool, batch sizing) does not change."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "compressed image formats need an imaging library not present in "
        "this container; plug a decoder into decode_image()"
    )


def synthesize_image_payload(media_ref: str, fmt: str = "ppm",
                             size: int = 16) -> bytes:
    """Deterministic small RGB image for a media_ref, encoded in a REAL
    uncompressed format (datagen fixture for the backend='real' path)."""
    seed = int.from_bytes(
        hashlib.blake2b(media_ref.encode("utf-8"), digest_size=4).digest(), "big"
    )
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(size, size, 3), dtype=np.uint8)
    if fmt == "ppm":
        return encode_ppm(img)
    if fmt == "bmp":
        return encode_bmp(img)
    raise ValueError(f"unknown fixture format {fmt!r}")


class MediaFeaturizer:
    """Actor-pool stage: media payload -> fixed-size feature vector.

    ``backend='fake'`` (default) produces a deterministic hash-derived
    float32 vector so the distributed plumbing is testable end-to-end;
    ``backend='real'`` decodes the payload (pure-numpy PPM/BMP codec;
    compressed formats raise from ``decode_image``) and derives the
    vector from actual pixels: per-channel mean/std + a 5x5 mean-pooled
    grayscale thumbnail + aspect ratio, L2-normalized.  Use with
    ``map_batches(MediaFeaturizer, batch_size=64, concurrency=N,
    num_cpus=1, batch_format="pyarrow")``.
    """

    def __init__(self, backend: str = "fake", dim: int = MEDIA_FEATURE_DIM):
        self.backend = backend
        self.dim = dim
        # per-actor init: in a real backend this is codec/model setup

    def _pixel_features(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        f = np.empty(32, dtype=np.float64)
        fimg = img.astype(np.float64) / 255.0
        f[0:3] = fimg.mean(axis=(0, 1))
        f[3:6] = fimg.std(axis=(0, 1))
        gray = fimg.mean(axis=2)
        # 5x5 mean-pooled thumbnail via bincount over cell ids (any h, w)
        ri = (np.arange(h) * 5 // h)[:, None]
        ci = (np.arange(w) * 5 // w)[None, :]
        cell = (ri * 5 + ci).ravel()
        sums = np.bincount(cell, weights=gray.ravel(), minlength=25)
        cnts = np.bincount(cell, minlength=25)
        f[6:31] = sums / np.maximum(cnts, 1)
        f[31] = w / h
        v = f.astype(np.float32)
        if self.dim != 32:
            v = np.resize(v, self.dim)
        n = np.linalg.norm(v)
        return v / n if n else v

    def _featurize(self, payload: Optional[bytes], media_ref: str) -> np.ndarray:
        if self.backend == "real":
            return self._pixel_features(decode_image(payload or b""))
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


def media_features(doc_ds, concurrency=(1, 8), backend: str = "fake",
                   payload_fmt: str | None = None):
    """Interleaved docs -> media feature rows: explode, keep media spans,
    fetch payloads, featurize via the actor pool.

    ``backend='real'`` + ``payload_fmt='ppm'|'bmp'`` runs the pure-numpy
    pixel decode path end-to-end (fixture payloads are synthesized in
    the named real format)."""
    import pyarrow.compute as pc

    from .explode import explode_docs

    if payload_fmt is None:
        payload_fmt = "ppm" if backend == "real" else "hash"

    def media_only(batch: pa.Table) -> pa.Table:
        b = explode_docs(batch)
        b = b.filter(pc.equal(b.column("kind"), "image"))
        return b.select(["doc_id", "offset", "media_ref"])

    spans = doc_ds.map_batches(media_only, batch_format="pyarrow")
    spans = spans.map_batches(
        fetch_media_payloads, batch_format="pyarrow", batch_size=64,
        fn_kwargs={"fmt": payload_fmt},
    )
    return spans.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        num_cpus=1,
    )
