"""Multimodal span processing (actor-pool stages over opaque media).

Media spans carry an opaque ``media_ref`` (and, when materialised, a
``payload: binary`` column).  Five stages: ``media_features``
(decode -> feature vector), ``media_resize`` (decode -> resize ->
re-encode), ``media_frame_sample`` (video -> k seek-decoded frames,
fan-out rows), ``media_audio_features`` (WAV PCM16 decode -> spectral
features, pure numpy), plus the fetch stage.  ``backend='real'`` decodes
UNCOMPRESSED image formats with a pure-numpy codec (PPM P6 and 24-bit
BI_RGB BMP — no imaging library needed) and derives features from
actual pixels; video uses a seekable RAWV1 fixture container (offset
index = the stss/stco contract of a real container).  Compressed
formats (JPEG/PNG/MP4/audio) need codecs not present in this
container — plug them into ``decode_image`` / ``decode_video_frame`` —
while all the Ray-side plumbing is real and tested: schema, batch
sizing for large binary payloads, actor signature, zero-copy binary
columns, output layout, fan-out row accounting.

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
    fixture path for ``backend='real'``.
    ``fmt='video'``: a deterministic RAWV1 clip (frame-sample fixture)."""
    refs = batch.column("media_ref").to_pylist()
    if fmt == "hash":
        payloads = [
            hashlib.blake2b(r.encode("utf-8"), digest_size=32).digest() * 8
            for r in refs
        ]
    elif fmt == "video":
        payloads = [synthesize_video_payload(r) for r in refs]
    elif fmt == "wav":
        payloads = [synthesize_audio_payload(r) for r in refs]
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


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy resize to (out_h, out_w, 3) uint8.

    Downscale (both axes shrink) uses area averaging — every source
    pixel is binned into exactly one target cell and cells average their
    members (bincount, fully vectorized).  Upscale / mixed uses
    nearest-neighbor index mapping.  Deterministic either way."""
    h, w, c = img.shape
    if out_h <= h and out_w <= w:
        ri = np.arange(h) * out_h // h
        ci = np.arange(w) * out_w // w
        cell = (ri[:, None] * out_w + ci[None, :]).ravel()
        cnt = np.bincount(cell, minlength=out_h * out_w).astype(np.float64)
        flat = img.reshape(-1, c).astype(np.float64)
        out = np.empty((out_h * out_w, c), dtype=np.float64)
        for ch in range(c):
            out[:, ch] = (
                np.bincount(cell, weights=flat[:, ch], minlength=out_h * out_w) / cnt
            )
        return np.rint(out).astype(np.uint8).reshape(out_h, out_w, c)
    yi = np.minimum(np.arange(out_h) * h // out_h, h - 1)
    xi = np.minimum(np.arange(out_w) * w // out_w, w - 1)
    return np.ascontiguousarray(img[yi][:, xi])


# ---- raw video container (fixture format for frame sampling) ----------
# No video codec ships in this container, so the frame-sample stage is
# exercised against a trivially seekable uncompressed container: magic,
# frame count, a u64 offset index, then concatenated PPM frames.  The
# OFFSET INDEX is the scale-relevant part: sampling k frames decodes
# exactly k frames — never the whole payload — which is the same
# contract a real keyframe-indexed container (MP4 stss/stco) gives.

VIDEO_MAGIC = b"RAWV1\n"


def encode_video(frames: list[np.ndarray]) -> bytes:
    import struct

    blobs = [encode_ppm(f) for f in frames]
    offs, pos = [], 0
    for b in blobs:
        offs.append(pos)
        pos += len(b)
    header = VIDEO_MAGIC + struct.pack("<I", len(blobs))
    index = struct.pack(f"<{len(blobs)}Q", *offs)
    return header + index + b"".join(blobs)


def video_num_frames(payload: bytes) -> int:
    import struct

    if payload[: len(VIDEO_MAGIC)] != VIDEO_MAGIC:
        raise ValueError("not a RAWV1 video payload")
    return struct.unpack_from("<I", payload, len(VIDEO_MAGIC))[0]


def decode_video_frame(payload: bytes, i: int) -> np.ndarray:
    """Seek-decode frame i via the offset index (O(1) per frame)."""
    import struct

    n = video_num_frames(payload)
    if not 0 <= i < n:
        raise IndexError(f"frame {i} out of range (n={n})")
    base = len(VIDEO_MAGIC) + 4
    off = struct.unpack_from("<Q", payload, base + 8 * i)[0]
    end = (
        struct.unpack_from("<Q", payload, base + 8 * (i + 1))[0]
        if i + 1 < n
        else len(payload) - (base + 8 * n)
    )
    data_start = base + 8 * n
    return decode_image(payload[data_start + off : data_start + end])


def sample_frame_indices(n_frames: int, n_samples: int) -> np.ndarray:
    """Uniform deterministic frame sampling: n_samples indices spread
    evenly across [0, n_frames), always including the first frame (and
    the last when n_samples > 1); duplicates collapse for short clips."""
    k = min(n_samples, n_frames)
    if k <= 0:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.linspace(0, n_frames - 1, num=k).round().astype(np.int64))


def synthesize_video_payload(media_ref: str, n_frames: int = 8,
                             size: int = 16) -> bytes:
    """Deterministic short clip for a media_ref: frame f is the ref's
    base image rolled f rows (content varies per frame, so sampled-frame
    features are distinguishable in tests)."""
    base = decode_ppm(synthesize_image_payload(media_ref, fmt="ppm", size=size))
    return encode_video([np.roll(base, f, axis=0) for f in range(n_frames)])


# ---- pure-numpy WAV PCM16 codec (audio modality) -----------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """mono int16 samples -> RIFF/WAVE PCM16 bytes (no audio lib)."""
    import struct

    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (float64 samples in [-1, 1) mono, sample_rate).
    Multi-channel input is averaged to mono.  Compressed codecs raise."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_ch, rate, bits, data = 12, 1, 16000, 16, b""
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 WAV is decodable without an audio library "
                    f"(fmt={audio_fmt}, bits={bits}); plug a codec into decode_wav()"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    if n_ch > 1:
        x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def synthesize_audio_payload(media_ref: str, n_samples: int = 2048,
                             sample_rate: int = 16000) -> bytes:
    """Deterministic clip per media_ref: two ref-seeded sine tones +
    seeded noise, PCM16 WAV (datagen fixture for the audio path)."""
    seed = int.from_bytes(
        hashlib.blake2b(media_ref.encode("utf-8"), digest_size=4).digest(), "big"
    )
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples) / sample_rate
    f1, f2 = rng.uniform(100, 2000), rng.uniform(2000, 7000)
    x = (
        0.5 * np.sin(2 * np.pi * f1 * t)
        + 0.3 * np.sin(2 * np.pi * f2 * t)
        + 0.05 * rng.standard_normal(n_samples)
    )
    return encode_wav(np.clip(x, -1, 1 - 2**-15) * 32767, sample_rate)


def audio_features(samples: np.ndarray, rate: int,
                   n_bands: int = 28) -> np.ndarray:
    """float samples -> fixed 32-dim vector: RMS, zero-crossing rate,
    spectral centroid, duration, then n_bands log-energy bands from one
    rFFT (a mel-spectrogram stand-in with zero deps), L2-normalized."""
    f = np.zeros(4 + n_bands, dtype=np.float64)
    n = len(samples)
    if n:
        f[0] = np.sqrt(np.mean(samples**2))
        f[1] = np.mean(np.abs(np.diff(np.signbit(samples))))
        spec = np.abs(np.fft.rfft(samples)) ** 2
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        tot = spec.sum()
        f[2] = (freqs * spec).sum() / tot / (rate / 2) if tot else 0.0
        f[3] = n / rate
        band = np.minimum(np.arange(len(spec)) * n_bands // len(spec), n_bands - 1)
        f[4:] = np.log1p(np.bincount(band, weights=spec, minlength=n_bands))
    v = f.astype(np.float32)
    nrm = np.linalg.norm(v)
    return v / nrm if nrm else v


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
        # fake backend: the unit vector comes straight from hash bytes
        # (4 bytes per dim, salted blake2b chain) — deterministic like
        # the old RandomState path but ~50x cheaper per row (no PRNG
        # state construction per payload)
        key = media_ref.encode("utf-8") + (payload or b"")[:64]
        need, raw, i = self.dim * 4, b"", 0
        while len(raw) < need:
            raw += hashlib.blake2b(
                key, digest_size=64, salt=i.to_bytes(4, "big")
            ).digest()
            i += 1
        v = np.frombuffer(raw[:need], dtype="<i4").astype(np.float32)
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


def media_features(doc_ds, concurrency=None, backend: str = "fake",
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
        concurrency=_pool_size(concurrency),
        num_cpus=1,
    )


class MediaResizer:
    """Actor-pool stage: image payload -> resized re-encoded payload.

    Decodes with the pure-numpy codec, resizes to a fixed (out_h, out_w)
    with ``resize_image``, re-encodes as PPM.  Output rows carry the new
    dimensions plus the original ones, so a downstream audit can verify
    no payload was skipped.  Row count is preserved (1:1)."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out_p, src_h, src_w = [], [], []
        for p in payloads:
            img = decode_image(p or b"")
            src_h.append(img.shape[0])
            src_w.append(img.shape[1])
            out_p.append(encode_ppm(resize_image(img, self.out_h, self.out_w)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "offset": batch.column("offset"),
                "media_ref": batch.column("media_ref"),
                "src_height": pa.array(src_h, pa.int32()),
                "src_width": pa.array(src_w, pa.int32()),
                "height": pa.array([self.out_h] * len(out_p), pa.int32()),
                "width": pa.array([self.out_w] * len(out_p), pa.int32()),
                "payload": pa.array(out_p, pa.large_binary()),
            }
        )


class MediaFrameSampler:
    """Actor-pool stage: video payload -> one row PER SAMPLED FRAME.

    Fan-out stage (a batch of V videos yields ~V x n_samples rows):
    reads the container's frame count, picks ``sample_frame_indices``,
    seek-decodes ONLY those frames via the offset index, and emits each
    as a pixel-feature row.  At 100 TB this is the stage shape that
    matters: payloads stay in small batches, decode cost is k frames
    per clip (not all), and the output is fixed-size vectors — never
    decoded frames — so the object store stays lean."""

    def __init__(self, n_samples: int = 4):
        self.n_samples = n_samples
        self._feat = MediaFeaturizer(backend="real")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, offsets, refs = (
            batch.column("doc_id").to_pylist(),
            batch.column("offset").to_pylist(),
            batch.column("media_ref").to_pylist(),
        )
        payloads = batch.column("payload").to_pylist()
        o_doc, o_off, o_ref, o_fi, o_n, o_feat = [], [], [], [], [], []
        for d, off, r, p in zip(doc_ids, offsets, refs, payloads):
            n = video_num_frames(p or b"")
            for fi in sample_frame_indices(n, self.n_samples):
                o_doc.append(d)
                o_off.append(off)
                o_ref.append(r)
                o_fi.append(int(fi))
                o_n.append(n)
                o_feat.append(
                    self._feat._pixel_features(decode_video_frame(p, int(fi)))
                )
        return pa.table(
            {
                "doc_id": pa.array(o_doc, pa.string()),
                "offset": pa.array(o_off, pa.int32()),
                "media_ref": pa.array(o_ref, pa.string()),
                "frame_idx": pa.array(o_fi, pa.int32()),
                "n_frames": pa.array(o_n, pa.int32()),
                "feature": pa.array(
                    [f.tolist() for f in o_feat],
                    type=pa.list_(pa.float32(), MEDIA_FEATURE_DIM),
                ),
            }
        )


def _pool_size(concurrency):
    """Default actor-pool bounds scale with the cluster: (8, cpus - 2)
    autoscaling.  Ray fuses the cheap explode/fetch task stages INTO the
    media actor pool (one ActorPoolMapOperator), so a fixed cap of 8
    would run the whole pipeline on 8 of N cores; leaving 2 CPUs out
    keeps the unfused read task pool fed (see the pool-share notes in
    pipelines/correct.py).  The floor is 8, not 1: min=1 makes Ray's
    pool autoscaler ramp too slowly for short jobs (measured 6.2 s vs
    3.7 s wall for the same sf0.1 featurize at (1,30) vs (8,30))."""
    if concurrency is not None:
        return concurrency
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    cap = max(1, cpus - 2)
    return (min(8, cap), cap)


def _media_spans(doc_ds, payload_fmt: str):
    """Shared head of every media pipeline: explode docs, keep image
    spans, attach payloads in small batches."""
    import pyarrow.compute as pc

    from .explode import explode_docs

    def media_only(batch: pa.Table) -> pa.Table:
        b = explode_docs(batch)
        b = b.filter(pc.equal(b.column("kind"), "image"))
        return b.select(["doc_id", "offset", "media_ref"])

    spans = doc_ds.map_batches(media_only, batch_format="pyarrow")
    return spans.map_batches(
        fetch_media_payloads, batch_format="pyarrow", batch_size=64,
        fn_kwargs={"fmt": payload_fmt},
    )


def media_resize(doc_ds, out_h: int = 8, out_w: int = 8,
                 concurrency=None, payload_fmt: str = "ppm"):
    """Interleaved docs -> resized-thumbnail payload rows (1 per image
    span): explode, fetch, decode+resize+re-encode via the actor pool."""
    return _media_spans(doc_ds, payload_fmt).map_batches(
        MediaResizer,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=_pool_size(concurrency),
        num_cpus=1,
    )


class AudioFeaturizer:
    """Actor-pool stage: WAV payload -> fixed 32-dim audio feature row
    (RMS / zero-crossing / spectral centroid / duration / FFT band
    log-energies).  1:1 rows; payload never leaves the stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, rates, durs = [], [], []
        for p in batch.column("payload").to_pylist():
            samples, rate = decode_wav(p or b"")
            feats.append(audio_features(samples, rate))
            rates.append(rate)
            durs.append(len(samples) / rate if rate else 0.0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "offset": batch.column("offset"),
                "media_ref": batch.column("media_ref"),
                "sample_rate": pa.array(rates, pa.int32()),
                "duration_s": pa.array(durs, pa.float32()),
                "feature": pa.array(
                    [f.tolist() for f in feats],
                    type=pa.list_(pa.float32(), MEDIA_FEATURE_DIM),
                ),
            }
        )


def media_audio_features(doc_ds, concurrency=None):
    """Interleaved docs -> audio feature rows (1 per media span):
    explode, fetch WAV payloads, PCM decode + spectral featurize via the
    actor pool."""
    return _media_spans(doc_ds, "wav").map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=_pool_size(concurrency),
        num_cpus=1,
    )


def media_frame_sample(doc_ds, n_samples: int = 4, concurrency=None):
    """Interleaved docs -> sampled-frame feature rows (fan-out: up to
    n_samples rows per media span): explode, fetch RAWV1 clips,
    seek-decode + featurize only the sampled frames via the actor pool."""
    return _media_spans(doc_ds, "video").map_batches(
        MediaFrameSampler,
        fn_constructor_kwargs={"n_samples": n_samples},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=_pool_size(concurrency),
        num_cpus=1,
    )
