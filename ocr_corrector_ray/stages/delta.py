"""Delta-exchange plan: only CHANGED spans cross the reassembly shuffle.

In the explode plan every span's corrected text crosses the all-to-all
exchange, but correction changes only a minority of spans (the Arrow
pre-mask already proves most spans can't change).  When the input is
bucketized by the SAME ``hash(doc_id) % P`` key the reassembly
partitions use (``state.checkpoint.bucketize_input`` — at corpus scale
this is simply the write layout of whatever job produced the input, and
the layout the checkpointed runner already requires for file-level
resume pruning), the clean spans don't need to travel at all:

- corrector branch: bucket files -> explode -> extract -> actor-pool
  correction -> filter to spans whose text actually changed -> the
  exchange carries minimal ``(doc_id, offset, text, pid)`` rows;
- reassembly side: each partition re-reads ITS OWN bucket file (a
  pruned, co-partitioned storage read — the classic map-side join
  against a co-partitioned table; no shuffle, no driver hop),
  recomputes the deterministic extraction locally, patches the changed
  texts in with one vectorized Arrow join, and runs the same
  vectorized run-length reassembly as the explode plan.

One sentinel row per partition keeps every group alive even when a
partition had zero corrections (the group call is what re-emits that
partition's documents).

Conformance: tests/test_pipeline_conformance.py asserts span-sequence
equality ``(kind, text, media_ref, order)`` against the explode plan.
Exchange-byte accounting vs the explode plan is recorded in BASELINE.md.
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

_SENTINEL_OFFSET = -1

# minimal exchange row: doc_id stays dictionary-encoded across the
# shuffle (reassemble.encode_exchange); ``patch`` is the binary-encoded
# text delta (encode_patch) — a few bytes per changed span
DELTA_EXCHANGE_COLS = ("doc_id", "offset", "patch")

# ---- binary patch codec ---------------------------------------------
# Corrections are mostly 1:1 char substitutions on short spans, so the
# densest wire form is a tiny tagged byte string, not Arrow columns:
#   op 0 (substitutions): repeat of <uint16 pos><uint8 len><utf8 char>
#   op 1 (range replace): <uint16 pre><uint16 post><utf8 mid>
#       (new == orig[:pre] + mid + orig[len(orig)-post:])
#   op 2 (full replace):  <utf8 new>   — fallback when offsets overflow
# Positions/offsets are CODE POINTS (Python slicing semantics).

import struct

_U16 = struct.Struct("<H")
_MAX_U16 = 0xFFFF


def _lcp_len(a: str, b: str, hi: int) -> int:
    """Longest-common-prefix length via bisection on C-level slice
    equality (log(n) compares, no per-char Python loop)."""
    lo = 0
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if a[:mid] == b[:mid]:
            lo = mid
        else:
            hi = mid - 1
    return lo


def encode_patch(o: str, n: str) -> bytes:
    """Smallest of the three encodings for the change o -> n."""
    import numpy as np

    m = min(len(o), len(n))
    pre = _lcp_len(o, n, m)
    post = _lcp_len(o[::-1], n[::-1], m - pre)
    mid = n[pre: len(n) - post].encode("utf-8")
    if pre <= _MAX_U16 and post <= _MAX_U16:
        range_patch = b"\x01" + _U16.pack(pre) + _U16.pack(post) + mid
    else:
        range_patch = b"\x02" + n.encode("utf-8")
    if len(o) == len(n) and len(o) <= _MAX_U16:
        # vectorized diff positions: compare fixed-width code points
        a32 = np.frombuffer(o.encode("utf-32-le"), dtype=np.uint32)
        b32 = np.frombuffer(n.encode("utf-32-le"), dtype=np.uint32)
        pos = np.flatnonzero(a32 != b32)
        subs = b"\x00" + b"".join(
            _U16.pack(int(p)) + bytes([len(c)]) + c
            for p in pos
            for c in (n[int(p)].encode("utf-8"),)
            if len(c) <= 0xFF
        )
        # the join above silently skips >255-byte "chars" (impossible for
        # real code points, max utf-8 is 4) — keep the guard anyway
        if all(len(n[int(p)].encode("utf-8")) <= 0xFF for p in pos) and \
                len(subs) < len(range_patch):
            return subs
    return range_patch


def apply_patch(o: str, patch: bytes) -> str:
    op = patch[0]
    if op == 0:
        chars = list(o)
        i = 1
        while i < len(patch):
            p = _U16.unpack_from(patch, i)[0]
            ln = patch[i + 2]
            chars[p] = patch[i + 3: i + 3 + ln].decode("utf-8")
            i += 3 + ln
        return "".join(chars)
    if op == 1:
        pre = _U16.unpack_from(patch, 1)[0]
        post = _U16.unpack_from(patch, 3)[0]
        mid = patch[5:].decode("utf-8")
        return o[:pre] + mid + (o[len(o) - post:] if post else "")
    return patch[1:].decode("utf-8")


def bucket_paths(bucket_dir: str, layout: dict) -> list:
    ext = layout.get("format", "parquet")
    return sorted(
        os.path.join(bucket_dir, n)
        for n in os.listdir(bucket_dir)
        if n.startswith("bucket-") and n.endswith(f".{ext}")
    )


def _sentinels(num_partitions: int) -> pa.Table:
    """One keep-alive row per partition; dropped inside the group fn."""
    from .reassemble import encode_exchange

    return encode_exchange(pa.table({
        "doc_id": pa.array([""] * num_partitions, pa.string()),
        "offset": pa.array([_SENTINEL_OFFSET] * num_partitions, pa.int32()),
        "patch": pa.array([b""] * num_partitions, pa.binary()),
        "pid": pa.array(range(num_partitions), pa.int32()),
    }))


def make_patch_fn(bucket_dir: str, fmt: str, per_group=None):
    """Group fn for ``groupby(pid).map_groups``: re-read the partition's
    bucket file, recompute extraction, patch the changed texts, rebuild
    documents.  ``per_group`` mirrors reassemble()'s hook (checkpoint
    writer)."""
    from .explode import explode_docs
    from .extract_stage import extract_batch
    from .reassemble import decode_exchange, reassemble_partition

    def patch(group: pa.Table) -> pa.Table:
        from ..state.storage import get_driver

        driver = get_driver(fmt)
        pid = int(group.column("pid")[0].as_py())
        deltas = decode_exchange(group).drop_columns(["pid"])
        deltas = deltas.filter(
            pc.greater_equal(deltas.column("offset"), _SENTINEL_OFFSET + 1)
        ).select(list(DELTA_EXCHANGE_COLS))
        path = os.path.join(bucket_dir, f"bucket-{pid:05d}.{driver.extension}")
        if not os.path.exists(path):  # bucket with zero docs wrote no file
            out = reassemble_partition(pa.table({
                "doc_id": pa.array([], pa.string()),
                "kind": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "media_ref": pa.array([], pa.string()),
                "offset": pa.array([], pa.int32()),
            }))
            # the hook still sees the (empty) partition — a checkpoint
            # writer must record it as done or a resume would re-pend it
            return per_group(out) if per_group is not None else out
        # probs (the widest doc column) is never read on this side
        skel = driver.read_fragment(path, columns=["doc_id", "biz", "spans"])
        spans = extract_batch(explode_docs(skel)).select(
            ["doc_id", "kind", "text", "media_ref", "offset"]
        )
        if deltas.num_rows:
            joined = spans.join(deltas, keys=["doc_id", "offset"],
                                join_type="left outer").combine_chunks()
            hit = pc.is_valid(joined.column("patch"))
            sub = joined.filter(hit)
            patched = [
                apply_patch(o or "", p)
                for o, p in zip(
                    sub.column("text").to_pylist(),
                    sub.column("patch").to_pylist(),
                )
            ]
            txt = pc.replace_with_mask(
                joined.column("text").combine_chunks(),
                hit.combine_chunks() if isinstance(hit, pa.ChunkedArray) else hit,
                pa.array(patched, pa.string()),
            )
            spans = joined.set_column(
                joined.column_names.index("text"), "text", txt
            ).select(["doc_id", "kind", "text", "media_ref", "offset"])
        out = reassemble_partition(spans)
        return per_group(out) if per_group is not None else out

    return patch


def delta_corrected_dataset(
    bucket_dir: str,
    cfg=None,
    concurrency: Optional[int] = None,
    batch_size: int = 1024,
    side_ref=None,
    per_group=None,
):
    """Corrected-document Dataset over a bucketized input with the
    changed-spans-only exchange.  Raises when ``bucket_dir`` is not a
    ``bucketize_input`` layout (the co-partitioned re-read is the whole
    point; use mode='explode' for arbitrary inputs)."""
    import ray
    import ray.data

    from ..correct import CorrectorConfig
    from ..state.checkpoint import read_layout
    from ..state.storage import get_driver
    from .correct_stage import SpanCorrector, default_side_data
    from .explode import explode_docs
    from .extract_stage import extract_batch

    layout = read_layout(bucket_dir)
    if layout is None:
        raise ValueError(
            f"mode='delta' needs a bucketized input layout (_layout.json "
            f"under {bucket_dir}); run bucketize_input first or use "
            "mode='explode'"
        )
    if layout.get("key", "hash(doc_id)") != "hash(doc_id)":
        raise ValueError(f"unsupported bucket key {layout['key']!r}")
    num_partitions = int(layout["num_partitions"])
    fmt = layout.get("format", "parquet")

    from ..pipelines.correct import _cluster_cpus, enable_hash_shuffle

    enable_hash_shuffle()
    cfg = cfg or CorrectorConfig()
    cpus = _cluster_cpus()
    # explode-plan share: the patch side does real work (pruned read +
    # extraction + join + rebuild), so the pool keeps half the cluster
    concurrency = concurrency or max(1, cpus // 2)
    if side_ref is None:
        side_ref = ray.put(default_side_data())

    ds = get_driver(fmt).read_files(bucket_paths(bucket_dir, layout))
    spans = ds.map_batches(explode_docs, batch_format="pyarrow")
    spans = spans.map_batches(extract_batch, batch_format="pyarrow")
    deltas = spans.map_batches(
        SpanCorrector,
        fn_constructor_kwargs={
            "cfg": cfg,
            "side": side_ref,
            "num_partitions": num_partitions,
            "delta": True,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    deltas = deltas.union(ray.data.from_arrow(_sentinels(num_partitions)))
    # Exchange width decoupled from the LOGICAL bucket count (the house
    # rule, pipelines/_util.physical_partitions): map_groups fires once
    # per pid regardless, but each physical partition spawns a
    # hash-shuffle aggregator actor (0.05 CPU) AND bounds the patch
    # stage's task parallelism.  At 32 layout buckets on a 4-CPU host
    # the full 32 aggregators plus the 2x1-CPU corrector pool reserve
    # 3.6/4 CPUs and STARVE the 1-CPU upstream read/explode/extract
    # tasks — measured as a livelock (96% idle, ~25 s worker CPU over
    # 26 min).  Capping at the cluster size keeps the patch stage
    # cluster-wide on big hosts (32-way at 32 CPUs, the measured-good
    # config) and frees the small host.
    exchange_partitions = min(num_partitions, max(8, cpus))
    return deltas.groupby("pid", num_partitions=exchange_partitions).map_groups(
        make_patch_fn(bucket_dir, fmt, per_group=per_group),
        batch_format="pyarrow",
    )
