"""Hash-partitioned document reassembly.

The explicit shuffle of the pipeline: corrected span rows are partitioned
on ``hash(doc_id) % P`` (the ONE partitioning key the pipeline reuses —
output fragments and the lineage manifest use the same pid), then each
partition is reassembled VECTORIZED: one sort + one run-length scan + one
ListArray construction per partition, not one Python call per document.

Skew note: documents were already salted to span granularity by the
explode stage; a 10^4-span document is just 10^4 rows inside one
partition, handled by the same vectorized kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..datagen import SPAN_TYPE

OUT_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])


def stable_partition_ids(doc_ids, num_partitions: int) -> np.ndarray:
    """Deterministic (cross-process, PYTHONHASHSEED-independent) partition
    id per doc_id: pandas' fixed-key siphash."""
    arr = np.asarray(doc_ids, dtype=object)
    return (pd.util.hash_array(arr, categorize=False) % num_partitions).astype(np.int32)


# String columns dictionary-encoded across the reassembly exchange.
# ``doc_id`` repeats once per span (~10x), ``kind`` has 4 distinct values
# and ``media_ref`` is "" for every non-media span — as dictionaries they
# ship as int32 indices + one small per-block dictionary instead of raw
# offsets+bytes per row, shrinking the one all-to-all exchange the
# pipeline has (the scaling bottleneck is object-store memcpy bandwidth,
# so exchange bytes buy scaling efficiency directly).  ``text`` is the
# corrected payload (near-unique) and stays raw.
EXCHANGE_DICT_COLS = ("doc_id", "kind", "media_ref")


def encode_exchange(batch: pa.Table) -> pa.Table:
    """Dictionary-encode the repetitive string columns before the shuffle.
    Idempotent; applied to EVERY producer feeding the exchange (corrector
    actors, the task-pool tail, the hybrid sentinel row) so all RefBundles
    crossing it carry one identical schema."""
    for name in EXCHANGE_DICT_COLS:
        i = batch.schema.get_field_index(name)
        if i < 0:
            continue
        col = batch.column(name)
        if not pa.types.is_dictionary(col.type):
            batch = batch.set_column(
                i, name, pc.dictionary_encode(col.combine_chunks())
            )
    return batch


def decode_exchange(part: pa.Table) -> pa.Table:
    """Inverse of ``encode_exchange`` after the shuffle (no-op on plain
    string columns, so the fused no-shuffle plan shares the kernel)."""
    for name in EXCHANGE_DICT_COLS:
        i = part.schema.get_field_index(name)
        if i >= 0 and pa.types.is_dictionary(part.schema.field(i).type):
            part = part.set_column(i, name, part.column(name).cast(pa.string()))
    return part


def add_partition_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    pids = stable_partition_ids(batch.column("doc_id").to_pylist(), num_partitions)
    batch = batch.append_column("pid", pa.array(pids, pa.int32()))
    return encode_exchange(batch)


def reassemble_partition(part: pa.Table) -> pa.Table:
    """One hash partition of span rows -> document rows (doc_id, spans),
    spans sorted by offset within each doc."""
    if part.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.string()), "spans": pa.array([], pa.list_(SPAN_TYPE))})
    part = decode_exchange(part).combine_chunks()
    idx = pc.sort_indices(
        part, sort_keys=[("doc_id", "ascending"), ("offset", "ascending")]
    )
    part = part.take(idx)
    # run-length scan stays in Arrow: offset-1 slice equality finds doc
    # boundaries with no pandas object-array copy of the string column
    doc = part.column("doc_id").combine_chunks()
    n = len(doc)
    neq = pc.invert(pc.equal(doc.slice(1, n - 1), doc.slice(0, n - 1)))
    starts = np.concatenate(
        ([0], np.flatnonzero(np.asarray(pc.fill_null(neq, True))) + 1)
    )
    offsets = np.append(starts, n).astype(np.int32)

    struct = pa.StructArray.from_arrays(
        [
            part.column("kind").combine_chunks(),
            part.column("text").combine_chunks(),
            part.column("media_ref").combine_chunks(),
            part.column("offset").combine_chunks(),
        ],
        fields=list(SPAN_TYPE),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    return pa.table({"doc_id": doc.take(pa.array(starts)), "spans": spans})


def reassemble(ds, num_partitions: int, per_group=None, has_pid: bool = False):
    """span-row Dataset -> document Dataset via the explicit hash shuffle
    on ``pid = hash(doc_id) % num_partitions``.

    ``groupby(pid).map_groups`` is used (NOT bare key-repartition +
    per-block maps): the groupby contract guarantees every group arrives
    whole in one call regardless of how the shuffle implementation chunks
    its output blocks — a key-repartition can legally emit one partition
    as several blocks, splitting a document mid-stream.  Reassembly inside
    the group is fully vectorized (one sort + run-length scan + ListArray
    build per partition, not per doc).

    The shuffle implementation (sort-based vs Ray's HASH_SHUFFLE) is a
    DataContext knob, orthogonal to correctness here.

    ``per_group``: optional extra callable applied to each reassembled
    partition table inside the same group call (used by the checkpoint
    writer so each partition is written exactly once).

    ``has_pid``: the upstream stage already appended the pid column
    (fused), skip the extra pass.
    """
    if not has_pid:
        ds = ds.map_batches(
            add_partition_column,
            batch_format="pyarrow",
            fn_kwargs={"num_partitions": num_partitions},
        )

    def _group_fn(t: pa.Table) -> pa.Table:
        out = reassemble_partition(t.drop_columns(["pid"]))
        return per_group(out) if per_group is not None else out

    return ds.groupby("pid", num_partitions=num_partitions).map_groups(
        _group_fn, batch_format="pyarrow"
    )
