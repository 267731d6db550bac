"""Per-partition checkpoint / lineage / resume.

Output layout (the "Lance fragment" layout; parquet is the storage driver
in this sandbox — ``storage.py`` switches to Lance when the library is
importable, SURVEY.md §7.0):

    out_dir/
      parts/part-<pid>.parquet        # corrected docs of hash partition pid
      manifest/part-<pid>.json        # lineage row, written AFTER the data
                                      # file is atomically renamed in place

Crash consistency: a partition is "done" iff its manifest row exists; the
data file is renamed into place before the manifest is written, so a crash
between the two steps just recomputes that partition.  Resume is a
broadcast ANTI-JOIN: the done-pid set (tiny) is shipped to every read
task, which drops documents whose hash partition is already complete
(SURVEY.md §2.4).

Manifest row schema (FIXTURES.md §8): partition_id, input_fingerprint,
rows_in, spans_corrected, wall_s, status.

Scale note: resume still READS every input row before the anti-join drops
completed partitions (row-level filtering cannot prune parquet files that
mix partitions).  At corpus scale, lay the INPUT out bucketed by the same
``hash(doc_id) % P`` so a resume skips whole files; the engine's one-key
partitioning discipline makes that layout natural.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional, Set

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..stages.reassemble import stable_partition_ids


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def _parts_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "parts")


def done_partitions(out_dir: str) -> Set[int]:
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name)) as f:
                    row = json.load(f)
                if row.get("status") == "done":
                    done.add(int(row["partition_id"]))
            except (ValueError, OSError, KeyError):
                continue
    return done


def read_manifest(out_dir: str) -> pa.Table:
    rows = []
    mdir = _manifest_dir(out_dir)
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    rows.append(json.load(f))
    return pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)


def filter_pending(ds, out_dir: str, num_partitions: int):
    """Broadcast anti-join: drop docs whose partition already completed."""
    done = done_partitions(out_dir)
    if not done:
        return ds
    done_ref = ray.put(done)

    def drop_done(batch: pa.Table) -> pa.Table:
        done_set = ray.get(done_ref)
        pids = stable_partition_ids(batch.column("doc_id").to_pylist(), num_partitions)
        import numpy as np

        mask = ~np.isin(pids, list(done_set))
        return batch.filter(pa.array(mask))

    return ds.map_batches(drop_done, batch_format="pyarrow")


MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("input_fingerprint", pa.string()),
        ("rows_in", pa.int64()),
        ("spans_corrected", pa.int64()),
        ("wall_s", pa.float64()),
        ("status", pa.string()),
    ]
)


def write_partition(batch: pa.Table, out_dir: str, num_partitions: int) -> pa.Table:
    """Terminal STATELESS stage over reassembled (doc_id, spans) partition
    blocks: writes one parquet fragment + one manifest row per partition
    and emits the manifest row downstream.  Every row of an input batch
    belongs to one hash partition by construction (reassemble() contract).
    Stateless tasks on purpose — writers must not reserve pool CPUs
    alongside the corrector actors (deadlock on small clusters)."""
    t0 = time.perf_counter()
    if batch.num_rows == 0:
        return pa.Table.from_pylist([], schema=MANIFEST_SCHEMA)
    os.makedirs(_parts_dir(out_dir), exist_ok=True)
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    doc_ids = batch.column("doc_id").to_pylist()
    pid = int(stable_partition_ids(doc_ids[:1], num_partitions)[0])

    data_path = os.path.join(_parts_dir(out_dir), f"part-{pid:05d}.parquet")
    tmp = data_path + f".tmp.{os.getpid()}"
    pq.write_table(batch, tmp)
    os.replace(tmp, data_path)  # atomic: data visible before manifest

    # guard against a mis-sized pipeline splitting one hash partition
    # across two blocks (two writers for one pid would silently clobber
    # each other): the second writer sees a manifest with a different
    # fingerprint and fails loudly.
    mpath = os.path.join(_manifest_dir(out_dir), f"part-{pid:05d}.json")
    fp = hashlib.md5("\n".join(sorted(doc_ids)).encode()).hexdigest()
    if os.path.exists(mpath):
        with open(mpath) as f:
            prev = json.load(f)
        if prev.get("input_fingerprint") != fp:
            raise RuntimeError(
                f"partition {pid} written twice with different contents — "
                "num_partitions too small for the block-size budget"
            )
    spans_total = sum(len(s) for s in batch.column("spans").to_pylist())
    row = {
        "partition_id": pid,
        "input_fingerprint": fp,
        "rows_in": len(doc_ids),
        "spans_corrected": spans_total,
        "wall_s": round(time.perf_counter() - t0, 4),
        "status": "done",
    }
    mtmp = mpath + f".tmp.{os.getpid()}"
    with open(mtmp, "w") as f:
        json.dump(row, f)
    os.replace(mtmp, mpath)
    return pa.Table.from_pylist([row], schema=MANIFEST_SCHEMA)


def run_checkpointed(
    source: str,
    out_dir: str,
    num_partitions: int = 32,
    cfg=None,
    concurrency: Optional[int] = None,
):
    """Resumable flagship run: anti-join completed partitions, correct the
    rest, write fragments + lineage.  Returns the manifest table."""
    import ray.data

    from ..pipelines.correct import corrected_dataset, enable_hash_shuffle

    import functools

    enable_hash_shuffle()  # before the read: datasets snapshot the context
    ds = ray.data.read_parquet(source)
    ds = filter_pending(ds, out_dir, num_partitions)
    # the writer runs INSIDE the reassembly group call, so each hash
    # partition is written exactly once, whole, with its manifest row
    manifest_ds = corrected_dataset(
        ds,
        cfg=cfg,
        num_partitions=num_partitions,
        concurrency=concurrency,
        per_group=functools.partial(
            write_partition, out_dir=out_dir, num_partitions=num_partitions
        ),
    )
    manifest_ds.materialize()  # drives the whole pipeline; manifest is tiny
    return read_manifest(out_dir)


def read_corrected(out_dir: str):
    """Read the corrected-doc table back as a Dataset."""
    import ray.data

    return ray.data.read_parquet(_parts_dir(out_dir))
