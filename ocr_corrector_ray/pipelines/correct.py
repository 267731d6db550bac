"""The flagship pipeline: interleaved documents -> extracted + corrected
documents.

Two physical plans over identical semantics (conformance-tested against
each other and against the serial oracle):

- ``mode='explode'`` (default, the scale path): explode docs to span rows
  (salt split) -> stateless extraction -> corrector actor pool ->
  hash-partitioned vectorized reassembly (the one explicit shuffle, keyed
  on hash(doc_id)).
- ``mode='fused'``: one actor-pool stage over whole document rows, zero
  shuffles — optimal when documents are known small/uniform.

Neither materializes the dataset; both stream block-by-block with
backpressure and can be consumed by ``write_parquet`` / ``iter_batches``.
"""

from __future__ import annotations

import os
from typing import Optional

import ray
import ray.data

from ..correct import CorrectorConfig
from ..stages.correct_stage import DocCorrector, SpanCorrector, default_side_data
from ..stages.explode import explode_docs
from ..stages.extract_stage import extract_batch
from ..stages.reassemble import reassemble


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def enable_hash_shuffle() -> None:
    """Opt in to Ray's hash-based shuffle implementation (used by the
    reassembly's explicit hash(doc_id) repartition — no global sort
    barrier).  Must run BEFORE the input Dataset is created: datasets
    snapshot the DataContext at creation time.

    The aggregator actors get fractional CPUs and the default hash
    parallelism is bounded to the cluster size — the stock defaults
    (1 CPU/partition, 200 partitions) deadlock against actor pools on
    small CPU counts."""
    try:
        from ray.data.context import DataContext, ShuffleStrategy
    except ImportError:
        return
    if _cluster_cpus() < 4:
        # hash-shuffle aggregator actors cannot co-schedule with even a
        # one-actor corrector pool on a 2-3 CPU cluster; the sort-based
        # shuffle uses transient tasks and degrades gracefully instead
        return
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.default_hash_shuffle_parallelism = max(4, _cluster_cpus())


def corrected_dataset(
    source,
    cfg: Optional[CorrectorConfig] = None,
    mode: str = "explode",
    concurrency: Optional[int] = None,
    batch_size: int = 1024,
    num_partitions: Optional[int] = None,
    side_ref=None,
    per_group=None,
):
    """Build the (lazy) corrected-document Dataset.

    ``source``: a parquet path/dir or an existing ``ray.data.Dataset`` with
    the interleaved-doc schema.  ``side_ref``: optional pre-broadcast
    ``ray.put`` ref of the side-data bundle; created once here otherwise.
    """
    cfg = cfg or CorrectorConfig()
    enable_hash_shuffle()
    if isinstance(source, str):
        ds = ray.data.read_parquet(source)
    else:
        ds = source

    cpus = _cluster_cpus()
    num_partitions = num_partitions or cpus
    # actor-pool sizing: actors HOLD their CPUs, so the pool plus the
    # hash-shuffle aggregator actors (0.05 CPU x partitions) must leave
    # whole CPUs free for the transient tasks (read / reassembly) or the
    # pipeline deadlocks.  Half the cluster is a deliberately PROPORTIONAL
    # default — the corrector:everything-else CPU split stays constant
    # across cluster sizes, which both pipelines well and makes scaling
    # measurements honest (a pool share that grows with cluster size shows
    # fake super-linear scaling).
    if concurrency is None:
        concurrency = max(1, cpus // 2)
    if side_ref is None:
        side_ref = ray.put(default_side_data())

    if mode == "fused":
        return ds.map_batches(
            DocCorrector,
            fn_constructor_kwargs={"cfg": cfg, "side": side_ref},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=concurrency,
            num_cpus=1,
        )

    spans = ds.map_batches(explode_docs, batch_format="pyarrow")
    spans = spans.map_batches(extract_batch, batch_format="pyarrow")
    spans = spans.map_batches(
        SpanCorrector,
        fn_constructor_kwargs={
            "cfg": cfg,
            "side": side_ref,
            "num_partitions": num_partitions,  # fused pid hashing
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return reassemble(spans, num_partitions, per_group=per_group, has_pid=True)
