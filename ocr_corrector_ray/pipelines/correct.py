"""The flagship pipeline: interleaved documents -> extracted + corrected
documents.

Three physical plans over identical semantics (conformance-tested against
each other and against the serial oracle):

- ``mode='explode'`` (default): explode docs to span rows (salt split) ->
  stateless extraction -> corrector actor pool -> hash-partitioned
  vectorized reassembly (the one explicit shuffle, keyed on
  hash(doc_id)).
- ``mode='fused'``: one actor-pool stage over whole document rows, zero
  shuffles — optimal when documents are known small/uniform.
- ``mode='hybrid'`` (the bench headline): docs at or under
  ``span_threshold`` spans take the fused no-shuffle path; only OVERSIZED
  docs (the skew tail the explode plan exists for) pay the
  explode->shuffle->reassemble cycle.  The r1 bench showed the shuffle
  costs ~1/3 of the explode plan's wall time while >99.9% of docs are
  small — hybrid keeps the skew immunity and drops the shuffle for the
  common case.  Cost: the input is READ twice (each branch filters the
  other's docs right at the read); a re-scan of pruned columns is far
  cheaper than an all-to-all exchange of the same rows, and the two
  branches stream concurrently.

None materializes the dataset; all stream block-by-block with
backpressure and can be consumed by ``write_parquet`` / ``iter_batches``.
(The checkpointed runner uses the explode plan: its per-partition writer
runs inside the reassembly groupby, which the fused branch doesn't have.)
"""

from __future__ import annotations

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


_HYBRID_SEED = "__hybrid_seed__"


def _route_by_span_count(batch, keep_small: bool, thr: int):
    """Arrow filter on the span-list length — the hybrid plan's router."""
    import pyarrow.compute as pc

    n = pc.list_value_length(batch.column("spans"))
    mask = pc.less_equal(n, thr) if keep_small else pc.greater(n, thr)
    return batch.filter(pc.fill_null(mask, keep_small))


def corrected_dataset(
    source,
    cfg: Optional[CorrectorConfig] = None,
    mode: str = "explode",
    concurrency: Optional[int] = None,
    batch_size: int = 1024,
    num_partitions: Optional[int] = None,
    side_ref=None,
    per_group=None,
    span_threshold: int = 4096,
):
    """Build the (lazy) corrected-document Dataset.

    ``source``: a parquet path/dir or an existing ``ray.data.Dataset`` with
    the interleaved-doc schema.  ``side_ref``: optional pre-broadcast
    ``ray.put`` ref of the side-data bundle; created once here otherwise.
    ``span_threshold``: hybrid-mode routing bound — docs with more spans
    than this take the explode plan.  The fused stage handles moderate
    skew internally (its in-actor kernels are vectorized over the whole
    batch), so the bound marks docs too large for ONE actor batch —
    several times the typical spans-per-batch (256 docs x ~10 spans), not
    the p99 doc.  Routing 10-20% of spans down the shuffle path costs
    more than vectorized in-batch stragglers do (measured at sf0.1).
    """
    cfg = cfg or CorrectorConfig()
    if mode == "delta":
        # changed-spans-only exchange over a bucketized input (the
        # co-partitioned map-side join plan; see stages/delta.py)
        from ..stages.delta import delta_corrected_dataset

        if not isinstance(source, str):
            raise ValueError("mode='delta' needs a bucketized input path")
        return delta_corrected_dataset(
            source, cfg=cfg, concurrency=concurrency,
            batch_size=batch_size, side_ref=side_ref, per_group=per_group,
        )
    enable_hash_shuffle()
    # Block-granularity note (r4): capping target_max_block_size to 2 MiB
    # to shrink the corrector pool's task quantum was A/B-tested at the
    # 16x corpus / 32 CPUs and LOST (best-of-2: 67.3 s vs 55.7 s with the
    # parquet-natural ~5 MB blocks) — the per-task fixed costs (dict
    # re-encode, scheduler round-trips) outweigh the tail-straggle saving.
    # Blocks stay at the read's natural row-group granularity.

    def _source():
        return ray.data.read_parquet(source) if isinstance(source, str) else source

    ds = _source()
    cpus = _cluster_cpus()
    num_partitions = num_partitions or cpus
    # actor-pool sizing: actors HOLD their CPUs, so the pool plus the
    # hash-shuffle aggregator actors (0.05 CPU x partitions) must leave
    # whole CPUs free for the transient tasks (read / reassembly) or the
    # pipeline deadlocks.  The share is a deliberately PROPORTIONAL
    # constant per plan — the corrector:everything-else CPU split stays
    # the same across cluster sizes, which both pipelines well and makes
    # scaling measurements honest (a pool share that grows with cluster
    # size shows fake super-linear scaling).
    #
    # Per-plan share (r4 stage audit at the 16x scaling corpus, 32 CPUs):
    # - explode: 1/2 — the pid exchange + flatten + read tasks genuinely
    #   use the other half (pool-share sweep: 16 ~= 20 ~= 24, 28 worse).
    # - fused/hybrid: 3/4 — there is no main exchange; with a 1/2 share
    #   the non-pool half did ~10s of total CPU work over a 66s run
    #   (reads are even plan-dedup-cached), i.e. ~16 CPUs sat idle.
    #   Clamped so at least one whole CPU plus the tail aggregators'
    #   fractional holds stay free (4-CPU clusters: 3/4 of 4 = 3 actors
    #   + 2x0.05 aggregators would leave 0.9 free and deadlock the read).
    #   An ABSOLUTE reserve (cpus - max(2, cpus/8), i.e. 28 actors at 32
    #   CPUs) measured 44.0s vs 24 actors' 49.4s in one quiet-host sweep,
    #   but (a) the delta is inside the same host's day-to-day noise band
    #   (28 actors re-measured 48.0-50.6s the next day) and (b) a pool
    #   share that GROWS with cluster size (50% at 4 CPUs, 87.5% at 32)
    #   inflates measured scaling — a 4/16 run under it reported a fake
    #   1.33 efficiency.  The share stays PROPORTIONAL.
    if concurrency is None:
        if mode == "explode":
            concurrency = max(1, cpus // 2)
        else:
            concurrency = max(1, min((3 * cpus) // 4, int(cpus - 1.2)))
    if side_ref is None:
        side_ref = ray.put(default_side_data())

    def fused_branch(doc_ds, pool):
        return doc_ds.map_batches(
            DocCorrector,
            fn_constructor_kwargs={"cfg": cfg, "side": side_ref},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=pool,
            num_cpus=1,
        )

    def explode_branch(doc_ds, pool, seed_schema: bool = False, task_cap=None,
                       n_parts: Optional[int] = None):
        n_parts = n_parts or num_partitions
        cap = {"concurrency": task_cap} if task_cap else {}
        spans = doc_ds.map_batches(explode_docs, batch_format="pyarrow", **cap)
        spans = spans.map_batches(extract_batch, batch_format="pyarrow", **cap)
        if pool is None:
            # task-pool corrector (per-worker cached state): used for the
            # hybrid tail stream, which is empty most of the time — an
            # actor pool would reserve CPUs it never uses.  task_cap keeps
            # this chain from flooding the free CPUs and starving the
            # fused branch's read tasks.
            from ..stages.correct_stage import span_corrector_task

            spans = spans.map_batches(
                span_corrector_task,
                fn_kwargs={
                    "cfg": cfg,
                    "side": side_ref,
                    "num_partitions": n_parts,
                },
                batch_format="pyarrow",
                batch_size=batch_size,
                **cap,
            )
        else:
            spans = spans.map_batches(
                SpanCorrector,
                fn_constructor_kwargs={
                    "cfg": cfg,
                    "side": side_ref,
                    "num_partitions": n_parts,  # fused pid hashing
                },
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=pool,
                num_cpus=1,
            )
        if seed_schema:
            # the hybrid big branch can be COMPLETELY empty (no oversized
            # docs).  Ray drops empty blocks — the groupby below would see
            # no schema — and the hash-shuffle aggregators crash outright
            # on an all-empty exchange.  One SENTINEL span row keeps the
            # shuffle non-empty; the sentinel doc is dropped right after
            # reassembly.
            import pyarrow as pa

            from ..stages.reassemble import encode_exchange

            seed = encode_exchange(pa.table({
                "doc_id": pa.array([_HYBRID_SEED], pa.string()),
                "kind": pa.array(["text"], pa.string()),
                "text": pa.array([""], pa.string()),
                "media_ref": pa.array([""], pa.string()),
                "offset": pa.array([0], pa.int32()),
                "pid": pa.array([0], pa.int32()),
            }))
            spans = spans.union(ray.data.from_arrow(seed))
        out = reassemble(spans, n_parts, per_group=per_group, has_pid=True)
        if seed_schema:
            import pyarrow.compute as pc

            out = out.map_batches(
                lambda b: b.filter(
                    pc.invert(pc.equal(b.column("doc_id"), _HYBRID_SEED))
                ),
                batch_format="pyarrow",
            )
        return out

    if mode == "fused":
        return fused_branch(ds, concurrency)
    if mode == "hybrid":
        # the fused pool keeps the full half-cluster share; the tail
        # branch runs as TASKS (per-worker cached corrector state), so it
        # consumes CPUs only when oversized docs actually flow — the
        # proportional pool:task split stays identical across cluster
        # sizes (honest scaling)
        tail_cap = max(1, cpus // 8)
        # the tail shuffle gets FEWER partitions than the main plan: each
        # hash-shuffle partition spawns an aggregator actor whose startup
        # is pure overhead when the tail is near-empty (32 aggregators
        # cost ~5s of wall at 32 CPUs; the tail rarely needs more than a
        # handful of partitions).  (A sort-based tail shuffle was tried
        # and measured 3x WORSE here — the strategy is a context-global
        # knob, so flipping it for one branch degrades the whole plan.)
        tail_parts = max(2, cpus // 8)
        small = _source().map_batches(
            _route_by_span_count, batch_format="pyarrow",
            fn_kwargs={"keep_small": True, "thr": span_threshold},
        )
        big = _source().map_batches(
            _route_by_span_count, batch_format="pyarrow",
            fn_kwargs={"keep_small": False, "thr": span_threshold},
            concurrency=tail_cap,
        )
        tail = explode_branch(big, None, seed_schema=True, task_cap=tail_cap,
                              n_parts=tail_parts)
        return fused_branch(small, concurrency).union(tail)
    return explode_branch(ds, concurrency)
