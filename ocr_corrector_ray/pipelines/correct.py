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


def corrected_dataset(
    source,
    cfg: Optional[CorrectorConfig] = None,
    mode: str = "explode",
    concurrency: Optional[int] = None,
    batch_size: int = 1024,
    num_partitions: Optional[int] = None,
    side_ref=None,
):
    """Build the (lazy) corrected-document Dataset.

    ``source``: a parquet path/dir or an existing ``ray.data.Dataset`` with
    the interleaved-doc schema.  ``side_ref``: optional pre-broadcast
    ``ray.put`` ref of the side-data bundle; created once here otherwise.
    """
    cfg = cfg or CorrectorConfig()
    if isinstance(source, str):
        ds = ray.data.read_parquet(source)
    else:
        ds = source

    cpus = _cluster_cpus()
    concurrency = concurrency or max(2, cpus - 2)
    num_partitions = num_partitions or 4 * cpus
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
        fn_constructor_kwargs={"cfg": cfg, "side": side_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return reassemble(spans, num_partitions)
