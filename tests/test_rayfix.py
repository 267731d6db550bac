"""Regression test for the Ray 2.49 hash-shuffle schema-broadcast race
(ocr_corrector_ray.rayfix).

Without the patch: the first block reaching a hash shuffle being EMPTY
consumes the operator's one-shot schema broadcast without fanning any
schema-typed shard out, so every empty output partition crashes in
``Concat.finalize`` with ``ArrowInvalid: Invalid sort key column: No
match for FieldRef.Name(k) in <empty schema>``.  The reproducer makes
half the upstream blocks empty and fast (the non-empty ones sleep), so
an empty block deterministically wins the race, and uses 8 shuffle
partitions over 3 distinct keys so empty output partitions are
guaranteed.
"""

import time

import pandas as pd
import pytest

import ocr_corrector_ray  # noqa: F401  (applies the patch on import)
from ocr_corrector_ray import rayfix


def test_patch_is_active():
    import ray.data._internal.execution.operators.hash_shuffle as hs

    assert rayfix._PATCHED
    assert getattr(
        hs.HashShufflingOperatorBase._do_add_input_inner,
        "_ocr_corrector_rayfix",
        False,
    )


def test_empty_first_block_does_not_eat_schema_broadcast(ray_session):
    import pyarrow as pa
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        ds = ray.data.range(16, override_num_blocks=16)

        def mk(batch: pd.DataFrame):
            i = int(batch["id"].iloc[0])
            if i % 2 == 1:
                out = pd.DataFrame(
                    {"k": pd.Series([], dtype="int64"),
                     "v": pd.Series([], dtype="int64")}
                )
            else:
                time.sleep(0.5)  # let the empty blocks reach the shuffle first
                out = pd.DataFrame({"k": [i % 3], "v": [i]})
            return pa.Table.from_pandas(
                out, preserve_index=False
            ).replace_schema_metadata(None)

        spans = ds.map_batches(mk, batch_format="pandas", batch_size=None)

        def per_group(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"k": [df["k"].iloc[0]], "s": [int(df["v"].sum())]}
            )

        out = (
            spans.groupby("k", num_partitions=8)
            .map_groups(per_group, batch_format="pandas")
            .to_pandas()
        )
        assert sorted(out["s"].tolist()) == [14, 18, 24]
    finally:
        ctx.shuffle_strategy = prev
