"""Workaround for a hash-shuffle schema-broadcast race in Ray 2.49.

``HashShuffleOperator`` disseminates the exchange's schema to its
aggregator actors exactly once per input sequence: the FIRST submitted
block is shuffled with ``send_empty_blocks=True`` so every partition —
including ones that end up empty — receives at least one schema-typed
(possibly 0-row) shard, and ``Concat.finalize`` can ``sort_by`` the key
columns.  But ``_shuffle_block`` returns early for a 0-row input block
WITHOUT fanning out any schema shards, while the driver has already set
``_has_schemas_broadcasted[input_index] = True``.  So when the first
block to reach a shuffle happens to be empty (map tasks whose UDF yields
nothing still emit one empty block per input block — observed with a
``MapBatches`` generator that filters empty batches), the broadcast is
silently eaten and every empty output partition later crashes with

    pyarrow.lib.ArrowInvalid: Invalid sort key column:
        No match for FieldRef.Name(<key>) in <empty schema>

Which block arrives first depends on task completion order, so the crash
is load-dependent: a ``grouped_agg`` (whose per-partition finish emits
0-row blocks for empty coarse buckets) followed by a second
``groupby(...).map_groups`` hits it intermittently
(``lang_quantile_chars`` was the first observed casualty).

The fix is driver-side and surgical: 0-row blocks contribute nothing to
a hash shuffle (``_shuffle_block`` drops them on arrival) EXCEPT for
their ability to consume the one-shot schema broadcast — so we strip
them from every input bundle before ``_do_add_input_inner`` submits
shuffle tasks.  An all-empty input sequence behaves exactly as before
(no schema ever becomes known — unchanged failure mode, which the
pipelines already guard with sentinel rows where it can occur).

Deterministic reproducer + regression test: tests/test_rayfix.py.
"""

from __future__ import annotations

_PATCHED = False


def apply() -> bool:
    """Install the patch (idempotent).  Returns True when active."""
    global _PATCHED
    if _PATCHED:
        return True
    try:
        from ray.data._internal.execution.interfaces import RefBundle
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase,
        )
    except ImportError:  # Ray moved the internals: fail open, no patch
        return False

    target = getattr(HashShufflingOperatorBase, "_do_add_input_inner", None)
    # only patch the code shape we analyzed: the method must be the one
    # consuming the one-shot broadcast flag
    if target is None or not _references_broadcast_flag(target):
        return False

    orig = target

    def _do_add_input_inner(self, input_bundle, input_index):
        blocks = [
            (ref, meta)
            for ref, meta in input_bundle.blocks
            # num_rows is Optional in BlockMetadata: unknown row counts
            # must pass through (they may well be non-empty)
            if meta.num_rows is None or meta.num_rows > 0
        ]
        if len(blocks) == len(input_bundle.blocks):
            return orig(self, input_bundle, input_index)
        if not blocks:
            return None  # all-empty bundle: nothing to shuffle
        sub = RefBundle(
            tuple(blocks),
            schema=input_bundle.schema,
            owns_blocks=input_bundle.owns_blocks,
        )
        return orig(self, sub, input_index)

    _do_add_input_inner._ocr_corrector_rayfix = True  # introspection marker
    HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner
    _PATCHED = True
    return True


def _references_broadcast_flag(fn) -> bool:
    try:
        return "_has_schemas_broadcasted" in fn.__code__.co_names
    except Exception:
        return False
