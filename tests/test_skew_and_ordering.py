"""Skew (pathologically long documents) and ordering invariants."""

import random

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_corrector_ray import datagen, oracle
from ocr_corrector_ray.datagen import DOC_SCHEMA, SPAN_TYPE


def _doc_table(rows):
    return pa.table(
        {
            "doc_id": [r["doc_id"] for r in rows],
            "biz": [r["biz"] for r in rows],
            "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_TYPE)),
            "probs": pa.array([r["probs"] for r in rows], type=pa.list_(pa.list_(pa.float32()))),
        },
        schema=DOC_SCHEMA,
    )


def _key(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_long_document_skew(ray_session, resources, cfg):
    """A 2,000-span document (the salt-split path) must come back whole,
    ordered and byte-equal to the oracle, alongside tiny docs."""
    import ray.data

    from ocr_corrector_ray.pipelines.correct import corrected_dataset

    rng = random.Random(99)
    kws, _, _ = datagen.static_tables()
    inj = datagen.injection_map()

    spans, probs = [], []
    for off in range(2000):
        kw = kws[rng.randrange(len(kws))]
        text, p = datagen._inject_errors(kw, rng, inj, 0.3)
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": off})
        probs.append(p)
    rows = [{"doc_id": "doc-long", "biz": "report", "spans": spans, "probs": probs}]
    for i in range(20):
        _, biz, sp, pp = datagen._make_doc(i, 7, kws, inj)
        rows.append({"doc_id": f"doc-s{i}", "biz": biz, "spans": sp, "probs": pp})

    expected = {
        r["doc_id"]: _key(r["spans"])
        for r in oracle.correct_table(rows, resources, cfg)
    }
    out = corrected_dataset(ray.data.from_arrow(_doc_table(rows)), cfg, num_partitions=4).take_all()
    got = {r["doc_id"]: _key(r["spans"]) for r in out}
    assert got == expected
    assert len(got["doc-long"]) == 2000
    assert [s[3] for s in got["doc-long"]] == list(range(2000))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_span_order_restoration_is_permutation_invariant(ray_session, resources, cfg, seed):
    """Property: spans may arrive in ANY stored order; the pipeline output
    is always sorted by offset and identical to the oracle's."""
    import ray.data

    from ocr_corrector_ray.pipelines.correct import corrected_dataset

    rng = random.Random(seed)
    kws, _, _ = datagen.static_tables()
    inj = datagen.injection_map()
    rows = []
    for i in range(3):
        doc_id, biz, spans, probs = datagen._make_doc(seed * 10 + i, 13, kws, inj)
        paired = list(zip(spans, probs))
        rng.shuffle(paired)  # scramble the stored span order
        rows.append(
            {
                "doc_id": doc_id,
                "biz": biz,
                "spans": [p[0] for p in paired],
                "probs": [p[1] for p in paired],
            }
        )
    expected = {
        r["doc_id"]: _key(r["spans"]) for r in oracle.correct_table(rows, resources, cfg)
    }
    out = corrected_dataset(
        ray.data.from_arrow(_doc_table(rows)), cfg, num_partitions=2, concurrency=1
    ).take_all()
    got = {r["doc_id"]: _key(r["spans"]) for r in out}
    assert got == expected
    for spans in got.values():
        offs = [s[3] for s in spans]
        assert offs == sorted(offs)
