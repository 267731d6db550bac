"""End-to-end conformance: both physical plans of the Ray pipeline must
reproduce the serial oracle's span sequences exactly —
``(kind, text, media_ref, order)`` per document (FIXTURES.md §2)."""

import pyarrow.parquet as pq
import pytest

from ocr_corrector_ray import datagen, oracle
from ocr_corrector_ray.pipelines.correct import corrected_dataset

N_DOCS = 400


def _span_key(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return datagen.corpus_path(N_DOCS)


@pytest.fixture(scope="module")
def expected(corpus, resources, cfg):
    docs = pq.read_table(corpus).to_pylist()
    rows = oracle.correct_table(docs, resources, cfg)
    return {r["doc_id"]: _span_key(r["spans"]) for r in rows}


@pytest.mark.parametrize("mode", ["explode", "fused", "hybrid"])
def test_pipeline_matches_oracle(ray_session, corpus, expected, cfg, mode):
    # a LOW hybrid threshold forces real traffic down BOTH branches
    # (corpus docs average ~10 spans; the default 512 would route
    # everything fused and leave the explode branch untested)
    kw = {"span_threshold": 10} if mode == "hybrid" else {}
    out = corrected_dataset(corpus, cfg, mode=mode, **kw).take_all()
    got = {r["doc_id"]: _span_key(r["spans"]) for r in out}
    assert set(got) == set(expected)
    mismatched = [k for k in expected if got[k] != expected[k]]
    assert mismatched == []


def test_modes_agree_and_spans_ordered(ray_session, corpus, cfg):
    a = corrected_dataset(corpus, cfg, mode="explode").take_all()
    b = corrected_dataset(corpus, cfg, mode="fused").take_all()
    c = corrected_dataset(corpus, cfg, mode="hybrid", span_threshold=10).take_all()
    da = {r["doc_id"]: _span_key(r["spans"]) for r in a}
    db = {r["doc_id"]: _span_key(r["spans"]) for r in b}
    dc = {r["doc_id"]: _span_key(r["spans"]) for r in c}
    assert da == db
    assert da == dc
    for spans in da.values():
        offs = [s[3] for s in spans]
        assert offs == sorted(offs)


def test_media_spans_byte_identical(ray_session, corpus, cfg):
    src = {
        r["doc_id"]: sorted(
            ((s["offset"], s["media_ref"]) for s in r["spans"] if s["kind"] == "image")
        )
        for r in pq.read_table(corpus).to_pylist()
    }
    out = corrected_dataset(corpus, cfg, mode="explode").take_all()
    for r in out:
        media = sorted(
            (s["offset"], s["media_ref"]) for s in r["spans"] if s["kind"] == "image"
        )
        assert media == src[r["doc_id"]]
        for s in r["spans"]:
            if s["kind"] == "image":
                assert s["text"] == ""


@pytest.fixture(scope="module")
def bucketized(ray_session, corpus, tmp_path_factory):
    from ocr_corrector_ray.state.checkpoint import bucketize_input

    bdir = str(tmp_path_factory.mktemp("delta") / "buckets")
    bucketize_input(corpus, bdir, 8)
    return bdir


def test_delta_plan_matches_oracle(ray_session, bucketized, expected, cfg):
    """mode='delta' (changed-spans-only exchange + co-partitioned bucket
    re-read, stages/delta.py) must reproduce the oracle exactly —
    including partitions whose bucket had zero corrections (sentinel
    keep-alive path)."""
    out = corrected_dataset(bucketized, cfg, mode="delta").take_all()
    got = {r["doc_id"]: _span_key(r["spans"]) for r in out}
    assert set(got) == set(expected)
    mismatched = [k for k in expected if got[k] != expected[k]]
    assert mismatched == []


def test_delta_requires_bucketized_layout(ray_session, corpus):
    with pytest.raises(ValueError, match="bucketized"):
        corrected_dataset(corpus, mode="delta").take_all()


def test_delta_wide_layout_on_small_cluster(ray_session, corpus, expected,
                                            cfg, tmp_path_factory):
    """Regression guard for the small-host livelock (r5 s6): a 32-bucket
    layout on this 4-CPU test session used to spawn 32 shuffle
    aggregators that, with the corrector pool, reserved ~3.6/4 CPUs and
    starved every upstream task (the sf0.1 run never finished in 900 s).
    The exchange width is now capped at the cluster size, so this must
    complete promptly AND stay conformant — it also covers the
    several-logical-pids-per-physical-partition path the 8-bucket
    fixture never exercises."""
    from ocr_corrector_ray.state.checkpoint import bucketize_input

    bdir = str(tmp_path_factory.mktemp("delta_wide") / "buckets")
    bucketize_input(corpus, bdir, 32)
    out = corrected_dataset(bdir, cfg, mode="delta").take_all()
    got = {r["doc_id"]: _span_key(r["spans"]) for r in out}
    assert set(got) == set(expected)
    mismatched = [k for k in expected if got[k] != expected[k]]
    assert mismatched == []


def test_patch_codec_roundtrip():
    """encode_patch/apply_patch: substitutions, inserts, deletes, full
    rewrites, >u16 offsets, and empty strings all round-trip."""
    import random

    from ocr_corrector_ray.stages.delta import apply_patch, encode_patch

    rng = random.Random(7)
    pool = "abc还款频率一二三四五六七八九十xyz Z"
    cases = [
        ("", "abc"), ("abc", ""), ("same", "same2"),
        ("a" * 70000, "b" + "a" * 69999),          # pre/post > u16 fallback
        ("a" * 70000 + "x", "a" * 70000 + "y"),
    ]
    for _ in range(500):
        o = "".join(rng.choice(pool) for _ in range(rng.randint(0, 80)))
        t = list(o)
        k = rng.random()
        if k < 0.5:
            for _ in range(rng.randint(0, 4)):
                if t:
                    t[rng.randrange(len(t))] = rng.choice(pool)
            n = "".join(t)
        elif k < 0.7:
            t.insert(rng.randint(0, len(t)), rng.choice(pool))
            n = "".join(t)
        elif k < 0.9:
            if t:
                del t[rng.randrange(len(t))]
            n = "".join(t)
        else:
            n = "".join(rng.choice(pool) for _ in range(rng.randint(0, 80)))
        cases.append((o, n))
    for o, n in cases:
        assert apply_patch(o, encode_patch(o, n)) == n


def test_patch_codec_roundtrip_hypothesis():
    """Property: apply_patch(o, encode_patch(o, n)) == n for ARBITRARY
    unicode strings — including astral-plane code points (4-byte utf-8,
    one code point in Python slicing, so both patch ops must agree on
    code-point positions, not byte offsets)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_corrector_ray.stages.delta import apply_patch, encode_patch

    text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
        max_size=200,
    )

    @settings(max_examples=300, deadline=None)
    @given(o=text, n=text)
    def check(o, n):
        assert apply_patch(o, encode_patch(o, n)) == n

    check()
