"""Round-2 checkpoint hardening: bucketed-input file pruning (VERDICT r1
item 5), the num_partitions resume guard (ADVICE r1), and the storage
driver seam (VERDICT r1 item 6)."""

import json
import os

import pytest

from ocr_corrector_ray import datagen


def _span_key(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_bucketed_input_resume_prunes_files(ray_session, tmp_path):
    from ocr_corrector_ray.state import checkpoint as ck

    corpus = datagen.corpus_path(200)
    buckets = str(tmp_path / "buckets")
    out = str(tmp_path / "out")
    P = 8

    ck.bucketize_input(corpus, buckets, P)
    layout = ck.read_layout(buckets)
    assert layout["num_partitions"] == P
    bucket_files = sorted(f for f in os.listdir(buckets) if f.startswith("bucket-"))
    assert len(bucket_files) == P
    # the bucketed layout holds exactly the corpus rows
    import ray.data

    assert ray.data.read_parquet(buckets).count() == 200

    manifest = ck.run_checkpointed(buckets, out, num_partitions=P)
    assert manifest.num_rows == P
    full = {r["doc_id"]: _span_key(r["spans"]) for r in ck.read_corrected(out).take_all()}
    assert len(full) == 200

    # lose two partitions; the resume's read plan must contain ONLY their
    # bucket files — completed partitions' files never enter the read
    lost = [2, 5]
    for pid in lost:
        os.remove(os.path.join(out, "parts", f"part-{pid:05d}.parquet"))
        os.remove(os.path.join(out, "manifest", f"part-{pid:05d}.json"))
    pending = ck.pending_input_files(buckets, out, layout)
    assert [os.path.basename(p) for p in pending] == [
        f"bucket-{pid:05d}.parquet" for pid in lost
    ]

    before = {p: os.path.getmtime(os.path.join(out, "parts", f"part-{p:05d}.parquet"))
              for p in range(P) if p not in lost}
    manifest2 = ck.run_checkpointed(buckets, out, num_partitions=P)
    assert manifest2.num_rows == P
    resumed = {r["doc_id"]: _span_key(r["spans"]) for r in ck.read_corrected(out).take_all()}
    assert resumed == full
    for p, mtime in before.items():
        assert os.path.getmtime(os.path.join(out, "parts", f"part-{p:05d}.parquet")) == mtime

    # fully-done resume short-circuits without reading anything
    manifest3 = ck.run_checkpointed(buckets, out, num_partitions=P)
    assert manifest3.num_rows == P


def test_stage_checkpoint_resume_and_empty_buckets(ray_session, tmp_path):
    """run_stage_checkpointed over the media featurizer: full run equals
    the plain pipeline, a resume re-reads ONLY the lost partitions'
    bucket files (mtimes prove it), and a bucket with docs but no media
    spans is recorded done with 0 rows instead of re-pending forever."""
    import ray.data

    from ocr_corrector_ray.stages.media import media_features
    from ocr_corrector_ray.state import checkpoint as ck

    corpus = datagen.corpus_path(200)
    buckets = str(tmp_path / "buckets")
    out = str(tmp_path / "out")
    P = 8

    ck.bucketize_input(corpus, buckets, P)
    manifest = ck.run_stage_checkpointed(buckets, out, media_features, num_partitions=P)
    assert manifest.num_rows == P
    got = {(r["doc_id"], r["offset"]): tuple(r["feature"])
           for r in ck.read_stage_output(out).take_all()}
    want = {(r["doc_id"], r["offset"]): tuple(r["feature"])
            for r in media_features(ray.data.read_parquet(corpus)).take_all()}
    assert got == want

    # every manifest row's emitted-rows metric sums to the output size
    total = sum(r["spans_corrected"] for r in manifest.to_pylist())
    assert total == len(want)

    # lose one partition; only its bucket re-enters the read plan
    lost = 3
    os.remove(os.path.join(out, "parts", f"part-{lost:05d}.parquet"))
    os.remove(os.path.join(out, "manifest", f"part-{lost:05d}.json"))
    layout = ck.read_layout(buckets)
    pending = ck.pending_input_files(buckets, out, layout)
    assert [os.path.basename(p) for p in pending] == [f"bucket-{lost:05d}.parquet"]
    before = {p: os.path.getmtime(os.path.join(out, "parts", f"part-{p:05d}.parquet"))
              for p in range(P) if p != lost}
    manifest2 = ck.run_stage_checkpointed(buckets, out, media_features, num_partitions=P)
    assert manifest2.num_rows == P
    resumed = {(r["doc_id"], r["offset"]): tuple(r["feature"])
               for r in ck.read_stage_output(out).take_all()}
    assert resumed == want
    for p, mtime in before.items():
        assert os.path.getmtime(os.path.join(out, "parts", f"part-{p:05d}.parquet")) == mtime

    # num_partitions guard applies to stage runs too
    with pytest.raises(ValueError):
        ck.run_stage_checkpointed(buckets, out, media_features, num_partitions=4)

    # a stage yielding NO rows for any pending bucket (media over docs
    # with zero media spans) still marks every partition done
    import pyarrow as pa

    def no_rows_stage(ds):
        def empty(batch: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pa.array([], pa.string()),
                "offset": pa.array([], pa.int32()),
            })

        return ds.map_batches(empty, batch_format="pyarrow")

    out2 = str(tmp_path / "out2")
    manifest3 = ck.run_stage_checkpointed(buckets, out2, no_rows_stage, num_partitions=P)
    assert manifest3.num_rows == P
    assert all(r["spans_corrected"] == 0 for r in manifest3.to_pylist())
    # fully-done resume short-circuits
    assert ck.run_stage_checkpointed(buckets, out2, no_rows_stage, num_partitions=P).num_rows == P


def test_resume_with_different_num_partitions_fails_loudly(ray_session, tmp_path):
    from ocr_corrector_ray.state import checkpoint as ck

    out = str(tmp_path / "out2")
    os.makedirs(os.path.join(out, "manifest"), exist_ok=True)
    with open(os.path.join(out, "manifest", "part-00001.json"), "w") as f:
        json.dump({"partition_id": 1, "num_partitions": 8, "input_fingerprint": "x",
                   "rows_in": 1, "spans_corrected": 1, "wall_s": 0.0,
                   "status": "done"}, f)

    import ray.data

    ds = ray.data.range(10)
    with pytest.raises(ValueError, match="num_partitions=8"):
        ck.filter_pending(ds, out, 16)
    # the matching value passes
    ck.check_num_partitions(out, 8)


def test_bucketed_layout_partition_mismatch_fails(ray_session, tmp_path):
    from ocr_corrector_ray.state import checkpoint as ck

    corpus = datagen.corpus_path(100)
    buckets = str(tmp_path / "b2")
    ck.bucketize_input(corpus, buckets, 4)
    with pytest.raises(ValueError, match="num_partitions=4"):
        ck.run_checkpointed(buckets, str(tmp_path / "o2"), num_partitions=8)


def test_storage_driver_seam(tmp_path):
    """Parquet driver fulfils the fragment contract; get_driver resolves
    it in this sandbox (lance not installed)."""
    import pyarrow as pa

    from ocr_corrector_ray.state import storage

    drv = storage.get_driver()
    assert drv.name == "parquet"  # lance absent in this container
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    path = str(tmp_path / f"frag.{drv.extension}")
    drv.write_fragment(t, path)
    assert drv.read_fragment(path).equals(t)
    # no temp files left behind (atomic rename)
    assert os.listdir(tmp_path) == [os.path.basename(path)]
