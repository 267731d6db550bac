"""TFRecord sink (reference S10, create_tf_record.py:104-180): pure-Python
container format verified against the public specs — CRC-32C test vector,
Example proto round-trip, framing round-trip, and the full distributed
sink over real training instances."""

import glob

import pandas as pd
import pytest

from ocr_corrector_ray.functions.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    read_tfrecords,
    write_tfrecord_file,
)


def test_crc32c_known_vectors():
    assert crc32c(b"123456789") == 0xE3069283  # the canonical check value
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 B.4 vector


def test_example_roundtrip():
    feats = {
        "input_ids": [2, 17, 42, 3, 0, 0],
        "masked_lm_weights": [1.0, 0.5, 0.0],
        "name": b"doc-1",
        "big": [2**40, 0, 7],
    }
    back = decode_example(encode_example(feats))
    assert back["input_ids"] == feats["input_ids"]
    assert back["big"] == feats["big"]
    assert back["name"] == [b"doc-1"]
    assert back["masked_lm_weights"] == pytest.approx(feats["masked_lm_weights"])


def test_framing_roundtrip_and_crc_guard(tmp_path):
    payloads = [encode_example({"x": [i]}) for i in range(5)]
    path = str(tmp_path / "t.tfrecord")
    assert write_tfrecord_file(path, payloads) == 5
    assert read_tfrecords(path) == payloads
    # corrupt one payload byte -> CRC check must trip
    blob = bytearray(open(path, "rb").read())
    blob[-6] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="CRC"):
        read_tfrecords(path)


def test_tfrecord_sink_over_instances(ray_session, tmp_path):
    import ray.data

    from ocr_corrector_ray.pipelines.training import training_instances, write_tfrecord_corpus

    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": ["d1", "d2"], "offset": pd.Series([0, 0], dtype="int32"),
        "wrong": ["白天白日", "宋还本全"], "correct": ["自天白日", "未还本金"],
    }))
    inst = training_instances(pairs, {"自": 0.9}, dupe_factor=2)
    n_inst = inst.count()
    manifest = write_tfrecord_corpus(inst, str(tmp_path / "tfr")).to_pandas()
    assert manifest["n_examples"].sum() == n_inst

    total = 0
    for path in glob.glob(str(tmp_path / "tfr" / "*.tfrecord")):
        for payload in read_tfrecords(path):  # CRC-verified
            ex = decode_example(payload)
            assert set(ex) == {"input_ids", "input_mask", "segment_ids",
                               "masked_lm_positions", "masked_lm_ids",
                               "masked_lm_weights"}
            assert len(ex["input_ids"]) == 64
            assert len(ex["masked_lm_positions"]) == 20
            assert ex["input_ids"][0] == 2  # [CLS]
            # mask weights: 1.0 for real predictions then 0.0 padding
            w = ex["masked_lm_weights"]
            n_real = sum(1 for x in w if x == 1.0)
            assert n_real >= 1 and all(x == 0.0 for x in w[n_real:])
            total += 1
    assert total == n_inst
