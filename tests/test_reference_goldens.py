"""Reference conformance-example goldens run through THIS engine.

The reference's README examples (README.md:17-38) and doctest fixtures
define the observable behavior; with the synthetic char-meta/LM the same
inputs must produce the same corrections end-to-end through the Ray
pipeline (the fixture formats ride in via sources.ocr_json)."""

import json

import pytest

from ocr_corrector_ray.pipelines.correct import corrected_dataset
from ocr_corrector_ray.sources.ocr_json import read_ocr_json


def _correct_texts(texts, probs, biz, ray_session, tmp_path):
    fixture = tmp_path / "fixture_ocr_result.json"
    fixture.write_text(
        json.dumps({"texts": texts, "probs": probs}, ensure_ascii=False),
        encoding="utf-8",
    )
    ds = read_ocr_json([str(fixture)], biz=biz)
    out = corrected_dataset(ds).take_all()
    return [s["text"] for s in out[0]["spans"]]


def test_readme_tiananmen_example(ray_session, tmp_path):
    """README.md:17-27: 我爱北京大安门 with a low-confidence 大 -> 天."""
    texts = ["我爱北京大安门"]
    probs = [[0.99, 0.99, 0.99, 0.99, 0.42, 0.99, 0.99]]
    out = _correct_texts(texts, probs, "doc", ray_session, tmp_path)
    assert out == ["我爱北京天安门"]


def test_readme_ziyuan_example(ray_session, tmp_path):
    """README.md:30-37 / bert_corrector.py:28-34: 白愿 -> 自愿."""
    texts = ["本着平等白愿诚信互利的原则"]
    probs = [[0.99] * 4 + [0.43] + [0.99] * 8]
    out = _correct_texts(texts, probs, "doc", ray_session, tmp_path)
    assert out == ["本着平等自愿诚信互利的原则"]


def test_keyword_fixture_cases(ray_session, tmp_path):
    """keyword_corrector.py:44-47 + data/2_ocr_result.json: report-field
    corrections (宋还本全 -> 未还本金, 术还本金 -> 未还本金) with
    clean fields passing through untouched."""
    texts = ["宋还本全", "术还本金", "账户状态", "还激频率"]
    probs = [
        [0.40, 0.99, 0.99, 0.50],
        [0.45, 0.99, 0.99, 0.99],
        [0.99, 0.99, 0.99, 0.99],
        [0.99, 0.55, 0.99, 0.99],
    ]
    out = _correct_texts(texts, probs, "report", ray_session, tmp_path)
    assert out[0] == "未还本金"
    assert out[1] == "未还本金"
    assert out[2] == "账户状态"   # no suspicious char -> untouched
    assert out[3] == "还款频率"   # 激 -> 款 via BK-tree + shape similarity


def test_digit_position_never_corrected(ray_session, tmp_path):
    """bert_corrector.py:51-54: a suspicious char that is a digit is left
    alone (the reference never corrects digits)."""
    texts = ["逾期31一60天需还款项"]
    probs = [[0.99, 0.99, 0.40, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99]]
    out = _correct_texts(texts, probs, "doc", ray_session, tmp_path)
    assert out == texts  # position 2 is '1' -> skipped


def test_probs_none_doc(ray_session, tmp_path):
    """base_corrector.py:36-39: no recogniser confidences -> every
    position suspect; output length preserved, media/ASCII untouched."""
    texts = ["本着平等白愿诚信互利的原则", "ref AB12"]
    fixture = tmp_path / "nonprob_ocr_result.json"
    fixture.write_text(json.dumps({"texts": texts}, ensure_ascii=False), encoding="utf-8")
    ds = read_ocr_json([str(fixture)], biz="doc")
    out = corrected_dataset(ds).take_all()
    spans = [s["text"] for s in out[0]["spans"]]
    assert len(spans[0]) == len(texts[0])
    assert spans[1] == "ref AB12"
