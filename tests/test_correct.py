"""Correction-path semantics: keyword path, LM path, extraction,
containment, span-level dispatch."""

import pytest

from ocr_corrector_ray import datagen
from ocr_corrector_ray.correct import (
    correct_keyword_text,
    correct_lm_texts,
    correct_one_span,
    detect_span,
)
from ocr_corrector_ray.functions.extract import extract_html, extract_pdf


# --- keyword path (keyword_corrector.py doctest analogues) ------------------
def test_keyword_correct_doctest(resources, cfg):
    assert correct_keyword_text("宋还本全", [0, 3], resources, cfg) == "未还本金"


def test_keyword_exact_hit_skips(resources, cfg):
    assert correct_keyword_text("未还本金", [0], resources, cfg) == "未还本金"


def test_keyword_no_candidate_passthrough(resources, cfg):
    assert correct_keyword_text("天天天天天天天天", [0], resources, cfg) == "天天天天天天天天"


def test_keyword_distance_cap_len_minus_one(resources, cfg):
    # all positions suspect: distance len-1 finds same-length keywords
    out = correct_keyword_text("宋还本全", [0, 1, 2, 3], resources, cfg)
    assert len(out) == 4  # substitution is positional, length preserved


def test_keyword_containment_on_bad_positions(resources, cfg):
    # error position beyond text length -> IndexError inside -> original back
    assert correct_keyword_text("宋还本全", [99], resources, cfg) == "宋还本全"


# --- LM path ----------------------------------------------------------------
def test_lm_correct_confusion_fix(resources, cfg):
    out = correct_lm_texts(["本着平等白愿诚信互利的原则"], [[4]], resources, cfg)
    assert out == ["本着平等自愿诚信互利的原则"]


def test_lm_digit_positions_never_corrected(resources, cfg):
    text = "第1条款应当遵守"
    out = correct_lm_texts([text], [[1]], resources, cfg)
    assert out == [text]


def test_lm_containment_bad_positions(resources, cfg):
    text = "本着平等原则"
    assert correct_lm_texts([text], [[99]], resources, cfg) == [text]


def test_lm_partial_corrections_lost_on_late_error(resources, cfg):
    """Reference containment granularity: one try/except wraps the whole
    sentence loop, so an exception at a later error position discards the
    earlier accepted corrections of that sentence
    (bert_corrector.py:50-78)."""
    text = "本着平等白愿诚信互利的原则"
    ok = correct_lm_texts([text], [[4]], resources, cfg)[0]
    assert ok != text
    bad = correct_lm_texts([text], [[4, 99]], resources, cfg)[0]
    assert bad == text


# --- detection dispatch -----------------------------------------------------
def test_detect_span_branches(cfg):
    assert detect_span("我爱北京天安门", [0.99] * 7, "doc", cfg) is None
    assert detect_span("我爱北京天安门", [0.99, 0.5] + [0.99] * 5, "doc", cfg) == [1]
    assert detect_span("我爱北京天安门", None, "doc", cfg) == list(range(7))
    assert detect_span("ascii text", [0.1] * 10, "doc", cfg) is None
    assert detect_span("金", [0.1], "report", cfg) is None
    assert detect_span("本金", [0.1, 0.99], "report", cfg) == [0]


def test_media_span_untouched(resources, cfg):
    assert correct_one_span("image", "", None, "doc", resources, cfg) == ""


# --- extraction -------------------------------------------------------------
def test_html_extraction_recovers_payload():
    import random

    payload = "无效重大瑕疵或不符合乙方其他规定的债权资产"
    html = datagen._wrap_html(payload, random.Random(7))
    assert extract_html(html) == payload


def test_html_drops_boilerplate():
    html = (
        "<html><body><nav><a href='/'>home</a></nav>"
        "<p>我爱北京天安门</p>"
        "<footer>copyright 2020 example corp. all rights reserved.</footer>"
        "</body></html>"
    )
    assert extract_html(html) == "我爱北京天安门"


def test_html_link_density_rule():
    # a long ASCII line that is mostly links -> dropped; text-dense kept
    linky = "<p><a href='/a'>" + "x" * 30 + "</a> hi</p>"
    dense = "<p>" + "y" * 30 + "</p>"
    assert extract_html(linky) == ""
    assert extract_html(dense) == "y" * 30


def test_pdf_extraction():
    assert extract_pdf("未还-\n本金") == "未还本金"
    assert extract_pdf("未还\n本金\f") == "未还本金"
    assert extract_pdf("a  b   c") == "a b c"


def test_pdf_wrap_roundtrip():
    import random

    payload = "借款人应当按照约定的期限返还借款并支付利息"
    wrapped = datagen._wrap_pdf(payload, random.Random(3))
    assert extract_pdf(wrapped) == payload


# --- excluded-char rule -----------------------------------------------------
def test_unknown_char_span_survives(resources, cfg):
    text = "本着平等" + datagen.EXCLUDED_CHAR + "愿诚信"
    probs = [0.99] * 4 + [0.5] + [0.99] * 3
    out = correct_one_span("text", text, probs, "doc", resources, cfg)
    assert len(out) == len(text)


# --- LM fast-path prune is output-neutral -----------------------------------
def test_lm_noop_prune_matches_full_path(resources):
    """correct_lm_texts' provably-no-op span prune (synthetic LM +
    filler-rejecting curve) must be bit-identical to the unpruned path on
    spans mixing clean chars, confusion chars, digits, out-of-range and
    negative error positions, for every built-in curve."""
    import random

    from ocr_corrector_ray.correct import CorrectorConfig, _correct_lm_texts_full
    from ocr_corrector_ray.correct import correct_lm_texts as pruned
    from ocr_corrector_ray.functions import textproc

    conf_keys = sorted(resources.lm.confusion_rev)
    _, inv, _ = datagen.static_tables()
    rng = random.Random(5)
    pool = list(inv) + conf_keys * 3 + list("0123456789．，")
    texts, errs = [], []
    for _ in range(300):
        n = rng.randint(1, 20)
        t = "".join(rng.choice(pool) for _ in range(n))
        k = min(rng.randint(0, n + 2), n + 4)
        texts.append(t)
        errs.append(sorted(rng.sample(range(-2, n + 3), k=k)))
    for curve in ("02", "full", "null"):
        cfg2 = CorrectorConfig(curve=curve)
        a = pruned(texts, errs, resources, cfg2)
        b = _correct_lm_texts_full(texts, errs, resources, cfg2, textproc.CURVES[curve])
        assert a == b
    # and the prune actually fires: a clean-only span list changes nothing
    clean = [c for c in inv if c not in resources.lm.confusion_rev][:5]
    t = "".join(clean)
    assert pruned([t], [list(range(len(t)))], resources, CorrectorConfig()) == [t]


def test_html_text_density_rule():
    """VERDICT r4 #7 (chars-per-tag DOM-density): a long ASCII line
    chopped up by many inline tags is markup-dense boilerplate and is
    dropped even when its link density passes; the same text with few
    tags is kept."""
    import random

    # 30 visible chars across 10 inline <span> pairs -> density 30/22 < 6
    dense_markup = "<p>" + "<span>abc</span>" * 10 + "</p>"
    assert extract_html(dense_markup) == ""
    # same visible length, one span pair -> density 30/4 >= 6 -> kept
    plain = "<p><span>" + "abc" * 10 + "</span></p>"
    assert extract_html(plain) == "abc" * 10
    # CJK rule still wins regardless of markup density
    cjk = "<p>" + "<span>我爱</span>" * 6 + "</p>"
    assert extract_html(cjk) == "我爱" * 6
    # corpus wrap still roundtrips byte-identically
    payload = "无效重大瑕疵或不符合乙方其他规定的债权资产"
    assert extract_html(datagen._wrap_html(payload, random.Random(3))) == payload
