"""Unit vectors ported from the reference's doctests (FIXTURES.md §7) plus
pins for the synthetic-meta construction rules."""

import math

import pytest

from ocr_corrector_ray import datagen
from ocr_corrector_ray.functions import textproc
from ocr_corrector_ray.functions.bktree import BKTree, levenshtein
from ocr_corrector_ray.functions.charsim import (
    CharMeta,
    edit_distance,
    safe_encode_string,
    string_to_tree,
)
from ocr_corrector_ray.functions.lm import SyntheticLM
from ocr_corrector_ray.functions.regexes import (
    count_chinese,
    has_alphabet,
    is_number_char,
    starts_traditional,
)


# --- edit distance (char_sim.py:59-66) ------------------------------------
def test_edit_distance_doctests():
    assert edit_distance("abcde", "avbcude") == 2
    assert edit_distance(["至", "刂"], ["亻", "至", "刂"]) == 1
    assert edit_distance("fang", "qwe") == 4
    assert edit_distance("fang", "hen") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0


def test_edit_distance_canonical_substitution_cost2():
    assert edit_distance("a", "b", name="Canonical") == 2
    assert edit_distance("ab", "ac", name="Canonical") == 2
    assert edit_distance("a", "ab", name="Canonical") == 1


def test_levenshtein_matches_edit_distance():
    for a, b in [("abcde", "avbcude"), ("fang", "qwe"), ("", "xy"), ("宋还本金", "未还本金")]:
        assert levenshtein(a, b) == edit_distance(a, b)


# --- string_to_tree (char_sim.py:353-368) ----------------------------------
def test_string_to_tree_doctests():
    assert string_to_tree("⿱⿱⿰丿㇏⿰丿㇏⿱⿰丿㇏⿰丿㇏") == \
        "{⿱{⿱{⿰{丿}{㇏}}{⿰{丿}{㇏}}}{⿱{⿰{丿}{㇏}}{⿰{丿}{㇏}}}}"
    assert string_to_tree("⿱⿰丿㇏⿱一⿱⿻一丨一") == \
        "{⿱{⿰{丿}{㇏}}{⿱{一}{⿱{⿻{一}{丨}}{一}}}}"
    assert string_to_tree("⿱⿰丿㇏⿻⿱一⿱⿻一丨一丷") == \
        "{⿱{⿰{丿}{㇏}}{⿻{⿱{一}{⿱{⿻{一}{丨}}{一}}}{丷}}}"
    assert string_to_tree("⿻⿻⿻一丨一⿴⿱⿰丨𠃌一一") == \
        "{⿻{⿻{⿻{一}{丨}}{一}}{⿴{⿱{⿰{丨}{𠃌}}{一}}{一}}}"
    assert string_to_tree("⿻⿻⿻一丨⿰丿㇏⿴⿱⿰丨𠃌一一") == \
        "{⿻{⿻{⿻{一}{丨}}{⿰{丿}{㇏}}}{⿴{⿱{⿰{丨}{𠃌}}{一}}{一}}}"
    assert string_to_tree("丿") == "{丿}"
    assert string_to_tree("⿻") == "{⿻}"


def test_safe_encode_is_bijective_on_idcs():
    s = "⿰丿⿻⿱一一丨"
    enc = safe_encode_string(s)
    assert enc == "A丿MB一一丨"  # A=⿰, M=⿻, B=⿱
    assert len(enc) == len(s)


# --- detector / filters (base_corrector.py, bert_corrector.py) -------------
def test_find_err_pos_doctest():
    assert textproc.find_err_pos([0.99, 0.85, 1.00, 0.77]) == [1, 3]
    assert textproc.find_err_pos([]) == []
    assert textproc.find_err_pos([0.9]) == []  # strict <
    assert textproc.find_err_pos([0.8999]) == [0]


def test_filters():
    assert not textproc.base_correct_filter("金")          # <2 CJK
    assert textproc.base_correct_filter("本金")
    assert not textproc.lm_correct_filter("我爱aB北京")     # ASCII
    assert not textproc.lm_correct_filter("我爱Ｂ京城")     # fullwidth letter
    assert not textproc.lm_correct_filter("天安")           # <3 CJK
    assert not textproc.lm_correct_filter("天" * 63)        # > 64-2
    assert textproc.lm_correct_filter("天" * 62)
    assert textproc.lm_correct_filter("我爱北京")


def test_regex_predicates():
    assert has_alphabet("ａ")
    assert not has_alphabet("。，１２")
    assert count_chinese("a天b安c") == 2
    assert is_number_char("7") and not is_number_char("七")
    assert starts_traditional("來")
    assert not starts_traditional("来")


def test_normalize_digits_keeps_positions():
    s = "第1条第20款"
    out = textproc.normalize_digits(s)
    assert out == "第一条第二零款"
    assert len(out) == len(s)


# --- regulation (keyword_corrector.py:130-135) ------------------------------
def test_regulation_doctests():
    assert textproc.regulation("宋还本全", [0, 3]) == ("^(.)还本(.)$", "宋全")
    assert textproc.regulation("数期大", [0, 2]) == ("^(.)期(.)$", "数大")


# --- acceptance (bert_corrector.py:95-149) ----------------------------------
def test_check_lm_candidate():
    assert not textproc.check_lm_candidate("白", "[UNK]")
    assert not textproc.check_lm_candidate("白", "##自")
    assert not textproc.check_lm_candidate("白", "自自")
    assert not textproc.check_lm_candidate("白", "a")
    assert not textproc.check_lm_candidate("白", "來")  # traditional blacklist
    assert textproc.check_lm_candidate("白", "自")


def test_curves():
    assert textproc.curve_null(0, 0) and not textproc.curve_full(1, 1)
    assert textproc.curve_02(0.6, 0.5)
    assert not textproc.curve_02(0.4, 0.5)   # sum < 1
    assert not textproc.curve_02(0.04, 0.99)  # conf < 0.05
    assert not textproc.curve_02(0.99, 0.39)  # sim < 0.4


# --- BK-tree (BKtree.py:50-56, against the real keyword dictionary) ---------
def test_bktree_search_reference_cases():
    kws, _, _ = datagen.static_tables()
    tree = BKTree(kws)
    assert set(tree.search("宋还本金", 1)) == {"未还本金", "已还本金"}
    assert tree.search("未还本金", 0) == ["未还本金"]
    assert tree.search("zzzz", 0) == []


def test_bktree_deterministic_across_instances():
    kws, _, _ = datagen.static_tables()
    t1, t2 = BKTree(kws), BKTree(kws)
    for probe, d in [("宋还本金", 1), ("数期大", 2), ("当前逾期总", 2)]:
        assert t1.search(probe, d) == t2.search(probe, d)


# --- char meta construction rules ------------------------------------------
def test_confusion_pairs_are_similar_nonpairs_are_not(resources):
    cm = resources.char_meta
    assert cm.shape_similarity("宋", "未") == pytest.approx(0.875)
    assert cm.shape_similarity("白", "自") == pytest.approx(0.875)
    # unrelated chars: hash-random 8-stroke strings, similarity well below 0.875
    assert cm.shape_similarity("宋", "官") < 0.8


def test_decompose_skips_unknown_chars(resources):
    cm = resources.char_meta
    known = cm.decompose_text("未")
    assert cm.decompose_text("未" + datagen.EXCLUDED_CHAR) == known
    assert cm.decompose_text(datagen.EXCLUDED_CHAR) == ""


def test_shape_similarity_raises_on_double_unknown(resources):
    with pytest.raises(ZeroDivisionError):
        resources.char_meta.shape_similarity(datagen.EXCLUDED_CHAR, "[UNK]")


def test_pronunciation_similarity_bounds(resources):
    cm = resources.char_meta
    v = cm.pronunciation_similarity("未", "宋")
    assert 0.0 <= v <= 1.0
    assert cm.pronunciation_similarity("未", "未") == pytest.approx(1.0)


# --- synthetic LM ------------------------------------------------------------
def test_synthetic_lm_contract_and_determinism(resources):
    lm = resources.lm
    out1 = lm.find_topn_candidates(["本着平等白愿诚信", "我爱北京大安门"], [[4], [4]])
    out2 = lm.find_topn_candidates(["我爱北京大安门"], [[4]])
    assert len(out1) == 2 and len(out1[0]) == 1 and len(out1[0][0]) == 3
    # per-sentence determinism: batch composition cannot change outputs
    assert out1[1] == out2[0]
    confs = [c for _, c in out1[0][0]]
    assert confs == sorted(confs, reverse=True)
    # the confusion right-partner is the top candidate
    assert out1[0][0][0][0] == "自"
    assert out1[1][0][0][0] == "天"


def test_synthetic_lm_keep_branch_echoes_input(resources):
    lm = resources.lm
    sent = "本着平等白愿诚信互利"
    out = lm.find_topn_candidates([sent], [[0, 1, 2, 3, 4]])  # >3 errors
    for pos, cands in zip([0, 1, 2, 3, 4], out[0]):
        assert cands[0][0] == sent[pos]  # echo of the unmasked char


def test_weighted_similarity(resources):
    cm = resources.char_meta
    assert cm.similarity("宋", "未") == pytest.approx(cm.shape_similarity("宋", "未"))
    assert cm.similarity("宋", "未", weights=(0, 0, 1.0)) == 1.0
    assert cm.similarity("宋", datagen.EXCLUDED_CHAR) == 0.0


# --- shared item hash ---------------------------------------------------------
def test_hash64_equals_duckdb_md5_number_lower():
    """Tripwire: the shared 64-bit item hash IS DuckDB's
    md5_number_lower — the equivalence every SQL oracle built on it
    (simhash, winnowing) depends on."""
    import duckdb

    from ocr_corrector_ray.functions.hashing import hash64

    vals = ["", "abc", "token", "带中文的词", "a b c"]
    rows = duckdb.sql(
        "SELECT md5_number_lower(v) FROM (SELECT unnest(?) AS v)", params=[vals]
    ).fetchall()
    assert [r[0] for r in rows] == [hash64(v) for v in vals]
