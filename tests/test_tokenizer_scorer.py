"""Tokenizer family (SURVEY §2.2 M18-M21, §2.1 S8) and the masked-LM
scorer harness (§2.3 ST1, §2.2 M22/M23, §2.5 A1-A3)."""

import numpy as np
import pytest

from ocr_corrector_ray import datagen
from ocr_corrector_ray.functions.tokenization import (
    BasicTokenizer,
    FullTokenizer,
    WordpieceTokenizer,
    build_synthetic_vocab,
    clean_text,
    split_on_punc,
    strip_accents,
    tokenize_chinese_chars,
)
from ocr_corrector_ray.model.scorer import (
    BatchData,
    MaskedLMScorer,
    create_masks,
    frame_sentence,
)


@pytest.fixture(scope="module")
def tokenizer():
    _, inv, _ = datagen.static_tables()
    return FullTokenizer(build_synthetic_vocab(inv))


def test_clean_and_cjk_spacing():
    assert clean_text("a\x00b�c\td") == "abc d"  # \x00,� dropped; \t -> space
    assert clean_text("天\x07安") == "天安"
    assert tokenize_chinese_chars("ab天安cd") == "ab 天  安 cd"


def test_strip_accents_and_punc_split():
    assert strip_accents("café") == "cafe"
    assert split_on_punc("ab,cd!") == ["ab", ",", "cd", "!"]
    assert split_on_punc("天安门") == ["天安门"]


def test_basic_tokenizer_cjk_chars_become_tokens():
    bt = BasicTokenizer()
    assert bt.tokenize("我爱North京") == ["我", "爱", "north", "京"]


def test_wordpiece_greedy_and_unk(tokenizer):
    wp = WordpieceTokenizer({"un": 0, "##aff": 1, "##able": 2, "x": 3})
    assert wp.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert wp.tokenize("qzqz") == ["[UNK]"]


def test_full_tokenizer_roundtrip_and_oov(tokenizer):
    toks = tokenizer.tokenize("我爱北京")
    ids = tokenizer.convert_tokens_to_ids(toks)
    assert tokenizer.convert_ids_to_tokens(ids) == toks
    with pytest.raises(KeyError):  # OOV token->id raises, like the reference
        tokenizer.convert_tokens_to_ids(["ⅷ"])


def test_framing_and_masks():
    framed, errs = frame_sentence(list("天安门"), [1], 64)
    assert framed == ["[CLS]", "。", "天", "安", "门", "。", "[SEP]"]
    assert errs == [3]
    # <=3 errors -> [MASK]
    inp, pos, lab = create_masks(framed, errs)
    assert inp[3] == "[MASK]" and lab == ["安"] and pos == [3]
    # >3 errors -> originals kept
    inp2, _, _ = create_masks(framed, [2, 3, 4, 5])
    assert inp2 == framed


def test_batchdata_padding(tokenizer):
    b = BatchData(["我爱北京天安门", "天安门"], [[1, 2], [0]], tokenizer, 64)
    assert b.input_ids.shape == (2, 64)
    assert b.batch_error_num == 2
    assert b.error_num_of_sents == [2, 1]
    # second sentence's mask slots padded with zeros + weight 0
    assert b.masked_lm_weights[1].tolist() == [1.0, 0.0]


def test_batchdata_long_sentence_extends_seq(tokenizer):
    long = "天" * 70
    b = BatchData([long], [[0]], tokenizer, 64)
    assert b.input_ids.shape[1] == 74  # 70 tokens + 4 framing, no truncation


def test_scorer_contract_and_batch_independence(tokenizer):
    scorer = MaskedLMScorer(tokenizer, topn=3, batch_size=2)
    sents = ["我爱北京天安门", "本着平等自愿诚信", "天安门广场"]
    errs = [[4], [2, 3], [1]]
    out = scorer.find_topn_candidates(sents, errs)
    assert len(out) == 3
    assert len(out[1]) == 2 and len(out[1][0]) == 3
    for cands in out[0]:
        confs = [c for _, c in cands]
        assert confs == sorted(confs, reverse=True)
        assert all(0 <= c <= 1 for c in confs)
    # batch composition must not change outputs (pad-to-batch-max is
    # output-neutral, the reference's A1 property)
    solo = scorer.find_topn_candidates([sents[2]], [errs[2]])
    assert solo[0] == out[2]


def test_scorer_backend_pipeline_matches_oracle(ray_session):
    """End-to-end conformance with the scorer LM backend swapped in."""
    import pyarrow.parquet as pq

    from ocr_corrector_ray import oracle
    from ocr_corrector_ray.correct import CorrectorConfig, build_resources
    from ocr_corrector_ray.pipelines.correct import corrected_dataset

    cfg = CorrectorConfig(lm_backend="scorer")
    kws, inv, _ = datagen.static_tables()
    res = build_resources(
        datagen.build_char_meta(), kws, datagen.confusion_rev(), inv,
        lm_backend="scorer",
    )
    corpus = datagen.corpus_path(120)
    docs = [t for part in [pq.read_table(f"{corpus}")] for t in part.to_pylist()]
    expected = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in oracle.correct_table(docs, res, cfg)
    }
    out = corrected_dataset(corpus, cfg).take_all()
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in out
    }
    assert got == expected


def test_likelihood_detector_contract():
    from ocr_corrector_ray.model.detector import LikelihoodDetector

    det = LikelihoodDetector()
    text = "本着平等自愿诚信互利的原则"
    lik = det.char_likelihoods(text)
    assert len(lik) == len(text)
    assert (lik > 0).all() and (lik < 1).all()
    pos = det.suspicious_positions(text)
    assert 0 <= len(pos) <= 3  # may be EMPTY: flat-likelihood spans pass through
    assert pos == sorted(pos)
    assert pos == det.suspicious_positions(text)  # deterministic
    # a span whose chars are all equally (un)likely yields no flags
    assert det.suspicious_positions("天天天天天天") == []


def test_lm_detector_pipeline_matches_oracle(ray_session):
    """Conformance with the LM likelihood detector for non-prob spans."""
    import pyarrow.parquet as pq

    from ocr_corrector_ray import datagen, oracle
    from ocr_corrector_ray.correct import CorrectorConfig, build_resources
    from ocr_corrector_ray.pipelines.correct import corrected_dataset

    cfg = CorrectorConfig(nonprob_detector="lm")
    kws, inv, _ = datagen.static_tables()
    res = build_resources(datagen.build_char_meta(), kws, datagen.confusion_rev(), inv)
    corpus = datagen.corpus_path(150)
    import pyarrow.dataset as pads

    docs = pads.dataset(corpus).to_table().to_pylist()
    expected = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in oracle.correct_table(docs, res, cfg)
    }
    out = corrected_dataset(corpus, cfg).take_all()
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in out
    }
    assert got == expected
