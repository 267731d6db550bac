"""Regression pins for review findings: poison spans must never kill a
batch, and the two physical plans must agree on every legal input."""

import pyarrow as pa
import pytest

from ocr_corrector_ray import datagen
from ocr_corrector_ray.correct import CorrectorConfig, build_resources, correct_lm_texts
from ocr_corrector_ray.datagen import DOC_SCHEMA, SPAN_TYPE


def _scorer_res():
    kws, inv, _ = datagen.static_tables()
    return build_resources(
        datagen.build_char_meta(), kws, datagen.confusion_rev(), inv, lm_backend="scorer"
    )


def test_scorer_whitespace_span_contained():
    """A span whose chars the tokenizer drops (whitespace) violates the
    scorer's char-position contract; it must pass through unchanged —
    and must not poison its batch neighbours."""
    res = _scorer_res()
    cfg = CorrectorConfig(lm_backend="scorer")
    texts = ["我爱北京天安门", "我爱北京   天安门"]
    errs = [[4], [9]]
    out = correct_lm_texts(texts, errs, res, cfg)
    assert out[1] == texts[1]          # unscorable -> untouched
    assert len(out[0]) == len(texts[0])  # neighbour still processed


def test_scorer_out_of_range_position_contained():
    res = _scorer_res()
    cfg = CorrectorConfig(lm_backend="scorer")
    out = correct_lm_texts(["我爱北京"], [[99]], res, cfg)
    assert out == ["我爱北京"]


def test_lm_model_exception_contained(resources, cfg):
    """A model-level failure falls back to per-sentence scoring with
    individual containment instead of killing the batch."""

    class Bomb:
        topn = 3
        calls = 0

        def find_topn_candidates(self, sents, errs):
            Bomb.calls += 1
            if len(sents) > 1:
                raise RuntimeError("batch boom")
            if sents[0].startswith("坏"):
                raise RuntimeError("poison sentence")
            return [[[("天", 0.9)] * 3 for _ in e] for e in errs]

    import copy

    res = copy.copy(resources)
    res.lm = Bomb()
    texts = ["我爱北京大安门", "坏坏坏坏坏"]
    out = correct_lm_texts(texts, [[4], [0]], res, cfg)
    assert out[1] == "坏坏坏坏坏"       # poison contained
    assert len(out[0]) == len(texts[0])  # healthy sentence still scored


def test_null_doc_level_probs_plans_agree(ray_session, cfg):
    """A document with probs=NULL at the doc level (legal schema) must not
    crash the explode plan and must match the fused plan."""
    import ray.data

    from ocr_corrector_ray.pipelines.correct import corrected_dataset

    spans = [
        {"kind": "text", "text": "本着平等白愿诚信互利的原则", "media_ref": "", "offset": 0},
        {"kind": "image", "text": "", "media_ref": "img://x/1", "offset": 1},
    ]
    table = pa.table(
        {
            "doc_id": ["doc-null-probs", "doc-normal"],
            "biz": ["doc", "doc"],
            "spans": pa.array([spans, spans], type=pa.list_(SPAN_TYPE)),
            "probs": pa.array(
                [None, [[0.99] * 13, None]], type=pa.list_(pa.list_(pa.float32()))
            ),
        },
        schema=DOC_SCHEMA,
    )
    a = corrected_dataset(ray.data.from_arrow(table), cfg, mode="explode", num_partitions=2).take_all()
    b = corrected_dataset(ray.data.from_arrow(table), cfg, mode="fused").take_all()
    key = lambda rows: {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in rows
    }
    da, db = key(a), key(b)
    assert da == db
    assert len(da) == 2


def test_float32_boundary_prob_not_flagged(cfg):
    """A stored float32 prob of exactly 0.9 must stay clean (strict-<
    against the same-quantised threshold)."""
    import numpy as np

    from ocr_corrector_ray.correct import detect_span

    p = [float(np.float32(0.9))] * 7
    assert detect_span("我爱北京天安门", p, "doc", cfg) is None


def test_config_reference_key_aliases(tmp_path):
    import json

    from ocr_corrector_ray import config as cfgmod

    custom = tmp_path / "c.json"
    custom.write_text(json.dumps({"correct_config": [{
        "biz_type": "doc", "corrector_type": "bert",
        "batch_size": 64, "similarity_threshold": 0.7,
        "key_words_file": "/tmp/words.txt",
    }]}))
    cfg = cfgmod.initial(str(custom))["doc"]
    assert cfg.lm_batch_size == 64
    assert cfg.kw_similarity_threshold == 0.7
    assert cfg.keywords_file == "/tmp/words.txt"


def test_custom_keywords_file_honored(tmp_path):
    from ocr_corrector_ray.correct import CorrectorConfig
    from ocr_corrector_ray.stages.correct_stage import SpanCorrector

    kwf = tmp_path / "kw.txt"
    kwf.write_text("自定义关键词\n另一个词\n", encoding="utf-8")
    sc = SpanCorrector(CorrectorConfig(keywords_file=str(kwf)))
    assert sc.res.keywords == {"自定义关键词", "另一个词"}


def test_decontaminate_handles_empty_text_docs(ray_session, tmp_path):
    """explode() emits a spurious NaN row for an empty token list; the
    gram scan must stay position-aligned when a batch mixes empty and
    non-empty docs (regression: IndexError / wrong doc attribution)."""
    import pyarrow.parquet as pq

    from ocr_corrector_ray.pipelines.textstats import decontaminate_docs

    t = pa.table({
        # doc 0 is the benchmark doc (0 % 97 == 0); doc 5 repeats its
        # 3-gram; docs 1/2 are empty/whitespace traps between them
        "doc_id": pa.array([0, 1, 2, 5], pa.int64()),
        "text": pa.array(["alpha beta gamma delta", "", "   ",
                          "alpha beta gamma"], pa.string()),
        "lang": pa.array(["en"] * 4), "source": pa.array(["s"] * 4),
        "n_chars": pa.array([22, 0, 3, 16], pa.int64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = decontaminate_docs(str(d)).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [5]
    assert got["n_hits"].tolist() == [1]


def _write_events(tmp_path, rows):
    import pandas as pd
    import pyarrow.parquet as pq

    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"])
    t = pa.Table.from_pandas(df[["event_id", "ts", "user_id", "event_type", "value"]],
                             preserve_index=False)
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, d / "events.parquet")
    return str(d)


def test_keep_latest_null_ts_never_wins(ray_session, tmp_path):
    """ADVICE r4: pandas sorts NaT last, so keep='last' used to crown a
    null-ts row over the real latest event; SQL's ORDER BY ts DESC puts
    NULLS LAST and picks the max non-null ts."""
    from ocr_corrector_ray.pipelines.analytics import keep_latest_events

    sf = _write_events(tmp_path, {
        "event_id": [1, 2, 3],
        "ts": ["2026-01-01 10:00:00", "2026-01-01 11:00:00", None],
        "user_id": [7, 7, 7],
        "event_type": ["click", "click", "click"],
        "value": [1.0, 2.0, 3.0],
    })
    got = keep_latest_events(sf).to_pandas()
    assert got["event_id"].tolist() == [2]


def test_event_type_pivot_discovery_matches_pinned(ray_session, tmp_path):
    """One-corpus-scan discovery (types=None) must agree with the pinned
    path; a pinned list missing a type present in the data must raise
    instead of silently dropping rows (ADVICE r4 oracle-desync guard)."""
    from ocr_corrector_ray.pipelines.analytics import event_type_pivot

    sf = _write_events(tmp_path, {
        "event_id": [1, 2, 3, 4],
        "ts": ["2026-01-01"] * 4,
        "user_id": [1, 1, 2, 2],
        "event_type": ["click", "view", "view", "click"],
        "value": [1.5, 2.5, 3.5, 4.5],
    })
    disc = event_type_pivot(sf).to_pandas().sort_values("user_id", ignore_index=True)
    pin = event_type_pivot(sf, types=["click", "view"]).to_pandas().sort_values(
        "user_id", ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(disc, pin)
    assert list(disc.columns) == ["user_id", "sum_click", "sum_view"]
    assert disc["sum_click"].tolist() == [1.5, 4.5]
    with pytest.raises(Exception, match="not in the pinned list"):
        event_type_pivot(sf, types=["click"]).to_pandas()


def test_parquet_num_rows_nested_layout(tmp_path):
    """ADVICE r4: ray.data.read_parquet discovers files recursively;
    the footer-based row count must count the same fragments."""
    import pyarrow.parquet as pq

    from ocr_corrector_ray.pipelines.textstats import _parquet_num_rows

    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    (tmp_path / "nested").mkdir()
    pq.write_table(t, tmp_path / "top.parquet")
    pq.write_table(t, tmp_path / "nested" / "inner.parquet")
    assert _parquet_num_rows(str(tmp_path)) == 6


def test_cli_output_clear_guard(tmp_path):
    """ADVICE r4 (medium): the overwrite path must refuse to unlink when
    the input lies under the output or a checkpoint manifest exists."""
    from ocr_corrector_ray.cli import output_clear_guard

    out = tmp_path / "out"
    (out / "sub").mkdir(parents=True)
    # input under output -> refuse
    assert output_clear_guard(str(out), str(out / "sub")) is not None
    assert output_clear_guard(str(out), str(out)) is not None
    # sibling input -> allowed
    inp = tmp_path / "inp"
    inp.mkdir()
    assert output_clear_guard(str(out), str(inp)) is None
    # checkpoint manifest present -> refuse
    (out / "manifest").mkdir()
    assert output_clear_guard(str(out), str(inp)) is not None
