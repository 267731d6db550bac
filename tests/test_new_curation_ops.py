"""Semantic tests for the operators added in the second r5 session
(beyond the parametrized DuckDB-oracle equality in test_queries.py):
line-level dedup, PII redaction, retention cohorts, the Q5-shape join
and the conversion funnel."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in ["documents", "events", "customer", "supplier", "nation",
              "region", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_line_dedup_drops_repeated_chunks(ray_session, con):
    from ocr_corrector_ray.pipelines.textstats import line_dedup_docs

    got = line_dedup_docs(SF_DIR).to_pandas()
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    # some docs lose chunks (the corpus repeats 8-token runs), none gain
    assert (got["n_kept"] <= got["n_chunks"]).all()
    assert got["n_kept"].sum() < got["n_chunks"].sum()
    assert len(got) <= n_docs
    # kept_text round-trips: its token count is 8 * full chunks + tail
    ex = got.iloc[0]
    assert ex["kept_text"].count(" ") + 1 <= ex["n_kept"] * 8


def test_line_dedup_duplicate_doc_fully_loses(ray_session, tmp_path):
    """Every chunk of a doc whose text also appears under a LOWER
    doc_id must lose to that earlier copy: first-occurrence-wins is
    global.  The synthetic corpus has no full duplicates, so build one:
    doc 10 repeats doc 1's text, doc 11 embeds doc 2's text plus a
    fresh tail chunk."""
    from ocr_corrector_ray.pipelines.textstats import line_dedup_docs

    w = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    docs = pd.DataFrame({
        "doc_id": [1, 2, 10, 11],
        "text": [
            w + " one two three",
            "iota kappa " + w,
            w + " one two three",                  # exact dup of doc 1
            "iota kappa " + w + " " + w,           # doc 2 + repeat chunk
        ],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = (
        line_dedup_docs(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert 10 not in got.index          # every chunk lost -> doc dropped
    assert list(got.index) == [1, 2, 11]
    assert got.loc[1, "n_kept"] == got.loc[1, "n_chunks"] == 2
    # doc 11 chunks: [iota kappa alpha..zeta] (== doc 2 chunk 0, loses),
    # [eta theta alpha..zeta] (fresh window alignment, survives),
    # [eta theta] (== doc 2 chunk 1, loses) -> exactly 1 of 3 kept
    assert got.loc[11, "n_chunks"] == 3
    assert got.loc[11, "n_kept"] == 1
    assert got.loc[11, "kept_text"].startswith("eta theta alpha")


def test_redact_pii_leaves_no_pii(ray_session):
    import re

    from ocr_corrector_ray.pipelines.textstats import (
        _PII_EMAIL, _PII_IP, _PII_PHONE, redact_pii_docs)

    got = redact_pii_docs(SF_DIR).to_pandas()
    assert (got["n_emails"] >= 1).all()   # injection guarantees a hit
    assert (got["n_phones"] >= 1).all()
    joined = "\n".join(got["clean_text"])
    for pat in (_PII_EMAIL, _PII_PHONE, _PII_IP):
        assert re.search(pat, joined) is None
    assert "<EMAIL>" in joined and "<PHONE>" in joined


def test_retention_day_zero_equals_cohort_size(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import user_retention_cohorts

    got = user_retention_cohorts(SF_DIR).to_pandas()
    # every user is active on their own first day: offset-0 row == cohort size
    day0 = got[got["day_offset"] == 0].set_index("cohort_day")["n_users"]
    sizes = con.execute("""
        SELECT cohort_day, count(*) AS n FROM (
          SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
          FROM events GROUP BY 1) GROUP BY 1
    """).df().set_index("cohort_day")["n"]
    assert day0.sort_index().tolist() == sizes.sort_index().tolist()
    # retention can never exceed the cohort
    m = got.merge(sizes.rename("size"), left_on="cohort_day", right_index=True)
    assert (m["n_users"] <= m["size"]).all()


def test_q5_join_respects_region_filter(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import local_supplier_volume

    got = local_supplier_volume(SF_DIR, region="EUROPE").to_pandas()
    europe = set(con.execute("""
        SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    """).df()["n_name"])
    assert set(got["n_name"]) <= europe
    assert (got["revenue"] > 0).all()


def test_funnel_converted_bounded_by_clickers(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import conversion_funnel

    got = conversion_funnel(SF_DIR).to_pandas()
    assert (got["n_converted"] <= got["n_clickers"]).all()
    n_clickers = con.execute(
        "SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'click'"
    ).fetchone()[0]
    assert got["n_clickers"].sum() == n_clickers
    # widening the window can only convert more
    wide = conversion_funnel(SF_DIR, window_days=10_000).to_pandas()
    m = got.merge(wide, on="click_day", suffixes=("", "_wide"))
    assert (m["n_converted_wide"] >= m["n_converted"]).all()


def test_weekly_active_users_bounds(ray_session, con):
    """WAU dominates DAU on every day, never exceeds the global distinct
    user count, and the day set equals the observed event days."""
    from ocr_corrector_ray.pipelines.analytics import weekly_active_users

    got = weekly_active_users(SF_DIR).to_pandas().set_index("day")["wau"]
    dau = con.execute(
        "SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS dau "
        "FROM events GROUP BY 1"
    ).df().set_index("day")["dau"]
    n_users = con.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sorted(got.index) == sorted(dau.index)
    aligned = pd.concat([got, dau], axis=1)
    assert (aligned["wau"] >= aligned["dau"]).all()
    assert (got <= n_users).all()
    # a trailing window is monotone in window length: 7-day >= 1-day
    one = weekly_active_users(SF_DIR, window_days=1).to_pandas().set_index("day")["wau"]
    assert (got.sort_index().to_numpy() >= one.sort_index().to_numpy()).all()


def test_bigram_pmi_topk_semantics(ray_session, con):
    """Top-k collocations: every survivor clears min_count, the list is
    pmi-descending, and each pmi matches a direct recomputation from
    exact corpus counts."""
    import numpy as np

    from ocr_corrector_ray.pipelines.textstats import bigram_pmi_topk

    got = bigram_pmi_topk(SF_DIR, k=10, min_count=5).to_pandas()
    assert len(got) <= 10
    assert (got["n"] >= 5).all()
    assert (got["pmi"].to_numpy()[:-1] >= got["pmi"].to_numpy()[1:]).all()

    uc = dict(con.execute(
        r"SELECT tok, count(*) FROM (SELECT unnest(regexp_split_to_array("
        r"trim(text), '\s+')) AS tok FROM documents "
        r"WHERE trim(coalesce(text,'')) <> '') GROUP BY tok").fetchall())
    n_total = float(sum(uc.values()))
    for _, row in got.iterrows():
        l, r = row["ngram"].split(" ", 1)
        expect = np.floor(
            np.log2((float(row["n"]) * n_total) / (float(uc[l]) * float(uc[r])))
            * 10000) / 10000
        assert row["pmi"] == expect


def test_event_path_topk_counts_match_pandas(ray_session, con):
    """Every reported path count equals a direct pandas recomputation
    over per-user ordered events."""
    from ocr_corrector_ray.pipelines.analytics import event_path_topk

    got = event_path_topk(SF_DIR, n=2, k=5).to_pandas()
    ev = con.execute(
        "SELECT user_id, ts, event_id, event_type FROM events "
        "ORDER BY user_id, ts, event_id").df()
    from collections import Counter

    c = Counter()
    for _, g in ev.groupby("user_id", sort=False):
        et = g["event_type"].tolist()
        c.update(f"{a}>{b}" for a, b in zip(et, et[1:]))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(map(tuple, got[["path", "n"]].itertuples(index=False))) == top


def test_approx_quantiles_rank_error_bounded(ray_session, con):
    """Each t-digest estimate's exact CDF position is within 1% rank
    error of its target quantile; median within 0.5%."""
    from ocr_corrector_ray.pipelines.sketches import approx_quantiles_value

    got = approx_quantiles_value(SF_DIR, qs=(0.5, 0.9, 0.99)).to_pandas()
    vals = con.execute("SELECT value FROM events").df()["value"].to_numpy()
    vals.sort()
    for _, row in got.iterrows():
        cdf = vals.searchsorted(row["value_est"]) / len(vals)
        tol = 0.005 if row["q"] == 0.5 else 0.01
        assert abs(cdf - row["q"]) <= tol, (row["q"], cdf)


def test_tdigest_merge_associative_and_exactish_small():
    """Digest of a tiny set reproduces exact quantiles; merging in any
    grouping gives the same centroids as one-shot construction."""
    import numpy as np

    from ocr_corrector_ray.pipelines.sketches import TDigest

    rng = np.random.RandomState(7)
    x = rng.gamma(2.0, 10.0, size=5000)
    one = TDigest.from_values(x)
    parts = [TDigest.from_values(c) for c in np.array_split(x, 7)]
    m = parts[0]
    for p in parts[1:]:
        m = m.merge(p)
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(x, q)
        assert abs(one.quantile(q) - exact) / (abs(exact) + 1e-9) < 0.05
        assert abs(m.quantile(q) - exact) / (abs(exact) + 1e-9) < 0.05
    # exact on a set smaller than the centroid budget
    small = TDigest.from_values(np.arange(10, dtype="float64"))
    assert small.quantile(0.0) == 0.0 and small.quantile(1.0) == 9.0


def test_pca_embeddings_matches_numpy(ray_session, con):
    """Distributed moment-partial PCA reproduces a direct numpy
    eigensolve (same sign convention) to float tolerance, and the score
    columns are variance-ordered."""
    import numpy as np

    from ocr_corrector_ray.pipelines.analytics import pca_embeddings

    got = pca_embeddings(SF_DIR, k=3).to_pandas().sort_values("vec_id")
    emb = con.execute(
        "SELECT vec_id, embedding FROM read_parquet("
        f"'{SF_DIR}/embeddings.parquet') ORDER BY vec_id").df()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    mu = V.mean(axis=0)
    cov = (V - mu).T @ (V - mu) / len(V)
    evals, evecs = np.linalg.eigh(cov)
    W = evecs[:, ::-1][:, :3]
    W = W * np.sign(W[np.abs(W).argmax(axis=0), np.arange(3)])
    expect = (V - mu) @ W
    P = got[["pc0", "pc1", "pc2"]].to_numpy()
    assert np.allclose(P, expect, atol=1e-8)
    v = P.var(axis=0)
    assert v[0] >= v[1] >= v[2]


def test_bloom_decontaminate_superset_of_exact(ray_session):
    """The Bloom path can never miss a contaminated doc (no false
    negatives): every exact hit appears with at least its exact count;
    false-positive inflation stays small at the default sizing."""
    from ocr_corrector_ray.pipelines.textstats import (
        bloom_decontaminate_docs,
        decontaminate_docs,
    )

    exact = decontaminate_docs(SF_DIR).to_pandas().set_index("doc_id")["n_hits"]
    bloom = bloom_decontaminate_docs(SF_DIR).to_pandas().set_index("doc_id")["n_hits"]
    assert set(exact.index) <= set(bloom.index)
    aligned = bloom.reindex(exact.index)
    assert (aligned >= exact).all()
    # 2^20 bits vs a few thousand bench grams: position-level false
    # positives should inflate total hits by well under 1%
    assert bloom.sum() <= exact.sum() * 1.01 + 5


def test_dsir_weights_favor_targetlike_docs(ray_session, con):
    """DSIR sanity: a raw doc that shares every bigram with the target
    split must outscore (per gram) the corpus median, and weights are
    emitted for every raw doc — including empty ones at exactly 0."""
    import numpy as np

    from ocr_corrector_ray.pipelines.textstats import dsir_importance_weights

    got = dsir_importance_weights(SF_DIR).to_pandas()
    n_raw = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet') "
        "WHERE doc_id % 97 <> 0"
    ).fetchone()[0]
    assert len(got) == n_raw
    assert not (got["doc_id"] % 97 == 0).any()
    with_grams = got[got["n_grams"] > 0]
    # add-1 smoothing keeps every weight finite
    assert np.isfinite(with_grams["logweight"]).all()
    assert (got.loc[got["n_grams"] == 0, "logweight"] == 0.0).all()


def test_substring_dup_spans_matches_brute_force(ray_session, con):
    """Engine-independent pin: a serial Python recomputation of the
    fixed-window exact-substring signal (no hashes, raw string
    equality) reproduces the distributed result exactly — so the
    hash64 bucketing, the distinct-doc combiner, and the bucketed
    attach introduce no drift."""
    from collections import defaultdict

    from ocr_corrector_ray.pipelines.dedup import substring_dup_spans

    got = substring_dup_spans(SF_DIR).to_pandas().set_index("doc_id").sort_index()
    docs = con.execute(
        f"SELECT doc_id, coalesce(text, '') AS text "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    owners = defaultdict(set)
    wins = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = [text[p : p + 32] for p in range(0, len(text) - 31, 16)]
        wins[doc_id] = ws
        for w in set(ws):
            owners[w].add(doc_id)
    for doc_id, ws in wins.items():
        n_dup = sum(1 for w in ws if len(owners[w]) >= 2)
        row = got.loc[doc_id]
        assert row["n_windows"] == len(ws)
        assert row["n_dup_windows"] == n_dup
    # the synthetic corpus actually exercises the signal (small vocab
    # means cross-doc 32-char collisions exist)
    assert int(got["n_dup_windows"].sum()) > 0
    assert (got["n_dup_windows"] <= got["n_windows"]).all()


def test_cosine_survivors_subsume_lsh_embedding_drops(ray_session):
    """The exact-cosine survivor set can only drop MORE vectors than the
    LSH source (whose recall < 1 can miss pairs), and both keep each
    component's min id."""
    from ocr_corrector_ray.pipelines.dedup import neardup_survivors

    exact = set(
        neardup_survivors(SF_DIR, threshold=0.4, source="cosine")
        .to_pandas()["vec_id"]
    )
    lsh = set(
        neardup_survivors(SF_DIR, threshold=0.4, source="embedding")
        .to_pandas()["vec_id"]
    )
    assert exact <= lsh  # exact recall drops a superset of LSH's drops


def test_chunk_docs_reassembles_to_token_stream(ray_session):
    """Chunks are a partition of each doc's whitespace-token stream:
    concatenating chunk_text in chunk_id order must reproduce
    ' '.join(text.split()), every chunk except the last is exactly
    full, and n_tokens sums to the doc's token count."""
    import pyarrow.parquet as pq

    from ocr_corrector_ray.pipelines.textstats import chunk_docs

    got = chunk_docs(SF_DIR, chunk=64).to_pandas()
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().set_index("doc_id")["text"].fillna("")
    by_doc = got.sort_values(["doc_id", "chunk_id"]).groupby("doc_id")
    seen = set()
    for doc_id, g in by_doc:
        seen.add(doc_id)
        toks = docs.loc[doc_id].split()
        assert list(g["chunk_id"]) == list(range(len(g)))
        assert " ".join(g["chunk_text"]) == " ".join(toks)
        assert int(g["n_tokens"].sum()) == len(toks)
        assert (g["n_tokens"].iloc[:-1] == 64).all()
        assert 1 <= g["n_tokens"].iloc[-1] <= 64
    # every non-empty doc chunked; empty docs absent
    nonempty = {d for d, t in docs.items() if t.split()}
    assert seen == nonempty


def test_lang_temperature_weights_rebalance(ray_session):
    """Temperature weights preserve expected corpus size (sum == n_docs
    up to the 1e-4 floor), upsample the rarest language and downsample
    the most common one, and are constant within a language."""
    from ocr_corrector_ray.pipelines.textstats import lang_temperature_weights

    got = lang_temperature_weights(SF_DIR, alpha=0.3).to_pandas()
    per_lang = got.groupby("lang").agg(
        n=("doc_id", "size"), w=("doc_weight", "first"),
        nuniq=("doc_weight", "nunique"),
    )
    assert (per_lang["nuniq"] == 1).all()
    # expected corpus size preserved (floor-scale slack: 1e-4 per doc)
    assert abs(got["doc_weight"].sum() - len(got)) <= 1e-4 * len(got) + 1e-6
    rare = per_lang["n"].idxmin()
    common = per_lang["n"].idxmax()
    if per_lang.loc[rare, "n"] < per_lang.loc[common, "n"]:
        assert per_lang.loc[rare, "w"] > 1.0 > per_lang.loc[common, "w"]


def test_wordpiece_fertility_matches_serial_tokenizer(ray_session):
    """Exactness pin for the rows-only fertility op: replay the SAME
    vocab construction and FullTokenizer serially over every doc and
    require identical (n_words, n_pieces, n_unk, fertility).  vocab_top
    is 8 here — the sf0.001 synthetic corpus has only ~31 distinct
    words, so a small vocab forces real multi-piece segmentation."""
    from collections import Counter

    import numpy as np
    import pyarrow.parquet as pq

    from ocr_corrector_ray.functions.tokenization import (
        BasicTokenizer, FullTokenizer)
    from ocr_corrector_ray.pipelines.textstats import wordpiece_fertility

    got = (
        wordpiece_fertility(SF_DIR, vocab_top=8)
        .to_pandas().set_index("doc_id").sort_index()
    )
    texts = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().set_index("doc_id")["text"].fillna("")

    basic = BasicTokenizer(do_lower_case=True)
    counts: Counter = Counter()
    for t in texts:
        counts.update(basic.tokenize(t))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    vocab = {}
    for t in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]:
        vocab[t] = len(vocab)
    for w, _ in top:
        if w not in vocab:
            vocab[w] = len(vocab)
        for ch in w:
            for piece in (ch, "##" + ch):
                if piece not in vocab:
                    vocab[piece] = len(vocab)
    tok = FullTokenizer(vocab, do_lower_case=True)

    assert set(got.index) == set(texts.index)
    for doc_id, text in texts.items():
        words = tok.basic.tokenize(text)
        pieces, unk = 0, 0
        for w in words:
            ps = tok.wordpiece.tokenize(w)
            pieces += len(ps)
            unk += sum(1 for p in ps if p == "[UNK]")
        row = got.loc[doc_id]
        assert row["n_words"] == len(words)
        assert row["n_pieces"] == pieces
        assert row["n_unk"] == unk
        exp_f = np.floor(pieces / len(words) * 10000) / 10000 if words else 0.0
        assert row["fertility"] == exp_f
    # the learned vocab must actually compress: corpus-level fertility
    # well under the per-char ceiling, and some multi-piece words exist
    with_words = got[got["n_words"] > 0]
    assert (with_words["fertility"] >= 1.0).all()
    assert (with_words["n_pieces"] > with_words["n_words"]).any()
    corpus_fert = with_words["n_pieces"].sum() / with_words["n_words"].sum()
    assert corpus_fert < 3.0


def test_ccnet_buckets_are_balanced_terciles(ray_session):
    """Bucket sizes follow quantile_disc tercile ranks (± ties at the
    cut values) and head docs have strictly lower xent than tail docs."""
    from ocr_corrector_ray.pipelines.textstats import ccnet_bucket_docs

    got = ccnet_bucket_docs(SF_DIR).to_pandas()
    n = len(got)
    sizes = got["bucket"].value_counts()
    assert set(sizes.index) <= {"head", "middle", "tail"}
    # ties at a cut can only GROW the lower bucket past its rank
    assert sizes.get("head", 0) >= int(n / 3) - 1
    assert sizes.get("head", 0) + sizes.get("middle", 0) >= int(2 * n / 3) - 1
    assert float(got.loc[got["bucket"] == "head", "xent"].max()) < float(
        got.loc[got["bucket"] == "tail", "xent"].min()
    )
    assert (got["n_tokens"] > 0).all()
