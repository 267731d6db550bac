"""Text-analysis operators: n-gram language ID and winnowing document
fingerprints (both DuckDB-oracle-checked since round 3).  The simpler
SQL-expressible text stats live in analytics.py."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data

from ..functions.hashing import hash64_array

# tiny built-in letter-bigram profiles (synthetic but deterministic):
# rank lists of the most characteristic bigrams per language.
_PROFILES = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "es": ["de", "en", "os", "es", "la", "ar", "el", "ue", "ra", "as"],
    "de": ["en", "er", "ch", "de", "ei", "te", "in", "nd", "ie", "ge"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "ou", "ai", "it"],
}


def _p(sf_dir: str, name: str) -> str:
    """Table path — and the one choke-point every query in this module
    passes BEFORE creating its input Dataset, so it opts the session in
    to the hash-shuffle strategy (idempotent; no-op under 4 CPUs).  The
    bench/gate/driver sessions flip it via the flagship anyway; this
    covers the STANDALONE caller, who would otherwise pay a sort-barrier
    shuffle on every groupby (measured 17.1 s vs 7.7 s wall for
    simhash_neardup_pairs at sf0.1 / 32 CPUs)."""
    from .correct import enable_hash_shuffle

    enable_hash_shuffle()
    return os.path.join(sf_dir, f"{name}.parquet")


def _parquet_num_rows(path: str) -> int:
    """Total row count from parquet FOOTERS only — no data pages read.
    Replaces a full ``ds.count()`` scan where an operator only needs N."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        # os.walk: ray.data.read_parquet discovers files recursively, so
        # a nested layout must count the same fragments the read sees
        return sum(
            pq.ParquetFile(os.path.join(root, n)).metadata.num_rows
            for root, _, files in os.walk(path)
            for n in sorted(files)
            if n.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def lang_id_ngram(sf_dir: str):
    """doc_id, lang_pred: cosine of the doc's letter-bigram frequency
    vector against each profile; 'und' for CJK/empty docs.  A heuristic
    n-gram language identifier.

    All profile rows share one L2 norm (10 distinct bigrams, weights
    10..1), so the argmax over normalized cosine equals the argmax over
    the INTEGER scores sum(count_bigram * weight) — which is what the
    DuckDB oracle computes (ties break to the first language in sorted
    order, matching np.argmax's first-max rule)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    langs = sorted(_PROFILES)
    vocab = sorted({b for prof in _PROFILES.values() for b in prof})
    v_index = {b: i for i, b in enumerate(vocab)}
    # INTEGER profile matrix: every profile has 10 distinct bigrams with
    # weights 10..1, so all rows share one L2 norm and the cosine argmax
    # equals the integer-score argmax sum(count_bigram * weight).  Exact
    # integer scoring keeps ties deterministic (first language in sorted
    # order, = np.argmax's first-max rule) and bit-matches the DuckDB
    # oracle — a float dot product breaks integer ties by rounding noise.
    P = np.zeros((len(langs), len(vocab)), dtype=np.int64)
    for li, lang in enumerate(langs):
        for rank, bg in enumerate(_PROFILES[lang]):
            P[li, v_index[bg]] = len(_PROFILES[lang]) - rank

    # byte-pair lookup: code = first_byte*256 + second_byte -> vocab
    # index (-1 = not a profile bigram); the doc separator byte '\n'
    # can never hit the a-z-only vocab, so cross-doc pairs self-mask
    lut = np.full(65536, -1, dtype=np.int16)
    for bg, i in v_index.items():
        lut[ord(bg[0]) * 256 + ord(bg[1])] = i
    V = len(vocab)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per batch (no per-row Python): regex-strip
        # to a-z, then numpy byte-pair counting over the whole batch
        letters = (
            df["text"].fillna("").str.lower().str.replace("[^a-z]", "", regex=True)
        )
        n = len(letters)
        lens = letters.str.len().to_numpy(dtype=np.int64)
        joined = "\n".join(letters) + "\n"
        arr = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
        if len(arr) >= 2:
            codes = arr[:-1].astype(np.int32) * 256 + arr[1:]
            vi = lut[codes]
            doc_of_pair = np.repeat(np.arange(n, dtype=np.int64), lens + 1)[:-1]
            valid = vi >= 0
            counts = np.bincount(
                doc_of_pair[valid] * V + vi[valid], minlength=n * V
            ).reshape(n, V)
        else:
            counts = np.zeros((n, V), dtype=np.int64)
        sims = counts @ P.T  # (n_docs, n_langs) integer scores
        best = np.asarray(langs, dtype=object)[np.argmax(sims, axis=1)]
        und = (lens < 4) | ~counts.any(axis=1)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang_pred": np.where(und, "und", best)}
        )

    return ds.map_batches(fn, batch_format="pandas")


def winnowing_fingerprints(sf_dir: str, k: int = 5, window: int = 4):
    """doc_id, n_fingerprints, min_fingerprint: winnowing (Schleimer et al.,
    SIGMOD 2003) over character k-grams — each sliding window of k-gram
    hashes contributes its minimum; the selected set fingerprints the doc."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n_out, min_out = [], []
        for text in df["text"].fillna(""):
            if len(text) < k:
                n_out.append(0)
                min_out.append(0)
                continue
            grams = [text[i : i + k] for i in range(len(text) - k + 1)]
            # gram hash = shared md5 item hash (== DuckDB's
            # md5_number_lower) >> 1 to fit int64 — SQL-computable, so
            # the operator has a full DuckDB oracle
            hs = (hash64_array(grams) >> np.uint64(1)).astype(np.int64)
            if len(hs) <= window:
                sel = {int(hs.min())}
            else:
                strides = np.lib.stride_tricks.sliding_window_view(hs, window)
                sel = set(strides.min(axis=1).tolist())
            n_out.append(len(sel))
            min_out.append(min(sel))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_fingerprints": pd.Series(n_out, dtype="int64"),
                "min_fingerprint": pd.Series(min_out, dtype="int64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def doc_token_entropy(sf_dir: str):
    """doc_id, n_tokens, entropy: Shannon entropy (bits) of each doc's
    unigram distribution — the classic repetition/diversity quality
    signal for corpus filtering.  entropy = log2(n) - sum(c*log2(c))/n
    over in-doc token counts c, floor-scaled to 1e4 to bit-match the
    DuckDB oracle (same derivation, per the repo's floor-scale rule)."""
    import math
    from collections import Counter

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        nt, ent = [], []
        for text in df["text"].fillna(""):
            toks = text.split()
            n = len(toks)
            if n == 0:
                nt.append(0)
                ent.append(0.0)
                continue
            counts = np.asarray(list(Counter(toks).values()), dtype=np.float64)
            h = math.log2(n) - float((counts * np.log2(counts)).sum()) / n
            nt.append(n)
            ent.append(math.floor(h * 10000) / 10000)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": pd.Series(nt, dtype="int64"),
            "entropy": pd.Series(ent, dtype="float64"),
        })

    return ds.map_batches(fn, batch_format="pandas")


def token_repetition_stats(sf_dir: str, max_top_frac: float = 0.125,
                           max_run_len: int = 2):
    """doc_id, n_tokens, top_token_frac, max_run, keep: the Gopher-style
    (Rae et al. 2021) token-repetition quality rules — the most frequent
    token's share of the doc and the longest consecutive-equal-token
    run; ``keep`` applies both thresholds (empty docs fail).  top frac
    is floor-scaled to 1e4 so it bit-matches the DuckDB oracle (whose
    max_run comes from the classic gaps-and-islands window)."""
    import math
    from collections import Counter

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        nt, tf, mr, keep = [], [], [], []
        for text in df["text"].fillna(""):
            toks = text.split()
            n = len(toks)
            if n == 0:
                nt.append(0)
                tf.append(0.0)
                mr.append(0)
                keep.append(False)
                continue
            frac = math.floor(max(Counter(toks).values()) * 10000 / n) / 10000
            a = np.asarray(toks, dtype=object)
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = a[1:] != a[:-1]
            run = int(np.diff(np.append(np.flatnonzero(change), n)).max())
            nt.append(n)
            tf.append(frac)
            mr.append(run)
            keep.append(frac <= max_top_frac and run <= max_run_len)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": pd.Series(nt, dtype="int64"),
            "top_token_frac": pd.Series(tf, dtype="float64"),
            "max_run": pd.Series(mr, dtype="int64"),
            "keep": pd.Series(keep, dtype="bool"),
        })

    return ds.map_batches(fn, batch_format="pandas")


def dup_ngram_ratio(sf_dir: str, n: int = 3):
    """doc_id, n_ngrams, dup_ratio: fraction of repeated token n-grams
    per document — the standard boilerplate/repetition filter in LLM
    data pipelines (e.g. Gopher/C4-style repetition rules).  Ratio is
    integer-derived (1 - distinct/total, floor-scaled to 1e4), so it
    bit-matches the DuckDB oracle; docs with < n tokens emit 0/0.0."""
    import math

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        total_out, ratio_out = [], []
        for text in df["text"].fillna(""):
            toks = text.split()
            total = len(toks) - n + 1
            if total <= 0:
                total_out.append(0)
                ratio_out.append(0.0)
                continue
            grams = {" ".join(toks[i : i + n]) for i in range(total)}
            ratio = 1.0 - len(grams) / total
            total_out.append(total)
            ratio_out.append(math.floor(ratio * 10000) / 10000)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_ngrams": pd.Series(total_out, dtype="int64"),
            "dup_ratio": pd.Series(ratio_out, dtype="float64"),
        })

    return ds.map_batches(fn, batch_format="pandas")


def pack_sequences(sf_dir: str, budget: int = 256, num_buckets: int = 8,
                   chunk_size: int = 65536):
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): documents stream in doc_id order inside ``doc_id %
    num_buckets`` buckets; each doc's tokens land at cumulative offset
    ``tok_start`` in its bucket's token stream and the training sequence
    it starts in is ``tok_start // budget``.

    ``num_buckets`` is part of the operator's CONTRACT (it defines which
    docs share a sequence), so it is a fixed default, not a
    cluster-derived one — the same input gives the same packing on any
    cluster.  The prefix-sum is HIERARCHICAL (VERDICT r3 #6), so a
    bucket's stream never has to fit one ``map_groups`` call:

    1. per-doc token counts, tagged with ``chunk = doc_id //
       chunk_size`` (chunks are contiguous doc_id ranges, so within a
       bucket the chunk order IS the doc order);
    2. one grouped partial sum per (bucket, chunk) — a tiny table of
       ~``num_buckets * n_docs/chunk_size`` rows — whose per-bucket
       EXCLUSIVE cumsum on the driver yields each chunk's start offset
       (broadcast via ``ray.put``; at 10^12 docs raise ``chunk_size``
       so this stays driver-sized — it does not affect the output);
    3. per-(bucket, chunk) ``map_groups``: local cumsum + the chunk's
       broadcast offset.  Per-call memory is ~``chunk_size/num_buckets``
       rows, independent of corpus size.

    ``chunk_size`` is output-neutral: offsets are exact, so any value
    gives the identical packing (pinned in tests)."""
    import ray

    from ._agg import grouped_agg
    from ._util import physical_partitions

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64")
        nt = np.asarray([len(t.split()) for t in df["text"].fillna("")], dtype="int64")
        return pd.DataFrame({
            "doc_id": ids,
            "bucket": (ids % num_buckets).astype("int32"),
            "chunk": (ids // chunk_size).astype("int64"),
            "n_tokens": nt,
        })

    counted = ds.map_batches(count_tokens, batch_format="pandas").materialize()

    partials = grouped_agg(
        counted.map_batches(
            lambda d: d[["bucket", "chunk", "n_tokens"]], batch_format="pandas"
        ),
        ["bucket", "chunk"], {"tok_sum": ("n_tokens", "sum")},
        num_partitions=num_buckets,
    ).to_pandas()
    partials = partials.sort_values(["bucket", "chunk"], kind="mergesort")
    sums = partials["tok_sum"].to_numpy(dtype="int64")
    csum = np.cumsum(sums) - sums  # exclusive prefix within the sorted order
    # reset at each bucket boundary: subtract the bucket's first exclusive sum
    first_of_bucket = partials["bucket"].ne(partials["bucket"].shift()).to_numpy()
    base = np.where(first_of_bucket, csum, 0)
    np.maximum.accumulate(base, out=base)
    offsets = {
        (int(b), int(c)): int(s)
        for b, c, s in zip(partials["bucket"], partials["chunk"], csum - base)
    }
    offsets_ref = ray.put(offsets)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[(int(g["bucket"].iloc[0]), int(g["chunk"].iloc[0]))]
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy(dtype="int64")
        tok_start = off + np.cumsum(n) - n
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(dtype="int64"),
            "bucket": g["bucket"].to_numpy(dtype="int32"),
            "n_tokens": n,
            "tok_start": tok_start,
            "seq_in_bucket": tok_start // budget,
        })

    return (
        counted.groupby(["bucket", "chunk"], num_partitions=physical_partitions(num_buckets))
        .map_groups(pack, batch_format="pandas")
    )


def curated_docs(sf_dir: str, min_tokens: int = 20, min_stop: float = 0.01,
                 max_stop: float = 0.6, min_entropy: float = 3.0,
                 max_dup: float = 0.2, num_buckets: int | None = None):
    """Composite corpus-curation pipeline — the realistic filter chain a
    training-data build runs, as ONE streaming pass: per-doc quality
    signals (token count, stopword ratio, unigram entropy, dup-trigram
    ratio) computed batch-local, exact-dedup winner per md5 fingerprint
    chosen in a coarse-bucketed groupby (min doc_id keeps the cluster's
    signals), then the threshold gates.  Output: the surviving docs with
    their signals (doc_id, n_tokens, entropy, dup_ratio).

    Scale shape: one signal pass over the corpus (no extra reads per
    signal), ONE exchange keyed on hash64(fingerprint) % P for the
    dedup — fingerprints are uniform, so no skew; per-bucket memory is
    |corpus|/P signal rows (text never crosses the exchange)."""
    import hashlib
    import math
    from collections import Counter

    from .analytics import STOPWORDS
    from ._util import default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    stop = set(STOPWORDS)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def signals(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64")
        fp_out, n_out, st_out, en_out, du_out = [], [], [], [], []
        for text in df["text"].fillna(""):
            fp = hashlib.md5(text.encode("utf-8")).hexdigest()
            toks = text.split()
            n = len(toks)
            fp_out.append(fp)
            n_out.append(n)
            if n == 0:
                st_out.append(0.0)
                en_out.append(0.0)
                du_out.append(0.0)
                continue
            n_stop = sum(1 for w in toks if w in stop)
            st_out.append(math.floor((n_stop * 10000.0) / n) / 10000)
            counts = np.asarray(list(Counter(toks).values()), dtype=np.float64)
            h = math.log2(n) - float((counts * np.log2(counts)).sum()) / n
            en_out.append(math.floor(h * 10000) / 10000)
            total = n - 2
            if total <= 0:
                du_out.append(0.0)
            else:
                grams = {" ".join(toks[i : i + 3]) for i in range(total)}
                du_out.append(math.floor((1.0 - len(grams) / total) * 10000) / 10000)
        fp_arr = np.asarray(fp_out, dtype=object)
        return pd.DataFrame({
            "doc_id": ids,
            "fp": fp_arr,
            "bucket": (hash64_array(fp_out) % np.uint64(num_buckets)).astype("int32"),
            "n_tokens": pd.Series(n_out, dtype="int64"),
            "stop_ratio": pd.Series(st_out, dtype="float64"),
            "entropy": pd.Series(en_out, dtype="float64"),
            "dup_ratio": pd.Series(du_out, dtype="float64"),
        })

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fp", "doc_id"], kind="mergesort")
        w = g.groupby("fp", as_index=False, sort=False).first()
        keep = w[
            (w["n_tokens"] >= min_tokens)
            & (w["stop_ratio"] >= min_stop) & (w["stop_ratio"] <= max_stop)
            & (w["entropy"] >= min_entropy) & (w["dup_ratio"] <= max_dup)
        ]
        return pd.DataFrame({
            "doc_id": keep["doc_id"].to_numpy(dtype="int64"),
            "n_tokens": keep["n_tokens"].to_numpy(dtype="int64"),
            "entropy": keep["entropy"].to_numpy(dtype="float64"),
            "dup_ratio": keep["dup_ratio"].to_numpy(dtype="float64"),
        })

    return (
        ds.map_batches(signals, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(winners, batch_format="pandas")
    )


def unigram_xent_docs(sf_dir: str, num_buckets: int | None = None):
    """doc_id, n_tokens, xent: per-doc cross-entropy (bits/token) under
    the corpus's OWN unigram distribution — the CCNet-style perplexity
    quality signal (Wenzek et al. 2020; low = stereotypical text, high =
    rare-token soup), the cross-doc complement of the in-doc
    ``doc_token_entropy``.  xent = sum(c * (log2(N) - log2(ct))) / n
    over the doc's distinct tokens (ct = corpus count of the token,
    N = corpus token total), floor-scaled to 1e4; empty docs emit 0/0.0.

    Scale shape mirrors ``tfidf_top_terms``: ONE tokenize scan into the
    compact (doc, token, c, n_toks) intermediate (materialized,
    spillable), a distributed token-count table (never driver-sized),
    the ``_bucketed_attach``-style co-bucket on hash64(token) to score
    rows in-bucket, and a doc-bucketed finish — three bounded
    exchanges.  N comes from in-batch partial sums (one tiny row per
    batch reaches the driver)."""
    import math

    import pyarrow as pa

    from ..functions.hashing import hash64_array
    from ._agg import grouped_agg
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    phys = physical_partitions(num_buckets)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    TAGGED = pa.schema([
        ("doc_id", pa.int64()), ("token", pa.string()), ("c", pa.int64()),
        ("n_toks", pa.int64()), ("ct", pa.int64()), ("__side", pa.string()),
        ("__bkt", pa.int32()),
    ])
    CONTRIB = pa.schema([
        ("doc_id", pa.int64()), ("n_toks", pa.int64()), ("contrib", pa.float64()),
    ])

    def doc_term_rows(df: pd.DataFrame) -> pa.Table:
        from itertools import chain

        toks = df["text"].fillna("").str.split()
        n_toks = toks.str.len().to_numpy(dtype="int64")
        ex = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype="int64").repeat(n_toks),
            "token": pd.Series(list(chain.from_iterable(toks)), dtype=object),
            "n_toks": n_toks.repeat(n_toks),
        })
        g = ex.groupby(["doc_id", "token"], as_index=False, sort=False).agg(
            c=("n_toks", "size"), n_toks=("n_toks", "first")
        )
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(dtype="int64")),
            "token": pa.array(g["token"], pa.string()),
            "c": pa.array(g["c"].to_numpy(dtype="int64")),
            "n_toks": pa.array(g["n_toks"].to_numpy(dtype="int64")),
        })

    rows_m = ds.map_batches(doc_term_rows, batch_format="pandas").materialize()

    # corpus token total: per-batch partial sums, one tiny row per batch
    # (iter_batches may COALESCE several partial rows into one batch —
    # sum the whole column, not row 0)
    n_total = sum(
        int(b["partial"].sum()) for b in rows_m.map_batches(
            lambda d: pd.DataFrame({"partial": [int(d["c"].sum())]}),
            batch_format="pandas",
        ).iter_batches(batch_format="pandas")
    )

    ct_tbl = grouped_agg(
        rows_m.map_batches(lambda d: d[["token", "c"]], batch_format="pandas"),
        ["token"], {"ct": ("c", "sum")}, num_partitions=num_buckets,
    ).map_batches(arrow_out, batch_format="pandas")

    def _bkt(tokens) -> np.ndarray:
        return (hash64_array(list(tokens)) % np.uint64(num_buckets)).astype("int32")

    def tag_rows(d: pd.DataFrame) -> pa.Table:
        n = len(d)
        return pa.Table.from_arrays([
            pa.array(d["doc_id"].to_numpy(dtype="int64")),
            pa.array(d["token"], pa.string()),
            pa.array(d["c"].to_numpy(dtype="int64")),
            pa.array(d["n_toks"].to_numpy(dtype="int64")),
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(["r"] * n, pa.string()),
            pa.array(_bkt(d["token"])),
        ], schema=TAGGED)

    def tag_ct(d: pd.DataFrame) -> pa.Table:
        n = len(d)
        return pa.Table.from_arrays([
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(d["token"], pa.string()),
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(np.full(n, 1, dtype="int64")),
            pa.array(d["ct"].to_numpy(dtype="int64")),
            pa.array(["t"] * n, pa.string()),
            pa.array(_bkt(d["token"])),
        ], schema=TAGGED)

    both = rows_m.map_batches(tag_rows, batch_format="pandas").union(
        ct_tbl.map_batches(tag_ct, batch_format="pandas")
    )
    log2_n = math.log2(float(n_total)) if n_total else 0.0

    def score_bucket(g: pd.DataFrame) -> pa.Table:
        t = g[g["__side"] == "t"]
        r = g[g["__side"] == "r"]
        lut = dict(zip(t["token"].tolist(), t["ct"].tolist()))
        ct = r["token"].map(lut).to_numpy(dtype="float64")
        contrib = r["c"].to_numpy(dtype="float64") * (log2_n - np.log2(ct))
        return pa.Table.from_arrays([
            pa.array(r["doc_id"].to_numpy(dtype="int64")),
            pa.array(r["n_toks"].to_numpy(dtype="int64")),
            pa.array(contrib),
        ], schema=CONTRIB)

    scored = both.groupby("__bkt", num_partitions=phys).map_groups(
        score_bucket, batch_format="pandas"
    )

    def add_dbkt(t: pa.Table) -> pa.Table:
        dd = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("__dbkt", pa.array((dd % num_buckets).astype("int32")))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False, sort=False).agg(
            n_tokens=("n_toks", "first"), s=("contrib", "sum")
        )
        xent = np.floor(agg["s"].to_numpy() / agg["n_tokens"].to_numpy()
                        * 10000) / 10000
        return pd.DataFrame({
            "doc_id": agg["doc_id"].to_numpy(dtype="int64"),
            "n_tokens": agg["n_tokens"].to_numpy(dtype="int64"),
            "xent": xent,
        })

    body = (
        scored.map_batches(add_dbkt, batch_format="pyarrow")
        .groupby("__dbkt", num_partitions=phys)
        .map_groups(finish, batch_format="pandas")
    )

    # empty docs never enter the token rows: union their 0/0.0 rows back
    # (footer-cheap id scan, vectorized emptiness mask)
    def empties(df: pd.DataFrame) -> pd.DataFrame:
        mask = df["text"].fillna("").str.split().str.len() == 0
        d = df[mask]
        return pd.DataFrame({
            "doc_id": d["doc_id"].to_numpy(dtype="int64"),
            "n_tokens": np.zeros(len(d), dtype="int64"),
            "xent": np.zeros(len(d), dtype="float64"),
        })

    return body.union(ds.map_batches(empties, batch_format="pandas"))


def tfidf_top_terms(sf_dir: str, k: int = 3, min_df: int = 2,
                    num_buckets: int | None = None):
    """Per-doc top-k TF-IDF terms (doc_id, term, tfidf) — the classic
    corpus-statistics op for boilerplate/keyword analysis.

    Fully distributed (VERDICT r2 #1 — the previous version collected the
    whole document-frequency table on the driver and broadcast a
    whole-vocab idf dict, unbounded driver memory on a heavy-tailed
    vocabulary).  ONE corpus scan (VERDICT r3 #5): the corpus is read and
    tokenized exactly once into a compact (doc, token, c, n_toks)
    intermediate that is MATERIALIZED (object-store blocks, spillable) and
    feeds both the DF pass and the scoring pass; ``n_docs`` comes from the
    parquet footers (O(metadata), no scan).  Then three bounded exchanges,
    none driver-sized:

    1. DF table: coarse grouped count over in-batch DISTINCT
       (doc, token) pairs (the combiner — each doc's distinct tokens
       cross the exchange once).
    2. idf attach: the (doc, token, tf) rows and the pruned DF table
       co-bucket on ``hash64(token) % P`` (the ``_bucketed_attach``
       pattern with a string key); each bucket resolves idf with one
       in-bucket dict over |vocab|/P tokens and emits scored rows —
       the DF table never leaves the workers.
    3. per-doc top-k: rows bucket on ``doc_id % P``; one vectorized
       sort + ``groupby(doc).head(k)`` per bucket.

    tfidf = floor(tf * ln(N/df) * 1e6) / 1e6 (floor-scale, not round —
    bit-matches the DuckDB oracle); ties broken by term."""
    import pyarrow as pa

    from ..functions.hashing import hash64_array
    from ._agg import grouped_agg
    from ._util import default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    phys = physical_partitions(num_buckets)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = _parquet_num_rows(_p(sf_dir, "documents"))

    # every kernel on a shuffle edge emits an EXPLICIT Arrow schema: an
    # empty pandas object column infers as Arrow null and divergent block
    # schemas can split hash-shuffle groups (round-2 lesson)
    TAGGED = pa.schema([
        ("doc_id", pa.int64()), ("token", pa.string()), ("c", pa.int64()),
        ("n_toks", pa.int64()), ("df", pa.int64()), ("__side", pa.string()),
        ("__bkt", pa.int32()),
    ])
    SCORED = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("tfidf", pa.float64()),
    ])

    def doc_term_rows(df: pd.DataFrame) -> pa.Table:
        """One row per DISTINCT (doc, token) with its in-doc count and the
        doc's token total — the unit both downstream passes consume.
        Vectorized: explode-and-group in pandas C kernels, not a per-token
        Python dict loop (VERDICT r3 wrong-list)."""
        from itertools import chain

        toks = df["text"].fillna("").str.split()
        n_toks = toks.str.len().to_numpy(dtype="int64")
        ex = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype="int64").repeat(n_toks),
            "token": pd.Series(list(chain.from_iterable(toks)), dtype=object),
            "n_toks": n_toks.repeat(n_toks),
        })
        g = ex.groupby(["doc_id", "token"], as_index=False, sort=False).agg(
            c=("n_toks", "size"), n_toks=("n_toks", "first")
        )
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(dtype="int64")),
            "token": pa.array(g["token"], pa.string()),
            "c": pa.array(g["c"].to_numpy(dtype="int64")),
            "n_toks": pa.array(g["n_toks"].to_numpy(dtype="int64")),
        })

    # the ONE corpus scan: tokenize once, keep the compact intermediate in
    # the object store (spills under pressure) and serve both passes from it
    rows_m = ds.map_batches(doc_term_rows, batch_format="pandas").materialize()

    def rows():
        return rows_m

    # pass 1: distributed DF table (token, df), pruned to min_df
    from ._util import arrow_out

    df_tbl = grouped_agg(
        rows().map_batches(lambda d: d[["doc_id", "token"]], batch_format="pandas"),
        ["token"], {"df": ("doc_id", "size")}, num_partitions=num_buckets,
    ).map_batches(lambda d: arrow_out(d[d["df"] >= min_df]), batch_format="pandas")

    def _bkt(tokens) -> np.ndarray:
        return (hash64_array(list(tokens)) % np.uint64(num_buckets)).astype("int32")

    # pass 2: co-bucket rows + DF on hash64(token) % P, score in-bucket
    def tag_rows(d: pd.DataFrame) -> pa.Table:
        n = len(d)
        return pa.Table.from_arrays([
            pa.array(d["doc_id"].to_numpy(dtype="int64")),
            pa.array(d["token"], pa.string()),
            pa.array(d["c"].to_numpy(dtype="int64")),
            pa.array(d["n_toks"].to_numpy(dtype="int64")),
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(["r"] * n, pa.string()),
            pa.array(_bkt(d["token"])),
        ], schema=TAGGED)

    def tag_df(d: pd.DataFrame) -> pa.Table:
        n = len(d)
        return pa.Table.from_arrays([
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(d["token"], pa.string()),
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(np.full(n, 1, dtype="int64")),
            pa.array(d["df"].to_numpy(dtype="int64")),
            pa.array(["d"] * n, pa.string()),
            pa.array(_bkt(d["token"])),
        ], schema=TAGGED)

    both = rows().map_batches(tag_rows, batch_format="pandas").union(
        df_tbl.map_batches(tag_df, batch_format="pandas")
    )

    def score_bucket(g: pd.DataFrame) -> pa.Table:
        d = g[g["__side"] == "d"]
        r = g[g["__side"] == "r"]
        lut = dict(zip(d["token"].tolist(), d["df"].tolist()))
        dfv = r["token"].map(lut)
        keep = dfv.notna()
        r = r[keep]
        tfidf = (r["c"].to_numpy(dtype="float64") / r["n_toks"].to_numpy(dtype="float64")) \
            * np.log(n_docs / dfv[keep].to_numpy(dtype="float64"))
        return pa.Table.from_arrays([
            pa.array(r["doc_id"].to_numpy(dtype="int64")),
            pa.array(r["token"], pa.string()),
            pa.array(np.floor(tfidf * 1e6) / 1e6),
        ], schema=SCORED)

    scored = both.groupby("__bkt", num_partitions=phys).map_groups(
        score_bucket, batch_format="pandas"
    )

    # pass 3: per-doc top-k, coarse-bucketed on doc_id (Arrow-native tag)
    def add_dbkt(t: pa.Table) -> pa.Table:
        dd = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("__dbkt", pa.array((dd % num_buckets).astype("int32")))

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "tfidf", "term"],
                          ascending=[True, False, True], kind="mergesort")
        out = g.groupby("doc_id", as_index=False, sort=False).head(k)
        return pa.Table.from_arrays([
            pa.array(out["doc_id"].to_numpy(dtype="int64")),
            pa.array(out["term"], pa.string()),
            pa.array(out["tfidf"].to_numpy(dtype="float64")),
        ], schema=SCORED)

    return (
        scored.map_batches(add_dbkt, batch_format="pyarrow")
        .groupby("__dbkt", num_partitions=phys)
        .map_groups(topk, batch_format="pandas")
    )


def _gram_positions(df: pd.DataFrame, n: int):
    """flat (doc_row, gram) arrays for every token n-gram position —
    shared by the exact and Bloom decontamination probes so their gram
    construction can never diverge (the no-false-negative guarantee of
    the Bloom path depends on it)."""
    toks = df["text"].fillna("").str.split()
    lens = toks.str.len().to_numpy(dtype="int64")
    # explode() emits one NaN row for an EMPTY token list — drop
    # those so positions stay aligned with np.repeat(lens) below
    # (lens counts an empty doc as 0 tokens, explode would add 1)
    flat = toks.explode(ignore_index=True).astype(object)
    flat = flat[flat.notna()].reset_index(drop=True)
    if not len(flat):
        return np.empty(0, dtype="int64"), pd.Series([], dtype=object)
    doc_of = np.repeat(np.arange(len(df), dtype="int64"), lens)
    gram = flat.copy()
    for j in range(1, n):
        gram = gram + " " + flat.shift(-j).fillna("")
    # a position is valid when the whole window stays in one doc
    valid = np.zeros(len(flat), dtype=bool)
    if len(doc_of) >= n:
        valid[: len(doc_of) - (n - 1)] = (
            doc_of[: len(doc_of) - (n - 1)] == doc_of[n - 1 :]
        )
    return doc_of[valid], gram[valid]


def decontaminate_docs(sf_dir: str, n: int = 3, bench_mod: int = 97):
    """Benchmark decontamination: flag corpus documents sharing any token
    ``n``-gram with a held-out benchmark set — the standard "did eval
    data leak into training data" check in LLM pipelines (GPT-3/PaLM
    style 13-gram overlap; ``n`` defaults low because the synthetic
    corpus has a small vocabulary).  The benchmark set is the
    deterministic subset ``doc_id % bench_mod == 0`` of the same table,
    so the operator is self-contained and fully SQL-checkable.

    Scale shape: the benchmark side is eval-set-sized (tiny vs the
    corpus) — its distinct grams are collected ONCE on the driver and
    broadcast via ``ray.put``; the corpus pass is one streaming
    ``map_batches`` doing a vectorized membership probe (exploded token
    frame, shifted-concat gram build, one ``isin`` per batch, bincount
    per doc) — no shuffle anywhere.  Emits (doc_id, n_hits) for
    contaminated docs only; hits count gram POSITIONS, so a doc
    repeating a leaked phrase scores higher."""
    import ray

    cols = ["doc_id", "text"]
    path = _p(sf_dir, "documents")

    def gram_positions(df: pd.DataFrame):
        return _gram_positions(df, n)

    # pass 1 (benchmark side, bounded): per-batch DISTINCT grams of the
    # held-out docs stream to the driver; union into one frozen set.
    bench_ds = ray.data.read_parquet(path, columns=cols)

    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % bench_mod == 0]
        if not len(df):
            return pd.DataFrame({"g": pd.Series([], dtype=object)})
        _, grams = gram_positions(df)
        return pd.DataFrame({"g": grams.drop_duplicates()})

    bench_set = set()
    for b in bench_ds.map_batches(bench_grams, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        bench_set.update(b["g"])
    bench_ref = ray.put(frozenset(bench_set))

    # pass 2 (corpus side, streaming): actor pool so the gram set is
    # deserialized ONCE per worker (per-batch ray.get would re-inflate
    # the frozenset every call), then one vectorized isin per batch
    class Probe:
        def __init__(self, ref):
            self.bench = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["doc_id"] % bench_mod != 0].reset_index(drop=True)
            if not len(df) or not self.bench:
                return pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_hits": pd.Series([], dtype="int64"),
                })
            doc_of, grams = gram_positions(df)
            hit = grams.isin(self.bench).to_numpy()
            counts = np.bincount(doc_of[hit], minlength=len(df))
            keep = counts > 0
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(dtype="int64")[keep],
                "n_hits": counts[keep].astype("int64"),
            })

    return ray.data.read_parquet(path, columns=cols).map_batches(
        Probe, fn_constructor_kwargs={"ref": bench_ref},
        batch_format="pandas", concurrency=(1, 8)
    )


def line_dedup_docs(sf_dir: str, chunk_tokens: int = 8, num_buckets: int | None = None):
    """C4-style line-level exact deduplication (doc_id, kept_text,
    n_chunks, n_kept): each document's token stream is segmented into
    consecutive ``chunk_tokens``-token chunks ("lines" — the synthetic
    corpus has no newlines, so the fixed-width segmentation is the
    deterministic stand-in); a chunk survives iff its (doc_id,
    chunk_idx) is the corpus-wide FIRST occurrence of that chunk text
    (min doc_id, then min position — C4 keeps one copy of every
    three-sentence span; same shape here).  Docs whose every chunk lost
    are dropped.

    Plan (2 exchanges, text crosses only the doc-local reassembly):

    1. map_batches: chunk + hash64 each chunk (md5 low bytes ==
       DuckDB's ``md5_number_lower``, the module's shared idiom) and
       emit (doc_id, chunk_idx, h, bucket=h%B) — 16 bytes/chunk, no
       text, in-batch work fully vectorized.
    2. groupby(h-bucket): all copies of a chunk share a bucket, so ONE
       vectorized transform('min') per bucket finds every winner and
       filters to surviving (doc_id, chunk_idx) pairs.
    3. union survivors with documents on a doc_id bucket
       (the ``_bucketed_attach`` / order_revenue co-location pattern):
       each doc re-chunks its own text locally and emits the kept
       chunks in order.  Per-bucket memory = |docs|/B.

    At 100 TB the dedup exchange carries ~2% of corpus bytes (hashes +
    positions) and the reassembly streams each doc exactly once."""
    import pyarrow as pa

    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    path = _p(sf_dir, "documents")
    # encodes (doc_id, chunk_idx) as one orderable int64; chunk_idx of a
    # doc is < 2^20 chunks (100 TB docs are < 8M tokens each)
    POS = 1 << 20

    def chunk_rows(df: pd.DataFrame):
        doc_ids, idxs, grams = [], [], []
        for did, text in zip(df["doc_id"].to_numpy(), df["text"].fillna("")):
            toks = text.split(" ")
            n = (len(toks) + chunk_tokens - 1) // chunk_tokens
            doc_ids.append(np.full(n, did, dtype=np.int64))
            idxs.append(np.arange(n, dtype=np.int64))
            grams.extend(
                " ".join(toks[i * chunk_tokens:(i + 1) * chunk_tokens]) for i in range(n)
            )
        doc_id = np.concatenate(doc_ids) if doc_ids else np.array([], dtype=np.int64)
        idx = np.concatenate(idxs) if idxs else np.array([], dtype=np.int64)
        h = (hash64_array(grams) >> np.uint64(1)).astype(np.int64)
        return arrow_out(pd.DataFrame({
            "doc_id": doc_id,
            "chunk_idx": idx,
            "h": h,
            "bucket": (h % num_buckets).astype("int32"),
        }))

    def winners(df: pd.DataFrame):
        key = df["doc_id"] * POS + df["chunk_idx"]
        kept = key == key.groupby(df["h"]).transform("min")
        out = df.loc[kept, ["doc_id", "chunk_idx"]]
        return arrow_out(pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(),
            "chunk_idx": out["chunk_idx"].to_numpy(),
        }))

    survivors = (
        ray.data.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(chunk_rows, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(winners, batch_format="pandas")
    )

    # reassembly: co-locate survivors with their doc's text by doc_id
    # bucket; the doc side re-chunks locally (cheap, vectorized string
    # slicing per doc) so chunk text itself never crossed the dedup
    # exchange
    def tag_kept(df: pd.DataFrame):
        return arrow_out(pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "chunk_idx": df["chunk_idx"].to_numpy(),
            "text": pd.Series([None] * len(df), dtype="object"),
            "dbkt": (df["doc_id"] % num_buckets).astype("int32").to_numpy(),
        }), null_casts={"text": pa.string()})

    def tag_docs(df: pd.DataFrame):
        return arrow_out(pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "chunk_idx": np.full(len(df), -1, dtype=np.int64),
            "text": df["text"].fillna(""),
            "dbkt": (df["doc_id"] % num_buckets).astype("int32").to_numpy(),
        }), null_casts={"text": pa.string()})

    def reassemble(df: pd.DataFrame):
        texts = dict(zip(
            df.loc[df["chunk_idx"] < 0, "doc_id"].tolist(),
            df.loc[df["chunk_idx"] < 0, "text"].tolist(),
        ))
        kept = df[df["chunk_idx"] >= 0].sort_values(["doc_id", "chunk_idx"])
        out_doc, out_text, out_nc, out_nk = [], [], [], []
        for did, g in kept.groupby("doc_id", sort=True):
            toks = texts[did].split(" ")
            n_chunks = (len(toks) + chunk_tokens - 1) // chunk_tokens
            pieces = [
                " ".join(toks[i * chunk_tokens:(i + 1) * chunk_tokens])
                for i in g["chunk_idx"].to_numpy()
            ]
            out_doc.append(did)
            out_text.append(" ".join(pieces))
            out_nc.append(n_chunks)
            out_nk.append(len(pieces))
        return arrow_out(pd.DataFrame({
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "kept_text": pd.Series(out_text, dtype="object"),
            "n_chunks": pd.Series(out_nc, dtype="int64"),
            "n_kept": pd.Series(out_nk, dtype="int64"),
        }), null_casts={"kept_text": pa.string()})

    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    return (
        survivors.map_batches(tag_kept, batch_format="pandas")
        .union(docs.map_batches(tag_docs, batch_format="pandas"))
        .groupby("dbkt", num_partitions=physical_partitions(num_buckets))
        .map_groups(reassemble, batch_format="pandas")
    )


# RE2-compatible (no lookaround) so DuckDB's regexp_* mirrors them exactly;
# compiled once at module import, shared by every worker that imports it
_PII_EMAIL = r"[A-Za-z0-9_.]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _wrap_pii(df: pd.DataFrame) -> pd.Series:
    """Deterministic PII injection (the extract-kernel artifact-wrap
    pattern, analytics._wrap_pdf): contact lines derived from doc_id are
    appended so the scrub kernel has real matches at every density —
    odd docs carry a second e-mail, every third doc an IP."""
    d = df["doc_id"].astype("int64")
    tail = (
        " contact user" + d.astype(str) + "@example.com"
        + (" alt" + d.astype(str) + "@mail.example.org").where(d % 2 == 1, "")
        + " tel 555-" + (1000 + d % 9000).astype(str)
        + (" host 10.0." + (d % 256).astype(str) + "." + (d % 254 + 1).astype(str)).where(
            d % 3 == 0, ""
        )
    )
    return df["text"].fillna("") + tail


def redact_pii_docs(sf_dir: str):
    """PII scrub (doc_id, clean_text, n_emails, n_phones, n_ips):
    e-mails, phone numbers and IPv4 addresses are replaced with typed
    placeholder tags and counted, over artifact-wrapped documents.text
    (deterministic injection — the corpus itself carries no PII).

    Embarrassingly parallel: one map_batches, compiled-regex
    ``pandas.str`` kernels (C-level loop), no exchange — at 100 TB this
    runs at read bandwidth.  Order matters and is pinned: e-mails are
    scrubbed BEFORE IPs so a dotted mail domain can't be half-eaten by
    the IP rule; the SQL mirror applies the same order."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    from ._util import arrow_out

    def scrub(df: pd.DataFrame):
        t = _wrap_pii(df)
        n_emails = t.str.count(_PII_EMAIL)
        t = t.str.replace(_PII_EMAIL, "<EMAIL>", regex=True)
        n_phones = t.str.count(_PII_PHONE)
        t = t.str.replace(_PII_PHONE, "<PHONE>", regex=True)
        n_ips = t.str.count(_PII_IP)
        t = t.str.replace(_PII_IP, "<IP>", regex=True)
        return arrow_out(pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "clean_text": t,
            "n_emails": n_emails.astype("int64"),
            "n_phones": n_phones.astype("int64"),
            "n_ips": n_ips.astype("int64"),
        }))

    return ds.map_batches(scrub, batch_format="pandas")


def bigram_pmi_topk(sf_dir: str, k: int = 20, min_count: int = 5,
                    num_buckets: int | None = None):
    """Collocation mining (ngram, n, pmi): top-k adjacent-token bigrams
    by pointwise mutual information (Church & Hanks 1990), restricted to
    bigrams seen >= ``min_count`` times.  pmi = log2(c_bg * N /
    (c_left * c_right)) with N the corpus unigram total, floor-scaled to
    1e4 so the DuckDB mirror hashes identically; ties break on ngram.

    Scale shape: ONE tokenize scan emits tagged in-batch partial counts
    (unigram + bigram rows share the stream; the materialized
    intermediate is vocabulary-, not corpus-, sized per batch).  Bigram
    totals apply the min_count filter inside the agg finish — each
    bigram lives wholly in its hash partition, so the filter is exact
    and the survivor table is collocation-sized.  The two endpoint-count
    attaches are hash64(token) co-buckets against the unigram table
    (vocabulary-sized: never broadcast or driver-materialized —
    same pattern as unigram_xent_docs).  Final top-k is per-bucket
    head(k) -> global sort over <= P*k rows (exact: any global winner
    is a winner of its right-endpoint bucket)."""
    import pyarrow as pa

    from ._agg import grouped_agg
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    phys = physical_partitions(num_buckets)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        uc: Counter = Counter()
        bc: Counter = Counter()
        for toks in df["text"].fillna("").str.strip().str.split():
            uc.update(toks)
            bc.update(zip(toks, toks[1:]))
        ub = pd.DataFrame({
            "l": list(uc.keys()), "r": "",
            "c": pd.Series(list(uc.values()), dtype="int64"), "kind": "u",
        })
        ls, rs = (list(x) for x in zip(*bc.keys())) if bc else ([], [])
        bb = pd.DataFrame({
            "l": ls, "r": rs,
            "c": pd.Series(list(bc.values()), dtype="int64"), "kind": "b",
        })
        return arrow_out(pd.concat([ub, bb], ignore_index=True))

    parts = ds.map_batches(partial_counts, batch_format="pandas").materialize()

    # corpus unigram total: one tiny partial row per batch
    n_total = sum(
        int(b["partial"].sum()) for b in parts.map_batches(
            lambda d: pd.DataFrame(
                {"partial": [int(d.loc[d["kind"] == "u", "c"].sum())]}),
            batch_format="pandas",
        ).iter_batches(batch_format="pandas")
    )

    uni = grouped_agg(
        parts.map_batches(lambda d: d.loc[d["kind"] == "u", ["l", "c"]],
                          batch_format="pandas"),
        ["l"], {"ct": ("c", "sum")}, num_partitions=num_buckets,
    ).materialize()
    bg = grouped_agg(
        parts.map_batches(lambda d: d.loc[d["kind"] == "b", ["l", "r", "c"]],
                          batch_format="pandas"),
        ["l", "r"], {"n": ("c", "sum")}, num_partitions=num_buckets,
        finish_fn=lambda g: g[g["n"] >= min_count],
    )

    def _bkt(tokens) -> np.ndarray:
        return (hash64_array(list(tokens)) % np.uint64(num_buckets)).astype("int32")

    TAGGED = pa.schema([
        ("l", pa.string()), ("r", pa.string()), ("n", pa.int64()),
        ("ct", pa.int64()), ("__side", pa.string()), ("__bkt", pa.int32()),
    ])

    def tag_uni_left(d: pd.DataFrame) -> pa.Table:
        n = len(d)
        return pa.Table.from_arrays([
            pa.array(d["l"], pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(d["ct"].to_numpy(dtype="int64")),
            pa.array(["t"] * n, pa.string()),
            pa.array(_bkt(d["l"])),
        ], schema=TAGGED)

    def tag_bg_left(d: pd.DataFrame) -> pa.Table:
        n = len(d)
        return pa.Table.from_arrays([
            pa.array(d["l"], pa.string()),
            pa.array(d["r"], pa.string()),
            pa.array(d["n"].to_numpy(dtype="int64")),
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(["r"] * n, pa.string()),
            pa.array(_bkt(d["l"])),
        ], schema=TAGGED)

    def attach_left(g: pd.DataFrame) -> pa.Table:
        t = g[g["__side"] == "t"]
        r = g[g["__side"] == "r"]
        lut = dict(zip(t["l"].tolist(), t["ct"].tolist()))
        return pa.table({
            "l": pa.array(r["l"], pa.string()),
            "r": pa.array(r["r"], pa.string()),
            "n": pa.array(r["n"].to_numpy(dtype="int64")),
            "cl": pa.array(r["l"].map(lut).to_numpy(dtype="int64")),
        })

    with_left = (
        bg.map_batches(tag_bg_left, batch_format="pandas")
        .union(uni.map_batches(tag_uni_left, batch_format="pandas"))
        .groupby("__bkt", num_partitions=phys)
        .map_groups(attach_left, batch_format="pandas")
    )

    TAGGED2 = pa.schema([
        ("l", pa.string()), ("r", pa.string()), ("n", pa.int64()),
        ("cl", pa.int64()), ("ct", pa.int64()), ("__side", pa.string()),
        ("__bkt", pa.int32()),
    ])

    def tag_bg_right(d: pd.DataFrame) -> pa.Table:
        n = len(d)
        return pa.Table.from_arrays([
            pa.array(d["l"], pa.string()),
            pa.array(d["r"], pa.string()),
            pa.array(d["n"].to_numpy(dtype="int64")),
            pa.array(d["cl"].to_numpy(dtype="int64")),
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(["r"] * n, pa.string()),
            pa.array(_bkt(d["r"])),
        ], schema=TAGGED2)

    def tag_uni_right(d: pd.DataFrame) -> pa.Table:
        n = len(d)
        return pa.Table.from_arrays([
            pa.array([""] * n, pa.string()),
            pa.array(d["l"], pa.string()),
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(np.full(n, -1, dtype="int64")),
            pa.array(d["ct"].to_numpy(dtype="int64")),
            pa.array(["t"] * n, pa.string()),
            pa.array(_bkt(d["l"])),
        ], schema=TAGGED2)

    nf = float(n_total)

    def attach_right_and_score(g: pd.DataFrame) -> pa.Table:
        t = g[g["__side"] == "t"]
        r = g[g["__side"] == "r"]
        lut = dict(zip(t["r"].tolist(), t["ct"].tolist()))
        cr = r["r"].map(lut).to_numpy(dtype="float64")
        cl = r["cl"].to_numpy(dtype="float64")
        n = r["n"].to_numpy(dtype="float64")
        # same association order as the SQL mirror: (c*N) / (cl*cr)
        pmi = np.floor(np.log2((n * nf) / (cl * cr)) * 10000) / 10000
        out = pd.DataFrame({
            "ngram": r["l"].to_numpy(dtype=object) + " " + r["r"].to_numpy(dtype=object),
            "n": r["n"].to_numpy(dtype="int64"),
            "pmi": pmi,
        }).sort_values(["pmi", "ngram"], ascending=[False, True]).head(k)
        return pa.table({
            "ngram": pa.array(out["ngram"], pa.string()),
            "n": pa.array(out["n"].to_numpy(dtype="int64")),
            "pmi": pa.array(out["pmi"].to_numpy(dtype="float64")),
        })

    return (
        with_left.map_batches(tag_bg_right, batch_format="pandas")
        .union(uni.map_batches(tag_uni_right, batch_format="pandas"))
        .groupby("__bkt", num_partitions=phys)
        .map_groups(attach_right_and_score, batch_format="pandas")
        .sort(["pmi", "ngram"], descending=[True, False])
        .limit(k)
    )


def _bloom_positions(grams, m_bits: int, k_hashes: int):
    """(n_grams, k) array of Bloom bit positions via double hashing
    (Kirsch & Mitzenmacher 2006): pos_i = (h1 + i*h2) mod m, both
    halves drawn from the repo's shared 64-bit gram hash."""
    h = hash64_array(list(grams))
    h1 = h % np.uint64(m_bits)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)) % np.uint64(m_bits)
    i = np.arange(k_hashes, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def bloom_decontaminate_docs(sf_dir: str, n: int = 3, bench_mod: int = 97,
                             m_bits: int = 1 << 20, k_hashes: int = 4):
    """Bloom-filter decontamination — the 100-TB scale path of
    ``decontaminate_docs``.  The exact operator broadcasts the benchmark
    gram set as a Python frozenset; at a real eval-suite scale (billions
    of grams) that set no longer fits a worker heap, so this variant
    compresses it into a fixed ``m_bits`` Bloom bit array (128 KiB at
    the default 2^20) with NO false negatives: every exactly-
    contaminated doc is flagged with at least its exact hit count
    (pytest pins the superset property and bounds the false-positive
    inflation).

    Scale shape: the benchmark side builds PARTIAL bit arrays per batch
    (one fixed-size bytes row per batch, regardless of gram count) that
    the driver ORs — merge traffic is batch-count-, never gram-count-,
    sized, exactly like the HLL sketch; the corpus side is the same
    streaming actor-pool probe as the exact path, with the isin swapped
    for a vectorized k-position bit test.  Gram construction is shared
    (``_gram_positions``) so the two paths can never diverge."""
    import ray

    cols = ["doc_id", "text"]
    path = _p(sf_dir, "documents")
    n_words = m_bits // 64

    def bench_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % bench_mod == 0]
        arr = np.zeros(n_words, dtype=np.uint64)
        if len(df):
            _, grams = _gram_positions(df, n)
            if len(grams):
                pos = _bloom_positions(grams.to_numpy(dtype=object), m_bits, k_hashes)
                words = (pos >> np.uint64(6)).ravel()
                bits = np.uint64(1) << (pos & np.uint64(63)).ravel()
                np.bitwise_or.at(arr, words, bits)
        return pd.DataFrame({"bloom": [arr.tobytes()]})

    merged = np.zeros(n_words, dtype=np.uint64)
    for b in (
        ray.data.read_parquet(path, columns=cols)
        .map_batches(bench_partial, batch_format="pandas")
        .iter_batches(batch_format="pandas")
    ):
        for raw in b["bloom"]:
            merged |= np.frombuffer(raw, dtype=np.uint64)
    bloom_ref = ray.put(merged)

    class Probe:
        def __init__(self, ref):
            self.bloom = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["doc_id"] % bench_mod != 0].reset_index(drop=True)
            empty = pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "n_hits": pd.Series([], dtype="int64"),
            })
            if not len(df):
                return empty
            doc_of, grams = _gram_positions(df, n)
            if not len(grams):
                return empty
            pos = _bloom_positions(grams.to_numpy(dtype=object), m_bits, k_hashes)
            words = pos >> np.uint64(6)
            bits = (pos & np.uint64(63)).astype(np.uint64)
            set_ = (self.bloom[words] >> bits) & np.uint64(1)
            hit = set_.all(axis=1)
            counts = np.bincount(doc_of[hit], minlength=len(df))
            keep = counts > 0
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(dtype="int64")[keep],
                "n_hits": counts[keep].astype("int64"),
            })

    return ray.data.read_parquet(path, columns=cols).map_batches(
        Probe, fn_constructor_kwargs={"ref": bloom_ref},
        batch_format="pandas", concurrency=(1, 8)
    )


def dsir_importance_weights(sf_dir: str, num_feat: int = 1024, bench_mod: int = 97):
    """doc_id, n_grams, logweight: DSIR-style importance weights (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling") — each RAW document scored by the log-likelihood ratio
    of its hashed token-bigram features under the target vs the raw
    distribution: sum over gram positions of log(p_target(bucket)) -
    log(p_raw(bucket)), bucket = hash64(gram) % ``num_feat``, both
    distributions add-1 smoothed.  High logweight = reads like the
    target set; downstream selection resamples proportional to the
    exponentiated weight.  The target split reuses the deterministic
    ``doc_id % bench_mod == 0`` convention of ``decontaminate_docs`` so
    the operator is self-contained and fully SQL-checkable.

    Scale shape: pass 1 streams per-batch bucket bincounts (≤ num_feat
    rows per batch per side) to the driver and sums them into two
    bounded count vectors — the corpus never lands anywhere; the
    log-ratio LUT (num_feat float64s) broadcasts once via ``ray.put``;
    pass 2 is one streaming map_batches doing a vectorized bucket
    lookup + per-doc bincount-weighted sums.  No shuffle anywhere."""
    import ray

    path = _p(sf_dir, "documents")
    cols = ["doc_id", "text"]

    def bucket_partials(df: pd.DataFrame) -> pd.DataFrame:
        doc_of, grams = _gram_positions(df, 2)
        if not len(grams):
            return pd.DataFrame({
                "bkt": pd.Series([], dtype="int64"),
                "ct": pd.Series([], dtype="int64"),
                "cr": pd.Series([], dtype="int64"),
            })
        bkt = (hash64_array(list(grams)) % np.uint64(num_feat)).astype("int64")
        is_t = (df["doc_id"].to_numpy(dtype="int64")[doc_of] % bench_mod) == 0
        ct = np.bincount(bkt[is_t], minlength=num_feat)
        cr = np.bincount(bkt[~is_t], minlength=num_feat)
        idx = np.nonzero((ct > 0) | (cr > 0))[0]
        return pd.DataFrame({
            "bkt": idx.astype("int64"),
            "ct": ct[idx].astype("int64"),
            "cr": cr[idx].astype("int64"),
        })

    c_tgt = np.zeros(num_feat, dtype=np.int64)
    c_raw = np.zeros(num_feat, dtype=np.int64)
    for b in (
        ray.data.read_parquet(path, columns=cols)
        .map_batches(bucket_partials, batch_format="pandas")
        .iter_batches(batch_format="pandas")
    ):
        np.add.at(c_tgt, b["bkt"].to_numpy(), b["ct"].to_numpy())
        np.add.at(c_raw, b["bkt"].to_numpy(), b["cr"].to_numpy())

    n_tgt, n_raw = int(c_tgt.sum()), int(c_raw.sum())
    lr = np.log((c_tgt + 1) / (n_tgt + float(num_feat))) - np.log(
        (c_raw + 1) / (n_raw + float(num_feat))
    )
    lr_ref = ray.put(lr)

    class Score:
        def __init__(self, ref):
            self.lr = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["doc_id"] % bench_mod != 0].reset_index(drop=True)
            n = len(df)
            if not n:
                return pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                    "logweight": pd.Series([], dtype="float64"),
                })
            doc_of, grams = _gram_positions(df, 2)
            if len(grams):
                bkt = (hash64_array(list(grams)) % np.uint64(num_feat)).astype("int64")
                s = np.bincount(doc_of, weights=self.lr[bkt], minlength=n)
                n_grams = np.bincount(doc_of, minlength=n)
            else:
                s = np.zeros(n, dtype=np.float64)
                n_grams = np.zeros(n, dtype=np.int64)
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(dtype="int64"),
                "n_grams": n_grams.astype("int64"),
                "logweight": np.floor(s * 10000) / 10000,
            })

    return ray.data.read_parquet(path, columns=cols).map_batches(
        Score, fn_constructor_kwargs={"ref": lr_ref},
        batch_format="pandas", concurrency=(1, 8)
    )


def chunk_docs(sf_dir: str, chunk: int = 64):
    """doc_id, chunk_id, n_tokens, chunk_text: split each document's
    whitespace-token stream into fixed-size non-overlapping chunks —
    the standard context-window preparation step before tokenizer
    packing (``pack_sequences`` consumes whole docs; this feeds it
    bounded pieces so one giant doc cannot blow a sequence budget).

    Scale: embarrassingly parallel — one pruned read, one map_batches,
    no exchange; output rows ~ n_tokens/chunk per doc.  Each chunk row
    carries only its own slice of text, so block sizes stay bounded
    even for pathological multi-MB documents (the explode mirrors the
    span-explode design of pipelines/correct.py).  Empty docs produce
    no chunks (mirrored by the oracle's trim() filter)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, chunk_ids, ntoks, ctexts = [], [], [], []
        for did, text in zip(df["doc_id"].to_numpy(), df["text"].fillna("")):
            toks = text.split()
            n = len(toks)
            for ci in range((n + chunk - 1) // chunk):
                seg = toks[ci * chunk:(ci + 1) * chunk]
                doc_ids.append(did)
                chunk_ids.append(ci)
                ntoks.append(len(seg))
                ctexts.append(" ".join(seg))
        return pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "chunk_id": pd.Series(chunk_ids, dtype="int64"),
            "n_tokens": pd.Series(ntoks, dtype="int64"),
            "chunk_text": pd.Series(ctexts, dtype="object"),
        })

    return ds.map_batches(fn, batch_format="pandas")


def lang_temperature_weights(sf_dir: str, alpha: float = 0.3):
    """doc_id, lang, doc_weight: per-document multiplicative resampling
    weight under temperature-based language rebalancing (the public
    XLM-R / mBERT exponential-smoothing recipe): with p_l the corpus
    language share, the target mix is q_l = p_l^alpha / sum_m p_m^alpha
    and each doc in language l gets weight q_l / p_l, so upsampling
    low-resource languages and downsampling dominant ones while the
    expected corpus size is preserved (sum of weights == n_docs).

    Scale: pass 1 is a groupby('lang').count() whose output is bounded
    by the number of LANGUAGES (tiny), pass 2 broadcasts the weight map
    into a stateless map_batches — no doc-sized exchange anywhere.
    Weights are floor-scaled to 1e4 per the repo's oracle-bit-match
    rule."""
    path = _p(sf_dir, "documents")
    counts = (
        ray.data.read_parquet(path, columns=["lang"])
        .groupby("lang").count().to_pandas()
        .sort_values("lang", ignore_index=True)  # deterministic sum order
    )
    n = counts["count()"].to_numpy(dtype=np.float64)
    p = n / n.sum()
    pa_ = np.power(p, alpha)
    w = np.floor(pa_ / pa_.sum() / p * 10000) / 10000
    wmap = dict(zip(counts["lang"], w))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype="int64"),
            "lang": df["lang"],
            "doc_weight": df["lang"].map(wmap).astype("float64"),
        })

    return ray.data.read_parquet(path, columns=["doc_id", "lang"]).map_batches(
        fn, batch_format="pandas"
    )


def wordpiece_fertility(sf_dir: str, vocab_top: int = 512):
    """doc_id, n_words, n_pieces, n_unk, fertility: wordpiece fertility
    audit — pieces emitted per basic token under the repo's
    reference-parity FullTokenizer (functions/tokenization.py, the
    reference's BasicTokenizer→WordpieceTokenizer chain) with a vocab
    LEARNED from this corpus: the top ``vocab_top`` basic tokens as
    whole-word pieces plus every character (word-initial and "##"
    continuation forms), so common words cost one piece and rare words
    shatter.  Fertility is THE quantity a tokenizer choice is judged by
    before a training run (pieces/word ≈ sequence-length multiplier).

    Scale: pass 1 is the ngram_topk(n=1) shape — in-batch Counter
    combiner, coarse-bucket grouped sum, exact per-partition head(k) —
    so the exchange is distinct-words-per-batch rows and the driver only
    ever holds the k winners; pass 2 broadcasts the vocab via ray.put
    into an actor pool (tokenizer built once per actor in __init__).
    Rows-only in the driver gate: wordpiece max-munch segmentation is
    not SQL-expressible; exactness is pinned by a pytest that replays
    the identical FullTokenizer serially."""
    from ._agg import grouped_agg
    from ..functions.tokenization import BasicTokenizer

    path = _p(sf_dir, "documents")
    ds = ray.data.read_parquet(path, columns=["text"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        basic = BasicTokenizer(do_lower_case=True)
        c: Counter = Counter()
        for text in df["text"].fillna(""):
            c.update(basic.tokenize(text))
        return pd.DataFrame(
            {"word": list(c.keys()),
             "n": pd.Series(list(c.values()), dtype="int64")}
        )

    winners = grouped_agg(
        ds.map_batches(partial_counts, batch_format="pandas"),
        ["word"], {"n": ("n", "sum")},
        finish_fn=lambda g: g.sort_values(
            ["n", "word"], ascending=[False, True]
        ).head(vocab_top),
    ).sort(["n", "word"], descending=[True, False]).limit(vocab_top)

    top_words = [r["word"] for r in winners.take(vocab_top)]
    vocab: dict[str, int] = {}
    for t in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]:
        vocab[t] = len(vocab)
    for w in top_words:
        if w not in vocab:
            vocab[w] = len(vocab)
        for ch in w:  # char fallback pieces so top-word chars never UNK
            for piece in (ch, "##" + ch):
                if piece not in vocab:
                    vocab[piece] = len(vocab)
    vocab_ref = ray.put(vocab)

    class Fertility:
        def __init__(self, ref):
            from ..functions.tokenization import FullTokenizer

            self.tok = FullTokenizer(ray.get(ref), do_lower_case=True)
            # distinct words ≪ word instances: memoize the max-munch
            # result per word for the actor's lifetime (bounded by the
            # corpus vocabulary, the same quantity pass 1 aggregates)
            self._memo: dict[str, tuple[int, int]] = {}

        def _word(self, w: str) -> tuple[int, int]:
            hit = self._memo.get(w)
            if hit is None:
                ps = self.tok.wordpiece.tokenize(w)
                hit = (len(ps), sum(1 for p in ps if p == "[UNK]"))
                self._memo[w] = hit
            return hit

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            nw, np_, nu, fert = [], [], [], []
            for text in df["text"].fillna(""):
                words = self.tok.basic.tokenize(text)
                pieces = 0
                unk = 0
                for w in words:
                    n_p, n_u = self._word(w)
                    pieces += n_p
                    unk += n_u
                nw.append(len(words))
                np_.append(pieces)
                nu.append(unk)
                fert.append(
                    np.floor(pieces / len(words) * 10000) / 10000
                    if words else 0.0
                )
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(dtype="int64"),
                "n_words": pd.Series(nw, dtype="int64"),
                "n_pieces": pd.Series(np_, dtype="int64"),
                "n_unk": pd.Series(nu, dtype="int64"),
                "fertility": pd.Series(fert, dtype="float64"),
            })

    return ray.data.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        Fertility, fn_constructor_kwargs={"ref": vocab_ref},
        batch_format="pandas", concurrency=(1, 8)
    )


def ccnet_bucket_docs(sf_dir: str):
    """doc_id, n_tokens, xent, bucket: CCNet-style (Wenzek et al. 2020)
    perplexity bucketing — non-empty docs split into head / middle /
    tail terciles by their unigram cross-entropy (``unigram_xent_docs``
    is the scoring pass; lower xent = more natural under the corpus's
    own LM = head).  The classic curation move: train on head+middle,
    audit or drop tail.

    Scale: the xent table (three fixed-width columns, no text) is
    materialized ONCE — ~1/1000 of corpus bytes — then (a) a bounded
    histogram over the floor-scaled xent values (distinct count ≤ 1e4 ×
    the xent range in bits, independent of corpus size) yields EXACT
    tercile cuts with quantile_disc semantics (1-based ceil(n*q)-th
    element, same derivation as lang_quantile_chars), and (b) a
    stateless broadcast-cut labeling pass re-reads the same
    materialized table.  No doc-text ever crosses an exchange."""
    from ._agg import grouped_agg

    xent_ds = unigram_xent_docs(sf_dir)

    def nonempty(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_tokens"] > 0]

    scored = xent_ds.map_batches(nonempty, batch_format="pandas").materialize()

    hist = grouped_agg(scored, ["xent"], {"cnt": ("xent", "size")}).to_pandas()
    hist = hist.sort_values("xent", ignore_index=True)
    cum = hist["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    vals = hist["xent"].to_numpy()

    def disc(q: float) -> float:
        pos = int(np.ceil(n * q))  # 1-based rank, quantile_disc semantics
        return float(vals[np.searchsorted(cum, pos)])

    c1, c2 = disc(1.0 / 3.0), disc(2.0 / 3.0)

    def label(df: pd.DataFrame) -> pd.DataFrame:
        x = df["xent"].to_numpy()
        bucket = np.where(x <= c1, "head", np.where(x <= c2, "middle", "tail"))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype="int64"),
            "n_tokens": df["n_tokens"].to_numpy(dtype="int64"),
            "xent": x,
            "bucket": pd.Series(bucket, dtype="object"),
        })

    return scored.map_batches(label, batch_format="pandas")


def gopher_quality_docs(sf_dir: str, min_words: int = 50, max_words: int = 100_000,
                        min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                        max_symbol_ratio: float = 0.1, min_frac_alpha: float = 0.8,
                        min_stop: int = 2):
    """doc_id, n_words, mean_word_len, frac_alpha_words, symbol_ratio,
    n_stop, keep: the Gopher document-quality rule set (Rae et al. 2021
    §A1.1 — the public heuristics every large-scale pretraining corpus
    pass applies before model-based filtering): word count within
    [min_words, max_words], mean word length within [3, 10], symbol
    ratio ('#' and '...' occurrences per word) below 0.1, >= 80% of
    words containing an alphabetic character, and at least two
    stop words.  ``keep`` is the conjunction; every intermediate signal
    is emitted so a curation pass can re-threshold without re-scanning.

    Ratios are floor-scaled to 1e4 and the thresholds compare the
    SCALED values, so the DuckDB oracle reproduces ``keep`` exactly.
    Embarrassingly parallel: one pruned read, one vectorized
    token-explode + bincount kernel per batch, no exchange."""
    from itertools import chain

    from .analytics import STOPWORDS

    stop = set(STOPWORDS)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        raw = df["text"].fillna("")
        toks = raw.str.split()
        n = toks.str.len().to_numpy(dtype="int64")
        ndocs = len(df)
        flat = pd.Series(list(chain.from_iterable(toks)), dtype=object)
        idx = np.repeat(np.arange(ndocs), n)
        if len(flat):
            tlens = flat.str.len().to_numpy(dtype="float64")
            alpha = flat.str.contains("[A-Za-z]", regex=True).to_numpy(dtype="float64")
            stops = flat.isin(stop).to_numpy(dtype="float64")
            sum_len = np.bincount(idx, weights=tlens, minlength=ndocs)
            n_alpha = np.bincount(idx, weights=alpha, minlength=ndocs)
            n_stop = np.bincount(idx, weights=stops, minlength=ndocs)
        else:
            sum_len = n_alpha = n_stop = np.zeros(ndocs, dtype="float64")
        symbols = (raw.str.count("#") + raw.str.count(r"\.\.\.")).to_numpy(
            dtype="float64")
        safe_n = np.maximum(n, 1)
        mean_len = np.floor(sum_len / safe_n * 10000) / 10000
        frac_alpha = np.floor(n_alpha / safe_n * 10000) / 10000
        sym_ratio = np.floor(symbols / safe_n * 10000) / 10000
        keep = (
            (n >= min_words) & (n <= max_words)
            & (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
            & (sym_ratio < max_symbol_ratio)
            & (frac_alpha >= min_frac_alpha)
            & (n_stop >= min_stop)
        )
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype="int64"),
            "n_words": n,
            "mean_word_len": mean_len,
            "frac_alpha_words": frac_alpha,
            "symbol_ratio": sym_ratio,
            "n_stop": n_stop.astype("int64"),
            "keep": keep,
        })

    return ds.map_batches(fn, batch_format="pandas")


def stupid_backoff_xent(sf_dir: str, min_count: int = 30, alpha: float = 0.4,
                        num_buckets: int | None = None):
    """doc_id, n_bigrams, xent: per-doc cross-entropy (bits per token
    transition) under a corpus-trained bigram LM with Stupid Backoff
    (Brants et al. 2007, "Large Language Models in Machine
    Translation"): score(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})
    when the bigram survives the count prune (corpus count >=
    ``min_count`` — the standard trick that keeps a web-corpus n-gram
    table bounded), else ``alpha`` * c(w_i) / N.  The CCNet-style
    quality signal one notch above ``unigram_xent_docs``: word order
    now matters, so shuffled-token soup scores high even when its
    unigram distribution looks stereotypical.  xent is floor-scaled to
    1e4; docs with < 2 tokens emit 0/0.0.

    Scale shape: ONE tokenize scan emits a side-tagged compact
    intermediate — per-doc distinct-bigram rows (doc_id, key hashes, c,
    n_bg) plus per-batch unigram count partials — materialized once.
    The bigram LM table (``grouped_agg`` + count prune) and the unigram
    table are corpus-bounded and attach back via TWO
    ``_bucketed_attach`` hash-partitioned lookup joins (never a driver
    broadcast: unpruned web-scale tables are corpus-shaped), first on
    hash64(bigram) for the LM hit, then on hash64(left-or-right token)
    for the divisor/backoff count.  One doc-bucketed finish; N comes
    from per-batch partials (one tiny row per batch).  Text never
    crosses an exchange — only int64 hashes (hash64 ==
    md5_number_lower, the repo's oracle-recomputable idiom; the SQL
    oracle joins on the token strings themselves, identical modulo
    md5 collisions)."""
    import math
    from itertools import chain

    import pyarrow as pa

    from ._agg import grouped_agg
    from ._util import arrow_out, default_num_buckets, physical_partitions
    from .dedup import _bucketed_attach

    num_buckets = num_buckets or default_num_buckets()
    phys = physical_partitions(num_buckets)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    COMBINED = pa.schema([
        ("doc_id", pa.int64()), ("bh", pa.int64()), ("lh", pa.int64()),
        ("rh", pa.int64()), ("c", pa.int64()), ("n_bg", pa.int64()),
        ("side", pa.string()),
    ])

    def scan(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].fillna("").str.split()
        n = toks.str.len().to_numpy(dtype="int64")
        docids = df["doc_id"].to_numpy(dtype="int64")
        flat = list(chain.from_iterable(toks))
        uh = hash64_array(flat).view(np.int64)
        # unigram side: ONE partial count row per distinct token per
        # batch (combiner — the exchange ships vocab-, not corpus-,
        # sized rows)
        u = pd.DataFrame({"lh": uh}).groupby("lh", as_index=False, sort=False).agg(
            c=("lh", "size"))
        # bigram side: explode (l, r) adjacent pairs, aggregate per
        # (doc, bigram) in-batch
        nb = np.maximum(n - 1, 0)
        l_toks = list(chain.from_iterable(t[:-1] for t in toks))
        r_toks = list(chain.from_iterable(t[1:] for t in toks))
        b = pd.DataFrame({
            "doc_id": docids.repeat(nb),
            "bh": hash64_array(
                [lt + "\x1f" + rt for lt, rt in zip(l_toks, r_toks)]
            ).view(np.int64),
            "lh": hash64_array(l_toks).view(np.int64),
            "rh": hash64_array(r_toks).view(np.int64),
            "n_bg": nb.repeat(nb),
        })
        g = b.groupby(["doc_id", "bh"], as_index=False, sort=False).agg(
            lh=("lh", "first"), rh=("rh", "first"), c=("bh", "size"),
            n_bg=("n_bg", "first"))
        nu, ng = len(u), len(g)
        return pa.Table.from_arrays([
            pa.array(np.concatenate([np.full(nu, -1, dtype="int64"),
                                     g["doc_id"].to_numpy(dtype="int64")])),
            pa.array(np.concatenate([np.full(nu, -1, dtype="int64"),
                                     g["bh"].to_numpy(dtype="int64")])),
            pa.array(np.concatenate([u["lh"].to_numpy(dtype="int64"),
                                     g["lh"].to_numpy(dtype="int64")])),
            pa.array(np.concatenate([np.full(nu, -1, dtype="int64"),
                                     g["rh"].to_numpy(dtype="int64")])),
            pa.array(np.concatenate([u["c"].to_numpy(dtype="int64"),
                                     g["c"].to_numpy(dtype="int64")])),
            pa.array(np.concatenate([np.full(nu, -1, dtype="int64"),
                                     g["n_bg"].to_numpy(dtype="int64")])),
            pa.array(["u"] * nu + ["b"] * ng, pa.string()),
        ], schema=COMBINED)

    rows_m = ds.map_batches(scan, batch_format="pandas").materialize()

    def b_only(df: pd.DataFrame):
        return arrow_out(
            df[df["side"] == "b"][["doc_id", "bh", "lh", "rh", "c", "n_bg"]])

    # ONE count exchange for BOTH tables: the unigram and bigram counts
    # share a grouped_agg keyed (side, bh, lh) — same bh implies same
    # left token, so the composite key groups u-rows by token and
    # b-rows by bigram in one shuffle (each exchange costs ~1.5-2 s of
    # fixed aggregator wall, measured; two separate aggs also re-stream
    # the doc-sized intermediate twice).  The result is the
    # vocab+bigram-vocab-bounded count table: materialized because two
    # consumers (uc/lm) split it — bounded, so object-store-safe at any
    # corpus size (spills like any bounded side table).
    cnt_m = grouped_agg(
        rows_m.map_batches(
            lambda d: arrow_out(d[["side", "bh", "lh", "c"]]),
            batch_format="pandas"),
        ["side", "bh", "lh"], {"ct": ("c", "sum")}, num_partitions=num_buckets,
    ).map_batches(arrow_out, batch_format="pandas").materialize()

    # N = corpus token total off the BOUNDED count table (one tiny row
    # per batch; no second pass over the doc-sized rows)
    n_total = sum(
        int(b["partial"].sum()) for b in cnt_m.map_batches(
            lambda d: pd.DataFrame(
                {"partial": [int(d.loc[d["side"] == "u", "ct"].sum())]}),
            batch_format="pandas",
        ).iter_batches(batch_format="pandas")
    )

    uc_tbl = cnt_m.map_batches(
        lambda d: arrow_out(d.loc[d["side"] == "u", ["lh", "ct"]]),
        batch_format="pandas")
    lm_tbl = cnt_m.map_batches(
        lambda d: arrow_out(
            d.loc[(d["side"] == "b") & (d["ct"] >= min_count), ["bh", "ct"]]
            .rename(columns={"ct": "ctb"})),
        batch_format="pandas")

    att1 = _bucketed_attach(
        rows_m.map_batches(b_only, batch_format="pandas"), lm_tbl,
        key_col="bh", src_key="bh", src_val="ctb", out_col="ctb",
        num_buckets=num_buckets,
        pair_fill={"doc_id": -1, "lh": -1, "rh": -1, "c": -1, "n_bg": -1},
        val_type=pa.int64(),
    )

    def add_key2(df: pd.DataFrame) -> pa.Table:
        # LM hit rows need the LEFT unigram count (the divisor); misses
        # back off to the RIGHT token's unigram probability
        hit = df["ctb"].notna().to_numpy()
        return arrow_out(pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype="int64"),
            "c": df["c"].to_numpy(dtype="int64"),
            "n_bg": df["n_bg"].to_numpy(dtype="int64"),
            "ctb": df["ctb"].to_numpy(dtype="float64"),
            "key2": np.where(hit, df["lh"].to_numpy(dtype="int64"),
                             df["rh"].to_numpy(dtype="int64")),
        }))

    att2 = _bucketed_attach(
        att1.map_batches(add_key2, batch_format="pandas"), uc_tbl,
        key_col="key2", src_key="lh", src_val="ct", out_col="ct",
        num_buckets=num_buckets,
        pair_fill={"doc_id": -1, "c": -1, "n_bg": -1, "ctb": float("nan")},
        val_type=pa.int64(),
    )

    log2_n = math.log2(float(n_total)) if n_total else 0.0
    log2_a = math.log2(alpha)

    def add_dbkt(t: pa.Table) -> pa.Table:
        dd = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("__dbkt", pa.array((dd % num_buckets).astype("int32")))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        ctb = g["ctb"].to_numpy(dtype="float64")
        ct = g["ct"].to_numpy(dtype="float64")
        hit = ~np.isnan(ctb)
        lg = np.where(hit, np.log2(np.where(hit, ctb, 1.0)) - np.log2(ct),
                      log2_a + np.log2(ct) - log2_n)
        contrib = g["c"].to_numpy(dtype="float64") * lg
        agg = g.assign(contrib=contrib).groupby("doc_id", as_index=False,
                                                sort=False).agg(
            n_bigrams=("n_bg", "first"), s=("contrib", "sum"))
        xent = np.floor(-agg["s"].to_numpy() / agg["n_bigrams"].to_numpy()
                        * 10000) / 10000
        return pd.DataFrame({
            "doc_id": agg["doc_id"].to_numpy(dtype="int64"),
            "n_bigrams": agg["n_bigrams"].to_numpy(dtype="int64"),
            "xent": xent,
        })

    body = (
        att2.map_batches(add_dbkt, batch_format="pyarrow")
        .groupby("__dbkt", num_partitions=phys)
        .map_groups(finish, batch_format="pandas")
    )

    # docs with < 2 tokens have no bigram transition: union 0/0.0 rows
    def empties(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["text"].fillna("").str.split().str.len() < 2]
        return pd.DataFrame({
            "doc_id": d["doc_id"].to_numpy(dtype="int64"),
            "n_bigrams": np.zeros(len(d), dtype="int64"),
            "xent": np.zeros(len(d), dtype="float64"),
        })

    return body.union(ds.map_batches(empties, batch_format="pandas"))


def hashed_ngram_quality(sf_dir: str, num_feat: int = 2048):
    """doc_id, n_grams, score, keep: fastText-style linear quality
    classifier over hashed token-bigram features (Joulin et al. 2016,
    "Bag of Tricks for Efficient Text Classification" — the quality
    filter CCNet and the LLaMA data pipeline score documents with):
    ``score = mean over gram positions of w[hash64(gram) % num_feat]``
    and ``keep = score > 0``.  With no trained checkpoint available in
    this sandbox, the weight vector is derived DETERMINISTICALLY from
    the bucket index (a Knuth multiplicative hash mapped to [-1, 1)) so
    the whole operator — feature hashing, lookup, reduction, decision —
    is self-contained and fully SQL-checkable; a real model drops in by
    replacing ``_weights`` with a loaded vector (the dataflow is
    identical: the vector rides into each actor, never per batch).

    Scale shape: embarrassingly parallel — one pruned read, one
    map_batches, NO exchange; the gram kernel is the shared
    ``_gram_positions`` + ``hash64_array`` pair (same md5 idiom as
    ``decontaminate_docs`` / ``dsir_importance_weights``), the lookup +
    per-doc reduction is two ``np.bincount`` calls; the weight table is
    num_feat float64s computed once per actor in ``__init__``."""

    def _weights(n: int) -> np.ndarray:
        b = np.arange(n, dtype=np.int64)
        return ((b * 2654435761) % (2 * n)) / float(n) - 1.0

    class Score:
        def __init__(self):
            self.w = _weights(num_feat)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            n = len(df)
            doc_of, grams = _gram_positions(df, 2)
            if len(grams):
                bkt = (hash64_array(list(grams)) % np.uint64(num_feat)).astype("int64")
                s = np.bincount(doc_of, weights=self.w[bkt], minlength=n)
                n_grams = np.bincount(doc_of, minlength=n)
            else:
                s = np.zeros(n, dtype=np.float64)
                n_grams = np.zeros(n, dtype=np.int64)
            mean = np.divide(s, n_grams, out=np.zeros(n, dtype=np.float64),
                             where=n_grams > 0)
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(dtype="int64"),
                "n_grams": n_grams.astype("int64"),
                "score": np.floor(mean * 10000) / 10000,
                "keep": mean > 0.0,
            })

    return ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(Score, batch_format="pandas", concurrency=(1, 8))
