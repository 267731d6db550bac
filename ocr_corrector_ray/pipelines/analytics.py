"""General data-processing operators over the driver's testdata tables —
the SQL-checkable query surface (each has a DuckDB oracle in
__ray_entry__.oracle_sql).

Every function takes ``sf_dir`` and returns a (lazy) ``ray.data.Dataset``
whose column names/dtypes match the oracle exactly.  Implementations are
Ray-Data-idiomatic: column-pruned reads, vectorized ``map_batches``
kernels, ``groupby().aggregate`` for the wide steps, broadcast lookups for
small sides.  Float outputs are rounded on BOTH sides so value-hash
comparison is robust.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


def _p(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# ---------------------------------------------------------------------------
# documents: stats / tokens / quality / script / fingerprints / dedup
# ---------------------------------------------------------------------------

def doc_stats(sf_dir: str):
    """Per (lang, source): doc count, total chars, mean chars."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "source", "n_chars"])
    agg = ds.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
    )

    # avg derived from the exact integer sum/count with the floor-scale
    # trick, so the DuckDB oracle computes the bit-identical double
    def derive(df: pd.DataFrame) -> pd.DataFrame:
        avg = np.floor((df["sum_chars"].astype("float64") / df["n_docs"]) * 10000) / 10000
        return df.assign(avg_chars=avg)

    return agg.map_batches(derive, batch_format="pandas")


def _tokens(series: pd.Series) -> pd.Series:
    return series.fillna("").str.strip().str.split()


def token_counts(sf_dir: str):
    """doc_id, n_tokens (whitespace tokenization; empty text -> 0)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_tokens": _tokens(df["text"]).str.len().astype("int64")}
        )

    return ds.map_batches(fn, batch_format="pandas")


def quality_scores(sf_dir: str):
    """doc_id, n_tokens, stop_ratio (stopword-token ratio, round 4),
    is_quality (>=20 tokens and stop_ratio in [0.01, 0.6]) — classic
    cheap text-quality gates for training-data pipelines."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    stop = set(STOPWORDS)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(df["text"])
        n = toks.str.len().astype("int64")
        n_stop = toks.map(lambda ws: sum(1 for w in ws if w in stop)).astype("int64")
        # floor-scale instead of round: exact-int inputs -> the identical
        # IEEE expression on the SQL side (round() would diverge on exact
        # half values because numpy rounds half-to-even, DuckDB half-away)
        ratio = np.where(
            n > 0, np.floor((n_stop * 10000.0) / n.clip(lower=1)) / 10000, 0.0
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": n,
                "stop_ratio": ratio,
                "is_quality": (n >= 20) & (ratio >= 0.01) & (ratio <= 0.6),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def lang_script(sf_dir: str):
    """Docs per detected script class (CJK-bearing vs latin) — the
    SQL-expressible face of language identification."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def fn(batch: pa.Table) -> pa.Table:
        has_cjk = pc.match_substring_regex(batch.column("text"), "[一-龥]")
        script = pc.if_else(has_cjk, "cjk", "latin")
        return pa.table({"script": script})

    return ds.map_batches(fn, batch_format="pyarrow").groupby("script").aggregate(
        Count(alias_name="n_docs")
    )


def fingerprints(sf_dir: str):
    """doc_id, md5 hex digest of the text (exact content fingerprint)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        fp = df["text"].fillna("").map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
        return pd.DataFrame({"doc_id": df["doc_id"], "fingerprint": fp})

    return ds.map_batches(fn, batch_format="pandas")


def dedup_exact(sf_dir: str):
    """Exact dedup: one survivor (min doc_id) per distinct text.  Hash
    first (short fixed-size key) so the shuffle moves digests, not bodies."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def hash_fn(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text"].fillna("").map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
        return pd.DataFrame({"doc_id": df["doc_id"], "h": h})

    hashed = ds.map_batches(hash_fn, batch_format="pandas")
    kept = hashed.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))
    return kept.select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# embeddings: norms / brute-force ANN
# ---------------------------------------------------------------------------

def embedding_norms(sf_dir: str):
    """vec_id, l2_norm (double, round 6)."""
    ds = ray.data.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def fn(batch: dict) -> dict:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        return {"vec_id": batch["vec_id"], "l2_norm": np.sqrt((V * V).sum(axis=1)).round(6)}

    return ds.map_batches(fn, batch_format="numpy")


class _PartialTopK:
    """Per-batch brute-force cosine against a broadcast query matrix
    (``ray.put`` once, read in every task) — the baseline ANN path; each
    batch emits only its local top-k per query, so the shuffle that
    follows is k*Q rows per batch, not the full similarity matrix."""

    def __init__(self, qref, k: int):
        self.qids, self.Q = ray.get(qref)  # (q,), (q, d) float64, L2-normalised
        self.k = k

    def __call__(self, batch: dict) -> dict:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        vids = np.asarray(batch["vec_id"])
        sims = self.Q @ V.T  # (q, b)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qids)):
            s = sims[qi]
            mask = vids != self.qids[qi]  # exclude self
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            order = np.lexsort((vids[idx], -s[idx]))[: self.k]
            pick = idx[order]
            out_q.extend([self.qids[qi]] * len(pick))
            out_v.extend(vids[pick].tolist())
            out_s.extend(s[pick].tolist())
        return {
            "query_id": np.asarray(out_q, dtype=np.int64),
            "neighbor_id": np.asarray(out_v, dtype=np.int64),
            "cos_sim": np.asarray(out_s, dtype=np.float64),
        }


def ann_topk(sf_dir: str, k: int = 5, n_queries: int = 10):
    """Top-k cosine neighbours for the first ``n_queries`` vectors.
    Baseline = brute force (numpy matmul per batch vs broadcast queries);
    final merge is a tiny per-query group sort."""
    import pyarrow.parquet as pq

    path = _p(sf_dir, "embeddings")
    qt = pq.read_table(path, filters=[("vec_id", "<", n_queries)])
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qt.column("embedding").to_pylist()])
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = np.asarray(qt.column("vec_id").to_pylist(), dtype=np.int64)
    qref = ray.put((qids, Q))

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    partial = ds.map_batches(
        _PartialTopK,
        fn_constructor_kwargs={"qref": qref, "k": k},
        batch_format="numpy",
        batch_size=2048,
        concurrency=2,
    )

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True]).head(k)
        return df.assign(cos_sim=df["cos_sim"].round(6))

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# events: windowed aggregate / sessionization
# ---------------------------------------------------------------------------

def events_hourly(sf_dir: str):
    """Tumbling-window aggregate: per (event_type, hour): count + value sum."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "hour": df["ts"].dt.floor("h"), "value": df["value"]}
        )

    agg = ds.map_batches(bucket, batch_format="pandas").groupby(["event_type", "hour"]).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value")
    )
    return agg.map_batches(
        lambda df: df.assign(sum_value=df["sum_value"].round(4)), batch_format="pandas"
    )


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Per-user session count with a 30-min inactivity gap — the
    stream-shaped workload expressed as groupby(user).map_groups over
    ts-sorted events."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].sort_values()
        n_sessions = int(1 + (ts.diff() > gap).sum()) if len(ts) else 0
        return pd.DataFrame({"user_id": [df["user_id"].iloc[0]], "n_sessions": [n_sessions]})

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


# ---------------------------------------------------------------------------
# TPC-H-ish relational capability demos
# ---------------------------------------------------------------------------

def pricing_summary(sf_dir: str):
    """Q1-style grouped aggregate over lineitem with a vectorized derived
    column (revenue) computed at the batch level before the shuffle."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount"))
        )
        return batch.append_column("disc_price", disc)

    agg = ds.map_batches(derive, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Count(alias_name="count_order"),
    )

    # averages derived from the aggregated sums (same expression as the
    # oracle); big double sums rounded to 2 decimals (reorder-tolerant)
    def derive_final(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_qty"] = (df["sum_qty"] / df["count_order"]).round(4)
        df["avg_price"] = (df["sum_base_price"] / df["count_order"]).round(4)
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            df[c] = df[c].round(2)
        return df[
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
             "sum_disc_price", "avg_qty", "avg_price", "count_order"]
        ]

    return agg.map_batches(derive_final, batch_format="pandas")


def top_customers(sf_dir: str, n: int = 10):
    """Top-n customers by total order value; the customer dimension is a
    broadcast lookup (ray.put once), NOT a shuffle join."""
    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    totals = orders.groupby("o_custkey").aggregate(Sum("o_totalprice", alias_name="total_price"))

    import pyarrow.parquet as pq

    cust = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    name_ref = ray.put(dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_name").to_pylist())))

    def attach_name(df: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(name_ref)
        return pd.DataFrame(
            {
                "c_custkey": df["o_custkey"],
                "c_name": df["o_custkey"].map(names),
                "total_price": df["total_price"].round(2),
            }
        )

    named = totals.map_batches(attach_name, batch_format="pandas")
    return named.sort(["total_price", "c_custkey"], descending=[True, False]).limit(n)
