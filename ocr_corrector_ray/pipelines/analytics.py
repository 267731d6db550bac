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
from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


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


# ---------------------------------------------------------------------------
# documents: stats / tokens / quality / script / fingerprints / dedup
# ---------------------------------------------------------------------------

def doc_stats(sf_dir: str):
    """Per (lang, source): doc count, total chars, mean chars."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "source", "n_chars"])
    agg = grouped_agg(
        ds, ["lang", "source"],
        {"n_docs": ("n_chars", "size"), "sum_chars": ("n_chars", "sum")},
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
        # in-batch combiner: ≤2 partial rows per block cross the exchange.
        # null text coalesces to "" BEFORE classifying so every row keeps a
        # non-null script and the valid-only 'count' still counts it
        # (ADVICE r3: a null text row must not vanish from the totals)
        text = pc.fill_null(batch.column("text"), "")
        has_cjk = pc.match_substring_regex(text, "[一-龥]")
        script = pc.if_else(has_cjk, "cjk", "latin")
        g = pa.table({"script": script}).group_by("script").aggregate(
            [("script", "count")]
        )
        return g.rename_columns(["script", "n_docs"])

    return ds.map_batches(fn, batch_format="pyarrow").groupby("script").aggregate(
        Sum("n_docs", alias_name="n_docs")
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

    from ._agg import grouped_agg

    hashed = ds.map_batches(hash_fn, batch_format="pandas")
    kept = grouped_agg(hashed, ["h"], {"doc_id": ("doc_id", "min")})
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


def ivf_ann_topk(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 5,
):
    """IVF variant of ANN top-k — the scale path: vectors are assigned to
    coarse centroid lists (seeded k-means, a few Lloyd iterations on a
    sample, computed once and broadcast); each query scans only its
    ``n_probe`` nearest lists, so the per-batch work drops from O(all
    vectors) to O(probed share).  Approximate by construction (recall < 1
    is the contract; ``ann_topk`` is the exact baseline)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    path = _p(sf_dir, "embeddings")
    # driver touches only the query vectors (pushed-down filter) and a
    # bounded head sample for centroid training — never the full table
    # (at corpus scale centroid training is its own small job)
    qt = pq.read_table(path, columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", n_queries)])
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qt.column("embedding").to_pylist()])
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = np.asarray(qt.column("vec_id").to_pylist(), dtype=np.int64)

    st = pads.dataset(path).head(64 * n_lists, columns=["embedding"])
    sample = np.stack([np.asarray(v, dtype=np.float64) for v in st.column("embedding").to_pylist()])
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    n_lists = min(n_lists, len(sample))  # degenerate tiny-table guard
    rng = np.random.RandomState(seed)
    C = sample[rng.choice(len(sample), size=n_lists, replace=False)].copy()
    for _ in range(3):
        assign = (sample @ C.T).argmax(axis=1)
        for j in range(n_lists):
            members = sample[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / np.linalg.norm(c)
    probe_lists = np.argsort(-(Q @ C.T), axis=1)[:, : min(n_probe, n_lists)]  # (q, n_probe)
    side = ray.put((C, Q, qids, probe_lists))

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    class ProbedTopK:
        def __init__(self, ref, k):
            self.C, self.Q, self.qids, self.probe = ray.get(ref)
            self.k = k

        def __call__(self, batch: dict) -> dict:
            V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            vids = np.asarray(batch["vec_id"])
            lists = (V @ self.C.T).argmax(axis=1)  # (b,)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self.qids)):
                probe_mask = np.isin(lists, self.probe[qi]) & (vids != self.qids[qi])
                idx = np.nonzero(probe_mask)[0]
                if not len(idx):
                    continue
                s = V[idx] @ self.Q[qi]
                order = np.lexsort((vids[idx], -s))[: self.k]
                pick = idx[order]
                out_q.extend([self.qids[qi]] * len(pick))
                out_v.extend(vids[pick].tolist())
                out_s.extend(s[order].tolist())
            return {
                "query_id": np.asarray(out_q, dtype=np.int64),
                "neighbor_id": np.asarray(out_v, dtype=np.int64),
                "cos_sim": np.asarray(out_s, dtype=np.float64),
            }

    partial = ds.map_batches(
        ProbedTopK, fn_constructor_kwargs={"ref": side, "k": k},
        batch_format="numpy", batch_size=2048, concurrency=2,
    )

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True]).head(k)
        return df.assign(cos_sim=df["cos_sim"].round(6))

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5, seed: int = 3):
    """Lloyd's k-means over the embedding table as an ITERATIVE streaming
    job: every iteration is one ``map_batches`` pass emitting per-centroid
    partial sums/counts (the in-batch combiner), so driver traffic per
    iteration is k x (d+1) floats per block and the corpus never
    materializes.  Init = seeded pick from a bounded head sample (the
    ``ivf_ann_topk`` pattern).  Returns (vec_id, cluster) assignments
    from one final pass with the converged centroids broadcast."""
    import pyarrow.dataset as pads

    path = _p(sf_dir, "embeddings")
    st = pads.dataset(path).head(64 * k, columns=["embedding"])
    sample = np.stack([np.asarray(v, dtype=np.float64) for v in st.column("embedding").to_pylist()])
    rng = np.random.RandomState(seed)
    C = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)].copy()

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: dict) -> dict:
            Ci = ray.get(cref)
            V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
            d2 = ((V[:, None, :] - Ci[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            sums = np.zeros_like(Ci)
            np.add.at(sums, assign, V)
            counts = np.bincount(assign, minlength=len(Ci)).astype(np.float64)
            return {
                "cluster": np.arange(len(Ci), dtype=np.int32),
                "vsum": [row.tobytes() for row in sums],
                "count": counts,
            }

        parts = ds.map_batches(partial, batch_format="numpy").to_pandas()
        sums = np.zeros_like(C)
        counts = np.zeros(len(C))
        for cl, vs, ct in zip(parts["cluster"], parts["vsum"], parts["count"]):
            sums[cl] += np.frombuffer(vs, dtype=np.float64)
            counts[cl] += ct
        nonzero = counts > 0
        C[nonzero] = sums[nonzero] / counts[nonzero, None]

    cref = ray.put(C)

    def assign_final(batch: dict) -> dict:
        Ci = ray.get(cref)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        d2 = ((V[:, None, :] - Ci[None, :, :]) ** 2).sum(axis=2)
        return {
            "vec_id": batch["vec_id"],
            "cluster": d2.argmin(axis=1).astype(np.int32),
            "dist": np.sqrt(d2.min(axis=1)).round(6),
        }

    return ds.map_batches(assign_final, batch_format="numpy")


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

    from ._agg import grouped_agg

    from ._util import arrow_out

    agg = grouped_agg(
        ds.map_batches(bucket, batch_format="pandas"),
        ["event_type", "hour"],
        {"n_events": ("value", "size"), "sum_value": ("value", "sum")},
    )
    return agg.map_batches(
        lambda df: arrow_out(df.assign(sum_value=df["sum_value"].round(4))),
        batch_format="pandas",
    )


def events_sliding(sf_dir: str, window_min: int = 60, slide_min: int = 15):
    """Sliding-window aggregate (1h window, 15min slide): each event is
    fanned out to the windows covering it inside map_batches (no
    per-window state), then one groupby finishes the counts — the
    flat-map + groupby formulation of sliding windows."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])
    k_count = window_min // slide_min

    def fan_out_partial(df: pd.DataFrame) -> pd.DataFrame:
        """Fan out AND pre-aggregate inside the batch (the combiner): the
        global groupby then merges one row per (type, window) per batch
        instead of one per event-window pair."""
        base = df["ts"].dt.floor(f"{slide_min}min")
        frames = []
        for k in range(k_count):
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": df["event_type"],
                        "window_start": base - pd.Timedelta(minutes=slide_min * k),
                        "value": df["value"],
                    }
                )
            )
        fanned = pd.concat(frames, ignore_index=True)
        return fanned.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    from ._agg import grouped_agg

    from ._util import arrow_out

    agg = grouped_agg(
        ds.map_batches(fan_out_partial, batch_format="pandas"),
        ["event_type", "window_start"],
        {"n_events": ("n_events", "sum"), "sum_value": ("sum_value", "sum")},
    )
    return agg.map_batches(
        lambda df: arrow_out(df.assign(
            n_events=df["n_events"].astype("int64"), sum_value=df["sum_value"].round(4)
        )),
        batch_format="pandas",
    )


def sessionize(sf_dir: str, gap_minutes: int = 30, num_buckets: int | None = None):
    """Per-user session count with a 30-min inactivity gap.

    COARSE-bucketed (the ``_agg`` pattern): users are hashed into
    ``num_buckets`` partitions and each bucket computes ALL its users'
    session counts with one vectorized pandas ``groupby(user).diff()`` —
    a per-user ``map_groups`` would pay ~0.2 ms of Python per user
    (measured, ``_agg.py``), the dominant cost at corpus user counts."""
    from ._util import default_num_buckets

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    from ._util import arrow_out, physical_partitions

    def add_bucket(df: pd.DataFrame):
        return arrow_out(df.assign(bucket=(df["user_id"] % num_buckets).astype("int32")))

    def per_bucket(df: pd.DataFrame):
        df = df.sort_values(["user_id", "ts"])
        # a session starts at a user's first event or after a > gap lull;
        # diff() is NaT at each user's first row, so counting starts is
        # one vectorized pass over the whole bucket
        starts = df.groupby("user_id")["ts"].diff().pipe(lambda d: d.isna() | (d > gap))
        out = starts.groupby(df["user_id"]).sum().astype("int64")
        return arrow_out(
            pd.DataFrame({"user_id": out.index.to_numpy(), "n_sessions": out.to_numpy()})
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_bucket, batch_format="pandas")
    )


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

    def partial(batch: pa.Table) -> pa.Table:
        """In-batch combiner: vectorized derived column + Arrow grouped
        partial sums, so ≤ |groups| rows per block reach the exchange
        instead of every lineitem row (6 groups here; the final groupby
        merges block partials)."""
        disc = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount"))
        )
        batch = batch.append_column("disc_price", disc)
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns([
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "count_order",
        ])

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
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


def order_revenue(sf_dir: str, num_buckets: int | None = None):
    """Per-orderpriority revenue: orders ⋈ lineitem where BOTH sides are
    large — an explicit partitioned hash join: both sides get a
    ``bucket = orderkey % B`` column, the bucket groupby co-locates
    matching keys, the per-bucket pandas merge joins them, and a partial
    aggregate inside the bucket (the combiner) shrinks the final shuffle
    to B rows per priority.  B scales with the cluster (a literal bucket
    count sized for a laptop starves a 256-node exchange)."""
    import pyarrow as pa

    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])
    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    casts = {"priority": pa.string()}

    def tag_orders(df: pd.DataFrame):
        return arrow_out(pd.DataFrame(
            {
                "key": df["o_orderkey"],
                "bucket": (df["o_orderkey"] % num_buckets).astype("int32"),
                "priority": df["o_orderpriority"],
                "revenue": pd.Series([float("nan")] * len(df), dtype="float64"),
                "side": "o",
            }
        ), null_casts=casts)

    def tag_items(df: pd.DataFrame):
        return arrow_out(pd.DataFrame(
            {
                "key": df["l_orderkey"],
                "bucket": (df["l_orderkey"] % num_buckets).astype("int32"),
                "priority": pd.Series([None] * len(df), dtype="object"),
                "revenue": df["l_extendedprice"] * (1 - df["l_discount"]),
                "side": "l",
            }
        ), null_casts=casts)

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        items.map_batches(tag_items, batch_format="pandas")
    )

    def join_bucket(df: pd.DataFrame):
        o = df[df["side"] == "o"][["key", "priority"]]
        l = df[df["side"] == "l"][["key", "revenue"]]
        merged = l.merge(o, on="key", how="inner")
        part = merged.groupby("priority", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("key", "size")
        )
        return arrow_out(pd.DataFrame(
            {
                "o_orderpriority": part["priority"],
                "revenue": part["revenue"],
                "n_items": part["n_items"].astype("int64"),
            }
        ), null_casts={"o_orderpriority": pa.string()})

    partials = both.groupby("bucket", num_partitions=physical_partitions(num_buckets)).map_groups(
        join_bucket, batch_format="pandas"
    )
    final = partials.groupby("o_orderpriority").aggregate(
        Sum("revenue", alias_name="revenue"), Sum("n_items", alias_name="n_items")
    )
    return final.map_batches(
        lambda df: arrow_out(df.assign(revenue=df["revenue"].round(2))),
        batch_format="pandas",
    )


def purchase_prior_click(sf_dir: str, num_buckets: int | None = None):
    """As-of join: for every purchase event, the user's most recent
    STRICTLY-earlier click.  Both event streams are bucketed on user_id,
    the bucket groupby co-locates a user's events, and ``pd.merge_asof``
    (ts-sorted, by=user_id, strict) does the as-of matching per bucket.
    Bucket count scales with the cluster (see order_revenue)."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def bucketize(df: pd.DataFrame):
        df = df[df["event_type"].isin(["purchase", "click"])].copy()
        df["bucket"] = (df["user_id"] % num_buckets).astype("int32")
        return arrow_out(df)

    def asof_bucket(df: pd.DataFrame):
        p = df[df["event_type"] == "purchase"].sort_values("ts")
        c = df[df["event_type"] == "click"].sort_values("ts")
        merged = pd.merge_asof(
            p,
            c[["user_id", "ts"]].rename(columns={"ts": "prior_click_ts"}),
            left_on="ts",
            right_on="prior_click_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        return arrow_out(pd.DataFrame(
            {"event_id": merged["event_id"], "prior_click_ts": merged["prior_click_ts"]}
        ))

    return ds.map_batches(bucketize, batch_format="pandas").groupby(
        "bucket", num_partitions=physical_partitions(num_buckets)
    ).map_groups(asof_bucket, batch_format="pandas")


def part_type_stats(sf_dir: str):
    """Per part type-prefix (first word of p_type): count, total and max
    retail price — column-pruned read + vectorized derive + grouped agg."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "part"), columns=["p_type", "p_retailprice"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "type_prefix": df["p_type"].str.split(" ").str[0],
                "p_retailprice": df["p_retailprice"],
            }
        )

    agg = grouped_agg(
        ds.map_batches(derive, batch_format="pandas"),
        ["type_prefix"],
        {
            "n_parts": ("p_retailprice", "size"),
            "sum_price": ("p_retailprice", "sum"),
            "max_price": ("p_retailprice", "max"),
        },
    )
    return agg.map_batches(
        lambda df: df.assign(
            sum_price=df["sum_price"].round(2), max_price=df["max_price"].round(2)
        ),
        batch_format="pandas",
    )


def top_user_per_event_type(sf_dir: str):
    """For each event_type, the user with the highest summed value (ties
    broken by user_id) — the window-function shape done as grouped
    partials + a per-group argmax."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id", "value"])
    totals = grouped_agg(
        ds, ["event_type", "user_id"], {"total_value": ("value", "sum")}
    )

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(total_value=df["total_value"].round(4))
        df = df.sort_values(["total_value", "user_id"], ascending=[False, True])
        return df.head(1)

    return totals.groupby("event_type").map_groups(argmax, batch_format="pandas")


def lang_quantile_chars(sf_dir: str):
    """Per-lang EXACT doc-length quantiles (p50/p90, discrete semantics:
    the 1-based ceil(n*q)-th sorted element, = DuckDB/Postgres
    quantile_disc) computed scalably via a HISTOGRAM: n_chars is
    a bounded int, so a coarse grouped count per (lang, n_chars) shrinks
    the data to |langs| x |distinct lengths| rows, and the quantile is
    read off the cumulative histogram — no group ever materializes its
    raw values (the naive per-group sort would pull a whole language's
    corpus into one task at 100 TB)."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "n_chars"])
    hist = grouped_agg(ds, ["lang", "n_chars"], {"cnt": ("n_chars", "size")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("n_chars")
        cum = df["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = df["n_chars"].to_numpy()

        def disc(q: float) -> int:
            pos = int(np.ceil(n * q))  # 1-based rank, quantile_disc semantics
            return int(vals[np.searchsorted(cum, pos)])

        return pd.DataFrame(
            {"lang": [df["lang"].iloc[0]], "n_docs": [n],
             "p50_chars": [disc(0.5)], "p90_chars": [disc(0.9)]}
        )

    # the histogram is tiny (|langs| x |lengths|); per-lang finish is cheap
    return hist.groupby("lang").map_groups(finish, batch_format="pandas")


def stratified_sample(sf_dir: str, per_stratum: int = 20):
    """Deterministic stratified sample: the ``per_stratum`` docs with the
    smallest md5(doc_id) per lang — reproducible eval splits with equal
    representation per stratum.  Strata hash into a coarse groupby; each
    stratum keeps a vectorized nsmallest, so the exchange carries only
    (lang, doc_id, digest) triples and the result is engine-independent
    (the oracle ranks by the identical digest in SQL)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang"])

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(lambda d: hashlib.md5(str(d).encode()).hexdigest())
        # in-batch combiner: only each batch's local top candidates per
        # stratum survive to the shuffle
        out = df.assign(h=h).sort_values("h")
        return out.groupby("lang", group_keys=False).head(per_stratum)

    def per_lang(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.sort_values("h").head(per_stratum)
        return pd.DataFrame({"lang": keep["lang"], "doc_id": keep["doc_id"]})

    return (
        ds.map_batches(digest, batch_format="pandas")
        .groupby("lang")
        .map_groups(per_lang, batch_format="pandas")
    )


def part_type_revenue(sf_dir: str):
    """Fact x dimension broadcast join: lineitem revenue per part
    type-prefix.  The part table is the SMALL side — read once on the
    driver (pruned to two columns), shipped via ray.put, and probed
    inside map_batches; only the pre-aggregated (prefix, partial sum)
    rows reach the final groupby.  The fact table is never shuffled on
    the join key."""
    import pyarrow.parquet as pq

    pt = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey", "p_type"])
    prefix = {
        k: t.split(" ")[0]
        for k, t in zip(pt.column("p_partkey").to_pylist(), pt.column("p_type").to_pylist())
    }
    pref_ref = ray.put(prefix)

    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_partkey", "l_extendedprice", "l_discount"]
    )

    class Probe:
        def __init__(self, ref):
            self.prefix = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rev = df["l_extendedprice"] * (1 - df["l_discount"])
            pfx = df["l_partkey"].map(self.prefix)
            part = pd.DataFrame({"type_prefix": pfx, "revenue": rev}).groupby(
                "type_prefix", as_index=False
            ).agg(revenue=("revenue", "sum"), n_items=("revenue", "size"))
            return part

    from ._agg import grouped_agg

    partials = items.map_batches(Probe, fn_constructor_kwargs={"ref": pref_ref},
                                 batch_format="pandas", concurrency=2)
    final = grouped_agg(partials, ["type_prefix"],
                        {"revenue": ("revenue", "sum"), "n_items": ("n_items", "sum")})
    return final.map_batches(
        lambda df: df.assign(revenue=df["revenue"].round(2),
                             n_items=df["n_items"].astype("int64")),
        batch_format="pandas",
    )


def doc_sample(sf_dir: str, hex_prefix_below: str = "10"):
    """Deterministic hash sample (~|prefix|/256 of the corpus): keep docs
    whose md5(doc_id) hex digest sorts below the threshold prefix.
    Stateless, seedless, reproducible across engines — the oracle runs
    the identical predicate in SQL.  The sampling pattern every
    training-data pipeline needs for eval splits / debugging slices."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(lambda d: hashlib.md5(str(d).encode()).hexdigest())
        return df[h < hex_prefix_below]

    return ds.map_batches(pick, batch_format="pandas")


def train_split_stats(sf_dir: str, bounds: tuple[str, str] = ("e6", "f3")):
    """Deterministic train/valid/test split assignment + per-split corpus
    stats — the split step every training-data pipeline runs before
    sharding.  The split is a pure function of md5(doc_id) (seedless,
    engine-independent, stable under re-runs / resharding / late-arriving
    docs): hex digests distribute uniformly, so prefix thresholds 'e6'/'f3'
    give ~90/5/5.  The per-doc assignment never leaves the workers — each
    batch pre-aggregates to ≤3 partial rows, so the exchange carries
    O(batches) rows regardless of corpus size; a shard writer would instead
    keep the `split` column and `write_parquet(partition_cols=["split"])`."""
    from ._agg import grouped_agg

    lo, hi = bounds
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(lambda d: hashlib.md5(str(d).encode()).hexdigest())
        split = np.where(h < lo, "train", np.where(h < hi, "valid", "test"))
        return pd.DataFrame({"split": split, "n_chars": df["n_chars"].to_numpy()})

    assigned = ds.map_batches(assign, batch_format="pandas")
    return grouped_agg(
        assigned, ["split"],
        {"n_docs": ("n_chars", "size"), "total_chars": ("n_chars", "sum")},
    )


def user_running_value(sf_dir: str, num_buckets: int | None = None):
    """Running (cumulative) per-user value sum ordered by (ts, event_id) —
    the window-function `SUM() OVER (PARTITION BY user ORDER BY ts)`
    shape.  Coarse-bucketed: users hash into buckets, each bucket does ONE
    vectorized sort + groupby(user).cumsum over all its users — no
    per-user Python, no global sort."""
    from ._util import default_num_buckets

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    from ._util import arrow_out, physical_partitions

    def add_bucket(df: pd.DataFrame):
        return arrow_out(df.assign(bucket=(df["user_id"] % num_buckets).astype("int32")))

    def per_bucket(df: pd.DataFrame):
        df = df.sort_values(["user_id", "ts", "event_id"])
        run = df.groupby("user_id")["value"].cumsum()
        return arrow_out(
            pd.DataFrame({"event_id": df["event_id"], "running_value": run.round(4)})
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_bucket, batch_format="pandas")
    )


def ngram_topk(sf_dir: str, n: int = 3, k: int = 20, num_buckets: int | None = None):
    """Top-k token n-grams by corpus count (training-data vocabulary/
    boilerplate analysis).  In-batch partial counting (the combiner)
    shrinks the exchange to one row per distinct ngram per batch; the
    merge is a coarse-bucket grouped sum; the final top-k sort runs over
    the (tiny) per-bucket winners."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for toks in _tokens(df["text"]):
            for i in range(len(toks) - n + 1):
                c[" ".join(toks[i : i + n])] += 1
        return pd.DataFrame(
            {"ngram": list(c.keys()),
             "n": pd.Series(list(c.values()), dtype="int64")}
        )

    totals = grouped_agg(
        ds.map_batches(partial_counts, batch_format="pandas"),
        ["ngram"], {"n": ("n", "sum")},
        # distributed top-k: each ngram's total lives wholly in its hash
        # partition, so per-partition head(k) is an exact pre-filter and
        # the global sort below only sees ≤ P·k rows — never the full
        # distinct-ngram table (billions of rows at corpus scale)
        finish_fn=lambda g: g.sort_values(
            ["n", "ngram"], ascending=[False, True]
        ).head(k),
    )
    return totals.sort(["n", "ngram"], descending=[True, False]).limit(k)


def event_type_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event_type as two coarse-partition
    aggregations: dedup (event_type, user) pairs first (in-batch
    drop_duplicates is the combiner), then count survivors per type —
    the shuffle carries distinct pairs, never raw events."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id"])

    def in_batch_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["event_type", "user_id"])

    pairs = grouped_agg(
        ds.map_batches(in_batch_dedup, batch_format="pandas"),
        ["event_type", "user_id"], {"c": ("user_id", "size")},
    )
    counts = grouped_agg(pairs, ["event_type"], {"n_users": ("user_id", "size")})
    return counts


def customers_without_orders(sf_dir: str, num_buckets: int | None = None,
                             priority: str = "1-URGENT"):
    """Anti-join: customers that placed NO order of the given priority —
    both sides bucket on custkey, each bucket drops customers present in
    its order-key set.  The priority predicate is PUSHED DOWN into the
    parquet read (row-group pruning) and the in-batch distinct of
    o_custkey is the combiner, so the exchange carries distinct keys of
    the filtered side only, never raw order rows."""
    return _customer_order_membership(sf_dir, num_buckets, priority, keep_present=False)


def customers_with_orders(sf_dir: str, num_buckets: int | None = None,
                          priority: str = "1-URGENT"):
    """Semi-join: customers that placed AT LEAST ONE order of the given
    priority — the dual of ``customers_without_orders`` and the same
    bucketed key-membership exchange (completing the join family:
    inner / broadcast / as-of / anti / semi)."""
    return _customer_order_membership(sf_dir, num_buckets, priority, keep_present=True)


def _customer_order_membership(sf_dir: str, num_buckets: int | None,
                               priority: str, keep_present: bool):
    import pyarrow as pa

    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    cust = ray.data.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey"],
        filter=(pc.field("o_orderpriority") == priority),
    )

    def tag_cust(df: pd.DataFrame):
        keys = df["c_custkey"].to_numpy()
        return arrow_out(pd.DataFrame(
            {"key": keys, "name": df["c_name"].to_numpy(), "side": "c",
             "bucket": (keys % num_buckets).astype("int32")}
        ), null_casts={"name": pa.string()})

    def tag_orders(df: pd.DataFrame):
        # .to_numpy() before building the frame: a dict-of-Series
        # constructor would ALIGN drop_duplicates' sparse index against
        # fresh range indexes (NaN keys, float64 casts — and divergent
        # block schemas split hash-shuffle groups).  Both sides emit the
        # identical non-null schema on purpose.
        keys = df["o_custkey"].drop_duplicates().to_numpy()
        return arrow_out(pd.DataFrame(
            {"key": keys, "name": [""] * len(keys), "side": "o",
             "bucket": (keys % num_buckets).astype("int32")}
        ), null_casts={"name": pa.string()})

    both = cust.map_batches(tag_cust, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def membership(df: pd.DataFrame):
        have = set(df.loc[df["side"] == "o", "key"].tolist())
        c = df[df["side"] == "c"]
        mask = c["key"].isin(have)
        keep = c[mask if keep_present else ~mask]
        return arrow_out(pd.DataFrame(
            {"c_custkey": keep["key"].astype("int64"), "c_name": keep["name"]}
        ), null_casts={"c_name": pa.string()})

    return both.groupby("bucket", num_partitions=physical_partitions(num_buckets)).map_groups(
        membership, batch_format="pandas"
    )


def top_customers(sf_dir: str, n: int = 10):
    """Top-n customers by total order value; the customer dimension is a
    broadcast lookup (ray.put once), NOT a shuffle join."""
    from ._agg import grouped_agg

    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    totals = grouped_agg(orders, ["o_custkey"], {"total_price": ("o_totalprice", "sum")})

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


# ---------------------------------------------------------------------------
# extraction-kernel conformance (verdict r3 #8): the flagship's extraction
# stage is deterministic string surgery, so its kernels CAN be value-hash
# checked against DuckDB — wrap documents.text with deterministic layout /
# markup artifacts, run the REAL functions.extract kernels on the Ray side,
# and mirror the wrap + the kernel's rule chain in SQL (__ray_entry__).
# The reference has no extraction stage (its inputs are pre-extracted OCR
# lines); this stage is the north-rule tier-extraction addition.
# ---------------------------------------------------------------------------

# HTML artifact wrap: boilerplate containers that must be dropped wholesale
# (head+script, nav, footer), a content paragraph, and a link-dense line
# that the link-density rule must reject.  No single quotes — these strings
# are embedded verbatim in the DuckDB oracle SQL.
HTML_WRAP_PRE = (
    '<html><head><title>t</title><script>var x=1;</script></head><body>'
    '<nav><a href="/">home</a> <a href="/a">archive</a></nav><p>'
)
HTML_WRAP_POST = (
    '</p><div><a href="/more">read more documentation and related links here</a> ok</div>'
    '<footer>&amp;copy 2026 &nbsp;corp</footer></body></html>'
)

_PDF_BREAK_RE = None  # compiled lazily so `import analytics` stays cheap


def _wrap_pdf(s: str) -> str:
    """Deterministic PDF layout artifacts: doubled spaces (space-run
    collapse), a hyphenated line break every 40 chars (dehyphenation), a
    form feed after every 'e' (page-break removal)."""
    global _PDF_BREAK_RE
    if _PDF_BREAK_RE is None:
        import re

        _PDF_BREAK_RE = re.compile(r"(.{40})")
    w = (s or "").replace(" ", "  ")
    w = _PDF_BREAK_RE.sub(lambda m: m.group(1) + "-\n", w)
    return w.replace("e", "e\f")


def extract_pdf_kernel(sf_dir: str):
    """Run the real ``extract_pdf`` kernel over artifact-wrapped
    documents.text (see functions/extract.py:91-95; kernel also exercised
    by the flagship ``ocr_extract``)."""
    from ..functions.extract import extract_pdf

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def kernel(batch: pa.Table) -> pa.Table:
        out = [extract_pdf(_wrap_pdf(s)) for s in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"), "text": pa.array(out, pa.string())})

    return ds.map_batches(kernel, batch_format="pyarrow")


def extract_html_kernel(sf_dir: str):
    """Run the real ``extract_html`` kernel (boilerplate drop, block
    segmentation, link-density line filter — functions/extract.py:54-84)
    over documents.text wrapped in a deterministic page skeleton."""
    from ..functions.extract import extract_html

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def kernel(batch: pa.Table) -> pa.Table:
        out = [
            extract_html(HTML_WRAP_PRE + (s or "") + HTML_WRAP_POST)
            for s in batch.column("text").to_pylist()
        ]
        return pa.table({"doc_id": batch.column("doc_id"), "text": pa.array(out, pa.string())})

    return ds.map_batches(kernel, batch_format="pyarrow")


def range_join_value_bands(
    sf_dir: str,
    band_width: float = 25.0,
    band_span: float = 37.5,
    n_bands: int = 20,
):
    """Range (interval) join: each event joins every OVERLAPPING value
    band ``[k*w, k*w + span)`` it falls in (span = 1.5w, so a value can
    match two bands — a genuine interval join, not a bucketing), then
    per-band aggregates.

    Ray-Data-first plan: the interval side here is SMALL and static, so
    it is never shuffled at all — each batch computes its candidate band
    ids VECTORIZED (a value can only fall in the ``ceil(span/w)``
    consecutive bands ending at ``floor(v/w)``, so candidate generation
    is two numpy ops, not an interval scan), bound-checks them, and
    partially aggregates in-batch; the exchange carries at most
    ``n_bands`` rows per batch.  For a LARGE interval side the same
    kernel becomes a coarse-bucket co-partition: hash intervals to every
    ``floor(lo/w)..floor(hi/w)`` bucket they overlap and events to
    ``floor(v/w)``, then run this in-bucket candidate check per bucket —
    the replication factor is span/w, bounded by construction."""
    from ._agg import grouped_agg

    w, span = float(band_width), float(band_span)
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype="float64")
        k0 = np.floor(v / w).astype("int64")
        # candidates: k0 and k0-1 (span < 2w means no value reaches k0-2)
        cand_k = np.concatenate([k0, k0 - 1])
        cand_v = np.concatenate([v, v])
        lo = cand_k * w
        keep = (cand_v >= lo) & (cand_v < lo + span) & (cand_k >= 0) & (cand_k < n_bands)
        ck, cv = cand_k[keep], cand_v[keep]
        agg = pd.DataFrame({"band_id": ck, "value": cv}).groupby(
            "band_id", as_index=False
        ).agg(n_events=("value", "size"), sum_value=("value", "sum"))
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            lo=g["band_id"] * w,
            hi=g["band_id"] * w + span,
            sum_value=g["sum_value"].round(2),
        )
        return g[["band_id", "lo", "hi", "n_events", "sum_value"]]

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["band_id"],
        {"n_events": ("n_events", "sum"), "sum_value": ("sum_value", "sum")},
        finish_fn=finish,
    )


def keep_latest_events(sf_dir: str, num_buckets: int | None = None):
    """Keep-latest compaction (upsert semantics): one surviving row per
    (user_id, event_type) — the latest by ``ts``, ties broken by the
    larger ``event_id``.  The canonical 100-TB "collapse an append log to
    current state" operator (latest crawl of a URL, newest version of a
    document).

    In-batch combiner first: each batch keeps only ITS latest row per
    key, so the exchange carries at most |distinct keys| rows per batch
    regardless of log length; survivors co-locate by key hash into a
    coarse bucket (per-bucket memory = |keys|/P, decoupled physical
    partition count) and one vectorized sort+drop_duplicates per bucket
    finishes — per-key work never leaves C."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    cols = ["user_id", "event_type", "event_id", "ts", "value"]
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=cols)

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        # na_position="first": a null ts must never win over a real one
        # (SQL ORDER BY ts DESC puts NULLS LAST; pandas would otherwise
        # sort NaT last and keep="last" would crown the NaT row)
        df = df.sort_values(["ts", "event_id"], na_position="first")
        return df.drop_duplicates(["user_id", "event_type"], keep="last")

    def add_bucket(df: pd.DataFrame):
        df = latest(df)  # combiner: local keep-latest before the exchange
        h = pd.util.hash_pandas_object(df[["user_id", "event_type"]], index=False)
        return arrow_out(df.assign(bucket=(h % num_buckets).astype("int32")))

    def per_bucket(df: pd.DataFrame):
        return arrow_out(latest(df)[cols])

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_bucket, batch_format="pandas")
    )


def domain_quota_docs(sf_dir: str, k: int = 10):
    """Per-domain quota capping: keep at most ``k`` documents per
    ``source``, preferring longer docs (``n_chars`` DESC, ``doc_id`` ASC
    ties) — the "don't let one crawl domain dominate the training mix"
    operator in LLM data curation.

    Scale shape: an in-batch combiner keeps each batch's local top-k per
    source first, so the exchange carries at most k rows per (batch,
    source) no matter how skewed a domain is; survivors co-locate by
    hash(source) into coarse buckets (per-bucket memory ≤ |sources|·k/P)
    and one vectorized sort + groupby-head per bucket finishes.  The
    doc text never crosses the exchange — only (doc_id, source,
    n_chars)."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = default_num_buckets()
    cols = ["doc_id", "source", "n_chars"]
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=cols)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                            kind="mergesort")
        return df.groupby("source", as_index=False, sort=False).head(k)

    def add_bucket(df: pd.DataFrame):
        df = topk(df)  # combiner: local quota before the exchange
        h = pd.util.hash_pandas_object(df["source"], index=False)
        return arrow_out(df.assign(bucket=(h % num_buckets).astype("int32")))

    def per_bucket(df: pd.DataFrame):
        return arrow_out(topk(df)[cols])

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_bucket, batch_format="pandas")
    )


def quality_percentile_docs(sf_dir: str, q: float = 0.9):
    """Two-pass global-statistic filter: keep documents at or above
    their language's ``q``-th length percentile (quantile_disc
    semantics, exact via the same cumulative-histogram trick as
    lang_quantile_chars) — the canonical "filter by a corpus-level
    threshold you don't know until you've seen the corpus" shape
    (quality-score cutoffs, perplexity bands).

    Pass 1 reduces to a |langs| x |distinct lengths| histogram and reads
    the thresholds off it (driver table is histogram-sized, never
    corpus-sized); pass 2 re-streams the corpus and applies the
    broadcast thresholds batch-locally.  No full-corpus sort — the
    naive per-group quantile would pull a whole language's lengths into
    one task."""
    from ._agg import grouped_agg

    cols = ["doc_id", "lang", "n_chars"]
    hist = grouped_agg(
        ray.data.read_parquet(_p(sf_dir, "documents"), columns=["lang", "n_chars"]),
        ["lang", "n_chars"], {"cnt": ("n_chars", "size")},
    )

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("n_chars")
        cum = df["cnt"].cumsum().to_numpy()
        pos = int(np.ceil(int(cum[-1]) * q))  # 1-based quantile_disc rank
        cut = int(df["n_chars"].to_numpy()[np.searchsorted(cum, pos)])
        return pd.DataFrame({"lang": [df["lang"].iloc[0]], "cut": [cut]})

    cuts = {
        r["lang"]: r["cut"]
        for r in hist.groupby("lang")
        .map_groups(thresh, batch_format="pandas")
        .take_all()
    }

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_chars"] >= df["lang"].map(cuts).to_numpy()]

    return ray.data.read_parquet(_p(sf_dir, "documents"), columns=cols).map_batches(
        keep, batch_format="pandas"
    )


def events_rollup(sf_dir: str):
    """ROLLUP aggregate: value sums at three grains — (event_type, hour
    of day), (event_type), grand total — in ONE corpus pass.  The
    fine-grain histogram is bounded (|types| x 24), so the coarser
    levels re-aggregate that histogram, not the corpus; rollup columns
    use sentinel NULLs exactly like SQL ROLLUP.

    At 100 TB only the first grouped_agg touches data (with in-batch
    combiners); everything after runs over ≤ a few hundred rows."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "hour": df["ts"].dt.hour.astype("int64"),
            "value": df["value"],
        })

    fine = grouped_agg(
        ds.map_batches(add_hour, batch_format="pandas"),
        ["event_type", "hour"],
        {"n_events": ("value", "size"), "sum_value": ("value", "sum")},
    )

    def levels(df: pd.DataFrame) -> pd.DataFrame:
        # histogram-sized input: emit all three rollup grains from it;
        # rollup positions use SENTINELS ('ALL'/-1) rather than typed
        # NULLs so the int64/varchar schema is identical at every grain
        by_type = df.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        by_type["hour"] = np.int64(-1)
        total = pd.DataFrame({
            "event_type": ["ALL"], "hour": np.array([-1], dtype="int64"),
            "n_events": [df["n_events"].sum()],
            "sum_value": [df["sum_value"].sum()],
        })
        out = pd.concat([df, by_type, total], ignore_index=True)
        out["sum_value"] = out["sum_value"].round(2)
        out["n_events"] = out["n_events"].astype("int64")
        return out[["event_type", "hour", "n_events", "sum_value"]]

    # one partition holds the whole (tiny) histogram for the upper grains
    return fine.repartition(1).map_batches(
        levels, batch_format="pandas", batch_size=None
    )


def event_type_pivot(sf_dir: str, types: Sequence[str] | None = None):
    """Pivot the event log into one wide row per user: a column of
    summed value per event type (the 'long → wide feature table' step
    before model training).

    ONE corpus scan: each batch combines to long-form partials
    (user_id, event_type, psum) — bounded by |users in batch| x |types|,
    never the log — which are materialized once.  The type set is then
    derived from the PARTIALS (output-sized, not a second corpus pass)
    unless ``types`` pins it; a pinned list is asserted against the data
    so a new event type raises instead of silently dropping rows.  The
    wide finish is a grouped_agg over user_id on the partials."""
    from ._agg import grouped_agg
    from ._util import arrow_out

    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "value"])
    pinned = sorted(types) if types is not None else None

    def partial(df: pd.DataFrame):
        if pinned is not None:
            unknown = df.loc[~df["event_type"].isin(pinned), "event_type"]
            if len(unknown):
                raise ValueError(
                    f"event_type_pivot: event types {sorted(set(unknown))} "
                    f"not in the pinned list {pinned}"
                )
        g = df.groupby(["user_id", "event_type"], as_index=False)["value"].sum()
        return arrow_out(g.rename(columns={"value": "psum"}))

    partials = ds.map_batches(partial, batch_format="pandas")
    if pinned is None:
        # the corpus was already reduced to partials; this distinct runs
        # over the (bounded) materialized partials, not the event log
        partials = partials.materialize()
        tcol = partials.select_columns(["event_type"]).unique("event_type")
        type_list = sorted(tcol)
    else:
        type_list = pinned

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        p = df.pivot_table(index="user_id", columns="event_type",
                           values="psum", aggfunc="sum", fill_value=0.0)
        p = p.reindex(columns=type_list, fill_value=0.0)
        p.columns = [f"sum_{t}" for t in p.columns]
        return p.reset_index()

    aggs = {f"sum_{t}": (f"sum_{t}", "sum") for t in type_list}

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        for t in type_list:
            g[f"sum_{t}"] = g[f"sum_{t}"].round(2)
        return g

    return grouped_agg(
        partials.map_batches(widen, batch_format="pandas"),
        ["user_id"], aggs, finish_fn=finish,
    )


def user_value_delta(sf_dir: str, num_buckets: int | None = None):
    """LAG window: each event's value minus the same user's previous
    event value (ordered by ts, event_id); a user's first event has
    delta NULL — `value - LAG(value) OVER (PARTITION BY user ORDER BY
    ts)`.  Same coarse-bucket shape as user_running_value: users hash
    into buckets, ONE vectorized sort + groupby shift per bucket."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def add_bucket(df: pd.DataFrame):
        return arrow_out(df.assign(bucket=(df["user_id"] % num_buckets).astype("int32")))

    def per_bucket(df: pd.DataFrame):
        df = df.sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id")["value"].shift(1)
        return arrow_out(
            pd.DataFrame({
                "event_id": df["event_id"],
                "delta": (df["value"] - prev).round(4),
            })
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_bucket, batch_format="pandas")
    )


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-01-01", k: int = 10,
                      num_buckets: int | None = None):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with predicates on
    all three tables, per-order revenue, global top-k.  The join
    strategy is tiered by side size: the filtered customer-key set is
    the SMALL side (broadcast once via ray.put, probed with a sorted
    np.isin per orders batch — no customer shuffle); orders ⋈ lineitem
    are BOTH large, so they take the union-tag partitioned hash join on
    orderkey.  Each order lives wholly in one bucket, so the per-bucket
    revenue groupby + head(k) is an EXACT global-top-k prefilter: the
    final sort sees ≤ P·k rows."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    cut = pd.Timestamp(cutoff)

    cust = ray.data.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = []
    for b in cust.map_batches(
        lambda df: pd.DataFrame(
            {"k": df.loc[df["c_mktsegment"] == segment, "c_custkey"]}
        ),
        batch_format="pandas",
    ).iter_batches(batch_format="pandas"):
        keys.append(b["k"].to_numpy(dtype="int64"))
    ckeys = np.sort(np.concatenate(keys)) if keys else np.empty(0, "int64")
    ckeys_ref = ray.put(ckeys)

    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    class TagOrders:
        def __init__(self, ref):
            self.ckeys = ray.get(ref)  # sorted custkey vector, probed in C

        def __call__(self, df: pd.DataFrame):
            m = (df["o_orderdate"] < cut) & np.isin(
                df["o_custkey"].to_numpy(dtype="int64"), self.ckeys,
                assume_unique=False,
            )
            df = df[m].reset_index(drop=True)
            return arrow_out(pd.DataFrame({
                "key": df["o_orderkey"],
                "bucket": (df["o_orderkey"] % num_buckets).astype("int32"),
                "o_orderdate": df["o_orderdate"],
                "o_orderpriority": df["o_orderpriority"],
                "revenue": np.nan,
                "side": "o",
            }), null_casts={"o_orderpriority": pa.string()})

    def tag_items(df: pd.DataFrame):
        # reset_index: the fresh NaT/None fill series below carry a
        # RangeIndex; building the frame from the filtered (gappy) index
        # would align on the index UNION and inject NaN join keys
        df = df[df["l_shipdate"] > cut].reset_index(drop=True)
        return arrow_out(pd.DataFrame({
            "key": df["l_orderkey"],
            "bucket": (df["l_orderkey"] % num_buckets).astype("int32"),
            "o_orderdate": pd.Series([pd.NaT] * len(df), dtype="datetime64[us]"),
            "o_orderpriority": pd.Series([None] * len(df), dtype="object"),
            "revenue": df["l_extendedprice"] * (1 - df["l_discount"]),
            "side": "l",
        }), null_casts={"o_orderpriority": pa.string()})

    both = orders.map_batches(
        TagOrders, fn_constructor_kwargs={"ref": ckeys_ref},
        batch_format="pandas", concurrency=(1, 4),
    ).union(items.map_batches(tag_items, batch_format="pandas"))

    def join_bucket(df: pd.DataFrame):
        o = df[df["side"] == "o"][["key", "o_orderdate", "o_orderpriority"]]
        l = df[df["side"] == "l"][["key", "revenue"]]
        merged = l.merge(o, on="key", how="inner")
        g = merged.groupby(
            ["key", "o_orderdate", "o_orderpriority"], as_index=False
        ).agg(revenue=("revenue", "sum"))
        g["revenue"] = g["revenue"].round(2)
        g = g.sort_values(["revenue", "o_orderdate", "key"],
                          ascending=[False, True, True]).head(k)
        return arrow_out(pd.DataFrame({
            "l_orderkey": g["key"].astype("int64"),
            "revenue": g["revenue"],
            "o_orderdate": g["o_orderdate"],
            "o_orderpriority": g["o_orderpriority"],
        }), null_casts={"o_orderpriority": pa.string()})

    winners = both.groupby(
        "bucket", num_partitions=physical_partitions(num_buckets)
    ).map_groups(join_bucket, batch_format="pandas")
    # ≤ P·k winner rows: the global sort is trivially small
    return winners.sort(
        ["revenue", "o_orderdate", "l_orderkey"], descending=[True, False, False]
    ).limit(k)


def doc_length_decile(sf_dir: str):
    """Global rank statistic WITHOUT a global sort: each doc's length
    decile via cumulative distribution — ``ceil(cume_dist * 10)`` where
    cume_dist = (# docs with n_chars ≤ mine) / N.  One bounded
    histogram pass (distinct lengths, in-batch combiners) builds the
    value → decile map on the driver; a second streaming pass applies
    it.  cume_dist needs no within-tie ordering, so the result is fully
    deterministic and engine-independent — the scalable stand-in for
    NTILE-style bucketing at 100 TB."""
    from ._agg import grouped_agg

    hist = grouped_agg(
        ray.data.read_parquet(_p(sf_dir, "documents"), columns=["n_chars"]),
        ["n_chars"], {"cnt": ("n_chars", "size")},
    ).to_pandas()  # bounded: one row per distinct length
    hist = hist.sort_values("n_chars")
    cum = hist["cnt"].cumsum().to_numpy(dtype="float64")
    n = cum[-1] if len(cum) else 1.0
    decile = np.minimum(np.ceil(cum / n * 10), 10).astype("int64")
    dmap = dict(zip(hist["n_chars"].to_numpy(), decile))

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars": df["n_chars"],
            "decile": df["n_chars"].map(dmap).astype("int64"),
        })

    return ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "n_chars"]
    ).map_batches(apply, batch_format="pandas")


def supplier_region_stats(sf_dir: str):
    """Snowflake dimension chain: supplier ⋈ nation ⋈ region rolled up
    to per-region supplier stats.  nation and region are classic TINY
    dimensions — composed into ONE nationkey → region-name dict on the
    driver and broadcast via ray.put, so the fact stream joins both hops
    with a single vectorized map per batch and partial aggregates
    in-batch; the exchange carries ≤ |regions| rows per batch and no
    dimension row ever shuffles."""
    import pyarrow.parquet as pq

    from ._agg import grouped_agg

    nat = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(_p(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rname = dict(zip(reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist()))
    nat2region = {
        nk: rname[rk]
        for nk, rk in zip(nat.column("n_nationkey").to_pylist(),
                          nat.column("n_regionkey").to_pylist())
    }
    dim_ref = ray.put(nat2region)

    sup = ray.data.read_parquet(_p(sf_dir, "supplier"), columns=["s_nationkey", "s_acctbal"])

    class Partial:
        def __init__(self, ref):
            self.n2r = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            g = pd.DataFrame({
                "region": df["s_nationkey"].map(self.n2r),
                "acctbal": df["s_acctbal"],
            }).groupby("region", as_index=False).agg(
                n_suppliers=("acctbal", "size"),
                sum_acctbal=("acctbal", "sum"),
                max_acctbal=("acctbal", "max"),
            )
            g["n_suppliers"] = g["n_suppliers"].astype("int64")
            return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g["sum_acctbal"] = g["sum_acctbal"].round(2)
        g["max_acctbal"] = g["max_acctbal"].round(2)
        return g

    return grouped_agg(
        sup.map_batches(Partial, fn_constructor_kwargs={"ref": dim_ref},
                        batch_format="pandas", concurrency=(1, 4)),
        ["region"],
        {"n_suppliers": ("n_suppliers", "sum"),
         "sum_acctbal": ("sum_acctbal", "sum"),
         "max_acctbal": ("max_acctbal", "max")},
        finish_fn=finish,
    )


def dedup_exact_keep_best(sf_dir: str, num_buckets: int | None = None):
    """Exact dedup with a QUALITY survivor policy: per distinct text,
    keep the doc with the most characters (ties: smallest doc_id) —
    "which copy to keep" is a real curation decision (prefer the richer
    metadata / longer extraction), unlike dedup_exact's arbitrary
    min-id survivor.

    Same scale shape as keep_latest_events: the shuffle key is the md5
    digest (fixed 32 bytes, never the body), an in-batch combiner keeps
    each batch's best per digest first, survivors co-locate by digest
    hash into coarse buckets, one vectorized sort + drop_duplicates per
    bucket finishes."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"]
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        return df.drop_duplicates("h", keep="first")

    def hash_and_combine(df: pd.DataFrame):
        h = df["text"].fillna("").map(
            lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
        df = pd.DataFrame({"doc_id": df["doc_id"], "n_chars": df["n_chars"], "h": h})
        df = best(df)  # combiner: local best per digest before the exchange
        b = pd.util.hash_pandas_object(df["h"], index=False)
        return arrow_out(df.assign(bucket=(b % num_buckets).astype("int32")))

    def per_bucket(df: pd.DataFrame):
        return arrow_out(best(df)[["doc_id", "n_chars"]])

    return (
        ds.map_batches(hash_and_combine, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_bucket, batch_format="pandas")
    )


def user_retention_cohorts(sf_dir: str, num_buckets: int | None = None):
    """Cohort retention matrix (cohort_day, day_offset, n_users): users
    are cohorted by the DAY of their first event; n_users counts how
    many of a cohort's users were active day_offset days later — the
    standard product-analytics retention triangle.

    Plan: an in-batch combiner first reduces events to distinct
    (user_id, day) pairs (the events table has many events per
    user-day, so this is the big reduction and it happens before any
    exchange); ONE user-bucketed exchange then computes each user's
    cohort day and per-(cohort, offset) partial counts — every user
    lives wholly in one bucket, so partials sum exactly; the final
    groupby merges a triangle-sized table (days x offsets), independent
    of corpus size."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def distinct_user_day(df: pd.DataFrame):
        out = pd.DataFrame({
            "user_id": df["user_id"],
            "day": df["ts"].dt.floor("D"),
        }).drop_duplicates()
        return arrow_out(out.assign(
            bucket=(out["user_id"] % num_buckets).astype("int32")))

    def per_bucket(df: pd.DataFrame):
        df = df.drop_duplicates(["user_id", "day"])
        first = df.groupby("user_id")["day"].transform("min")
        offset = (df["day"] - first).dt.days.astype("int64")
        out = (
            pd.DataFrame({"cohort_day": first, "day_offset": offset})
            .groupby(["cohort_day", "day_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        return arrow_out(out)

    partials = (
        ds.map_batches(distinct_user_day, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_bucket, batch_format="pandas")
    )
    from ._agg import grouped_agg

    return grouped_agg(
        partials, ["cohort_day", "day_offset"], {"n_users": ("n_users", "sum")}
    )


def local_supplier_volume(sf_dir: str, region: str = "ASIA", num_buckets: int | None = None):
    """TPC-H Q5 shape (n_name, revenue): revenue by nation from line
    items whose CUSTOMER and SUPPLIER share a nation inside ``region``
    — the classic 6-table snowflake with a cross-dimension equality.

    Join tiering (the fixed-cluster strategy this module uses
    throughout): region ⋈ nation ⋈ supplier are broadcast once via
    ``ray.put`` (supplier is the smallest fact-adjacent dimension —
    TPC-H sizes it at 1/15th of customer); lineitem ⋈ orders — the two
    big tables — is the explicit partitioned hash join on orderkey
    (``order_revenue`` pattern), with the supplier-nation filter and a
    (custkey, nation) partial-sum combiner applied per bucket BEFORE
    anything else moves; customer — big at corpus scale, never
    broadcast — contributes c_nationkey through a second bucketed
    point-lookup exchange on custkey whose left side is the combined
    partials, not raw line items."""
    import pyarrow as pa

    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()

    import ray as _ray

    # broadcast side: suppkey -> nationkey, restricted to the region's
    # nations; nationkey -> name for the final label
    nation = pd.read_parquet(_p(sf_dir, "nation"))
    region_df = pd.read_parquet(_p(sf_dir, "region"))
    rk = region_df.loc[region_df["r_name"] == region, "r_regionkey"]
    nat_in_region = nation[nation["n_regionkey"].isin(rk)]
    nat_names = dict(zip(nat_in_region["n_nationkey"], nat_in_region["n_name"]))
    supplier = pd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    supplier = supplier[supplier["s_nationkey"].isin(nat_names)]
    supp_ref = _ray.put(dict(zip(supplier["s_suppkey"], supplier["s_nationkey"])))
    names_ref = _ray.put(nat_names)

    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def tag_orders(df: pd.DataFrame):
        return arrow_out(pd.DataFrame({
            "key": df["o_orderkey"],
            "bucket": (df["o_orderkey"] % num_buckets).astype("int32"),
            "custkey": df["o_custkey"],
            "suppnat": np.full(len(df), -1, dtype=np.int64),
            "revenue": np.full(len(df), np.nan),
            "side": "o",
        }))

    def tag_items(df: pd.DataFrame):
        """Supplier-nation semi-filter runs at the SCAN: line items
        outside the region never enter the join exchange.  A plain task
        (not an actor pool): ``ray.get`` of the broadcast dict is
        cached per worker process, and a task pool can't contribute to
        an actor-pool resource deadlock at low CPU counts (two min-1
        actor pools wedged the 4-CPU pytest session)."""
        s2n = _ray.get(supp_ref)
        nat = df["l_suppkey"].map(s2n)
        keep = nat.notna()
        df = df[keep]
        return arrow_out(pd.DataFrame({
            "key": df["l_orderkey"].to_numpy(),
            "bucket": (df["l_orderkey"] % num_buckets).astype("int32").to_numpy(),
            "custkey": np.full(int(keep.sum()), -1, dtype=np.int64),
            "suppnat": nat[keep].astype("int64").to_numpy(),
            "revenue": (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy(),
            "side": "l",
        }))

    def join_bucket(df: pd.DataFrame):
        o = df[df["side"] == "o"]
        l = df[df["side"] == "l"]
        m = l.merge(o[["key", "custkey"]], on="key", suffixes=("", "_o"))
        # combiner: partial sums per (custkey, supplier-nation) shrink
        # the customer-lookup exchange to distinct pairs per bucket
        part = (
            m.groupby(["custkey_o", "suppnat"], sort=False)["revenue"].sum().reset_index()
        )
        return arrow_out(pd.DataFrame({
            "custkey": part["custkey_o"].astype("int64"),
            "suppnat": part["suppnat"].astype("int64"),
            "revenue": part["revenue"],
        }))

    partials = (
        items.map_batches(tag_items, batch_format="pandas")
        .union(orders.map_batches(tag_orders, batch_format="pandas"))
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(join_bucket, batch_format="pandas")
    )

    # customer-side nation via bucketed point lookup on custkey, then
    # the cross-dimension equality filter and the nation-sized final agg
    from .dedup import _bucketed_attach

    attached = _bucketed_attach(
        partials,
        ray.data.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]),
        key_col="custkey",
        src_key="c_custkey",
        src_val="c_nationkey",
        out_col="custnat",
        num_buckets=num_buckets,
        pair_fill={"suppnat": -1, "revenue": 0.0},
        val_type=pa.int64(),
    )

    def finish(df: pd.DataFrame):
        names = _ray.get(names_ref)  # worker-cached deserialization
        df = df[df["custnat"].astype("float64") == df["suppnat"]]
        out = df.groupby("suppnat", sort=False)["revenue"].sum().reset_index()
        return arrow_out(pd.DataFrame({
            "n_name": out["suppnat"].map(names).astype(str),
            "revenue": out["revenue"],
        }))

    from ._agg import grouped_agg

    agg = grouped_agg(
        attached.map_batches(finish, batch_format="pandas"),
        ["n_name"],
        {"revenue": ("revenue", "sum")},
    )
    return agg.map_batches(
        lambda df: arrow_out(df.assign(revenue=df["revenue"].round(2))),
        batch_format="pandas",
    )


def conversion_funnel(sf_dir: str, window_days: int = 7, num_buckets: int | None = None):
    """Two-step funnel (click_day, n_clickers, n_converted): of the
    users whose FIRST click fell on click_day, how many made their
    first purchase within ``window_days`` after that click — the
    classic product-analytics conversion funnel.

    Plan: the read is pruned to the two funnel event types with a
    parquet row filter; an in-batch combiner reduces each batch to one
    (user, type) -> min(ts) partial; ONE user-bucketed exchange merges
    partials (every user wholly in one bucket) and emits per-click-day
    partial counts; the final merge is days-sized."""
    import pyarrow.dataset as pads

    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"),
        columns=["user_id", "event_type", "ts"],
        filter=pads.field("event_type").isin(["click", "purchase"]),
    )
    window = pd.Timedelta(days=window_days)

    def partial_min(df: pd.DataFrame):
        out = (
            df.groupby(["user_id", "event_type"], sort=False)["ts"].min().reset_index()
        )
        return arrow_out(out.assign(
            bucket=(out["user_id"] % num_buckets).astype("int32")))

    def per_bucket(df: pd.DataFrame):
        firsts = (
            df.groupby(["user_id", "event_type"], sort=False)["ts"].min().unstack()
        )
        if "click" not in firsts:
            return arrow_out(pd.DataFrame({
                "click_day": pd.Series([], dtype="datetime64[us]"),
                "n_clickers": pd.Series([], dtype="int64"),
                "n_converted": pd.Series([], dtype="int64"),
            }))
        clicks = firsts["click"].dropna()
        purchases = firsts["purchase"] if "purchase" in firsts else pd.Series(
            pd.NaT, index=firsts.index)
        purchases = purchases.reindex(clicks.index)
        converted = (purchases >= clicks) & (purchases <= clicks + window)
        out = pd.DataFrame({
            "click_day": clicks.dt.floor("D"),
            "converted": converted.astype("int64"),
        })
        agg = out.groupby("click_day").agg(
            n_clickers=("converted", "size"), n_converted=("converted", "sum")
        ).reset_index()
        return arrow_out(pd.DataFrame({
            "click_day": agg["click_day"],
            "n_clickers": agg["n_clickers"].astype("int64"),
            "n_converted": agg["n_converted"].astype("int64"),
        }))

    partials = (
        ds.map_batches(partial_min, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_bucket, batch_format="pandas")
    )
    from ._agg import grouped_agg

    return grouped_agg(
        partials,
        ["click_day"],
        {"n_clickers": ("n_clickers", "sum"), "n_converted": ("n_converted", "sum")},
    )


def salted_skew_join(sf_dir: str, n_salts: int = 16, num_buckets: int | None = None):
    """Hot-key-salted shuffle join (user_id, score): every event joins a
    per-event-type dimension attribute (a derived weight) and the
    weighted values are summed per user.

    The events fact table has ~5 distinct event_type values — a
    pathologically skewed join key where a plain hash-partitioned join
    would put 1/5th of the corpus in one partition no matter how many
    buckets exist.  This operator demonstrates the salting pattern the
    flagship uses implicitly (explode = salt-to-span-granularity):

    - fact side: each row's key becomes (event_type, salt) with
      ``salt = event_id % n_salts``, spreading every hot key over
      ``n_salts`` partitions;
    - dimension side: REPLICATED once per salt (|dim| x n_salts rows —
      the explicit price of salting, paid on the small side);
    - per-bucket: vectorized weight lookup + per-user partial sums (the
      combiner), then a user-keyed grouped_agg finishes.

    With a 5-row dimension a broadcast would of course be cheaper; the
    named operator exists to pin the pattern (and its oracle) for the
    case where the dimension is too large to broadcast and the fact
    keys are skewed.  The dimension weight is derived from the shared
    hash64 idiom so DuckDB reproduces it exactly."""
    from ..functions.hashing import hash64
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "value"]
    )

    # the "dimension": event_type -> weight, derived (not broadcast) so
    # the oracle can rebuild it with md5_number_lower
    def dim_rows():
        types = ["click", "error", "purchase", "signup", "view"]
        return pd.DataFrame({
            "event_type": types,
            "weight": [float(hash64(t) % 100) / 10.0 for t in types],
        })

    def tag_fact(df: pd.DataFrame):
        salt = (df["event_id"] % n_salts).astype("int64")
        key = df["event_type"].map(lambda t: hash64(t) % (1 << 62)).astype("int64")
        out = pd.DataFrame({
            "user_id": df["user_id"],
            "value": df["value"],
            "weight": np.full(len(df), np.nan),
            "side": "f",
            "skey": key * n_salts + salt,
        })
        return arrow_out(out.assign(
            bucket=(out["skey"] % num_buckets).astype("int32")))

    def dim_replicated(df: pd.DataFrame):
        dim = dim_rows()
        rep = dim.loc[dim.index.repeat(n_salts)].reset_index(drop=True)
        salt = np.tile(np.arange(n_salts, dtype=np.int64), len(dim))
        key = rep["event_type"].map(lambda t: hash64(t) % (1 << 62)).astype("int64")
        out = pd.DataFrame({
            "user_id": np.full(len(rep), -1, dtype=np.int64),
            "value": np.full(len(rep), np.nan),
            "weight": rep["weight"],
            "side": "d",
            "skey": (key * n_salts + salt).to_numpy(),
        })
        return arrow_out(out.assign(
            bucket=(out["skey"] % num_buckets).astype("int32")))

    def join_bucket(df: pd.DataFrame):
        d = df[df["side"] == "d"]
        f = df[df["side"] == "f"]
        lut = dict(zip(d["skey"].tolist(), d["weight"].tolist()))
        w = f["skey"].map(lut)
        part = (
            pd.DataFrame({"user_id": f["user_id"], "score": f["value"] * w})
            .groupby("user_id", sort=False)["score"].sum().reset_index()
        )
        return arrow_out(part)

    # the dimension replication rides on a 1-row dataset so it runs as
    # one task inside the same streaming plan (no driver-side union of
    # materialized frames)
    seed = ray.data.from_items([{"one": 1}])
    joined = (
        ds.map_batches(tag_fact, batch_format="pandas")
        .union(seed.map_batches(dim_replicated, batch_format="pandas"))
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(join_bucket, batch_format="pandas")
    )
    from ._agg import grouped_agg

    agg = grouped_agg(joined, ["user_id"], {"score": ("score", "sum")})
    return agg.map_batches(
        lambda df: arrow_out(df.assign(score=df["score"].round(4))),
        batch_format="pandas",
    )


def dedup_incremental(sf_dir: str, num_buckets: int | None = None):
    """Snapshot-incremental exact dedup (doc_id, n_chars): keep the docs
    of a NEW ingestion batch whose text digest does not already exist in
    the PRIOR corpus snapshot — the anti-join every periodically-refreshed
    100-TB corpus runs before appending a crawl increment.  The deterministic
    split doc_id % 10 < 5 stands in for the snapshot boundary.

    Plan: both sides reduce to (digest-bucket, digest) rows at the scan
    — the prior side ships NOTHING but digests (16 bytes/doc, ~0.01% of
    corpus bytes), the new side additionally carries its output payload
    columns; one digest-bucketed exchange co-locates every possible
    collision and each bucket anti-joins with a set probe.  Within the
    new batch itself, duplicate digests keep the lowest doc_id (the
    dedup_exact rule)."""
    import hashlib

    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"]
    )

    def tag(df: pd.DataFrame):
        h = df["text"].fillna("").map(
            lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
        b = pd.util.hash_pandas_object(h, index=False)
        is_new = (df["doc_id"] % 10 >= 5)
        return arrow_out(pd.DataFrame({
            "doc_id": df["doc_id"].where(is_new, -1).astype("int64"),
            "n_chars": df["n_chars"].where(is_new, 0).astype("int64"),
            "h": h,
            "side": np.where(is_new, "n", "p"),
            "bucket": (b % num_buckets).astype("int32"),
        }))

    def anti_join(df: pd.DataFrame):
        prior = set(df.loc[df["side"] == "p", "h"])
        new = df[df["side"] == "n"].sort_values("doc_id").drop_duplicates("h")
        keep = new[~new["h"].isin(prior)]
        return arrow_out(pd.DataFrame({
            "doc_id": keep["doc_id"].to_numpy(),
            "n_chars": keep["n_chars"].to_numpy(),
        }))

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(anti_join, batch_format="pandas")
    )


def customer_order_counts(sf_dir: str, num_buckets: int | None = None):
    """LEFT OUTER join (c_custkey, n_orders, total_price): every
    customer with their order count and revenue, ZERO-filled for
    customers who never ordered — the outer-join counterpart of the
    anti/semi pair (``customers_without_orders`` proves the null side
    is non-empty in this corpus).

    Same custkey-bucketed union co-location as the other joins; the
    orders side pre-aggregates per (bucket, custkey) inside the batch
    (combiner), so the exchange carries one partial row per customer
    per batch rather than raw orders."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    customers = ray.data.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey"])
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def tag_cust(df: pd.DataFrame):
        return arrow_out(pd.DataFrame({
            "key": df["c_custkey"],
            "n_orders": np.zeros(len(df), dtype=np.int64),
            "total_price": np.zeros(len(df)),
            "side": "c",
            "bucket": (df["c_custkey"] % num_buckets).astype("int32"),
        }))

    def tag_orders(df: pd.DataFrame):
        part = df.groupby("o_custkey", sort=False)["o_totalprice"].agg(
            ["size", "sum"]).reset_index()
        return arrow_out(pd.DataFrame({
            "key": part["o_custkey"],
            "n_orders": part["size"].astype("int64"),
            "total_price": part["sum"],
            "side": "o",
            "bucket": (part["o_custkey"] % num_buckets).astype("int32"),
        }))

    def outer_join(df: pd.DataFrame):
        cust = df.loc[df["side"] == "c", "key"]
        o = df[df["side"] == "o"].groupby("key", sort=False).agg(
            n_orders=("n_orders", "sum"), total_price=("total_price", "sum"))
        out = o.reindex(cust)  # LEFT: every customer row, NaN where no orders
        return arrow_out(pd.DataFrame({
            "c_custkey": cust.to_numpy(),
            "n_orders": out["n_orders"].fillna(0).astype("int64").to_numpy(),
            "total_price": out["total_price"].fillna(0.0).round(2).to_numpy(),
        }))

    return (
        customers.map_batches(tag_cust, batch_format="pandas")
        .union(orders.map_batches(tag_orders, batch_format="pandas"))
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(outer_join, batch_format="pandas")
    )


def quality_zscore_by_lang(sf_dir: str, num_buckets: int | None = None):
    """Per-group standardization (doc_id, lang, zscore): each doc's
    length is z-scored against ITS LANGUAGE's population mean/std — the
    per-group feature-normalization pass a training pipeline runs
    before mixing heterogeneous sources.

    Two passes, the second is the big one: pass 1 reduces the corpus to
    per-lang (n, sum, sumsq) moment partials (in-batch combiner, then a
    langs-sized merge on the driver — bounded by language count, never
    by corpus size); pass 2 broadcasts the tiny moments dict and maps
    each batch vectorized.  Population variance is computed with the
    same explicit (sumsq - sum^2/n)/n formula the SQL mirror uses."""
    from ._util import arrow_out

    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )

    def moments(df: pd.DataFrame):
        x = df["n_chars"].astype("float64")
        g = pd.DataFrame({"lang": df["lang"], "x": x, "x2": x * x}).groupby(
            "lang", sort=False).agg(n=("x", "size"), s=("x", "sum"), s2=("x2", "sum"))
        return arrow_out(g.reset_index())

    parts = ds.map_batches(moments, batch_format="pandas").to_pandas()
    m = parts.groupby("lang").sum()
    mean = m["s"] / m["n"]
    var = (m["s2"] - m["s"] ** 2 / m["n"]) / m["n"]
    stats = {
        lang: (mean[lang], float(np.sqrt(var[lang]))) for lang in m.index
    }
    import ray as _ray

    stats_ref = _ray.put(stats)

    def zscore(df: pd.DataFrame):
        st = _ray.get(stats_ref)
        mu = df["lang"].map(lambda l: st[l][0])
        sd = df["lang"].map(lambda l: st[l][1])
        return arrow_out(pd.DataFrame({
            "doc_id": df["doc_id"],
            "lang": df["lang"],
            "zscore": ((df["n_chars"] - mu) / sd).round(6),
        }))

    return ds.map_batches(zscore, batch_format="pandas")


def weekly_active_users(sf_dir: str, window_days: int = 7, num_buckets: int | None = None):
    """Rolling-window distinct count (day, wau): for every day observed
    in the events table, the number of distinct users active in the
    trailing ``window_days``-day window ending that day — the
    product-analytics WAU series.

    Scale shape: the raw event stream is never fanned out.  An in-batch
    ``drop_duplicates`` combiner reduces events to (user, day) pairs
    first, one grouped dedup exchange bounds the intermediate at
    |users|x|days| (materialized: it anchors the day set AND feeds the
    window fan-out), and the x``window_days`` fan-out happens on THAT
    compact table with the observed-day filter applied in-batch.  The
    final per-day distinct count rides the dedup partitions — each
    (day, user) group lives wholly in one hash partition, so the last
    exchange carries one partial-count row per (day, batch), never the
    pair stream."""
    from ._agg import grouped_agg
    from ._util import arrow_out

    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(df: pd.DataFrame):
        return arrow_out(
            pd.DataFrame({"user_id": df["user_id"], "day": df["ts"].dt.floor("D")})
            .drop_duplicates()
        )

    ud = grouped_agg(
        ds.map_batches(pairs, batch_format="pandas"),
        ["user_id", "day"], {"c": ("day", "size")},
        num_partitions=num_buckets,
    ).drop_columns(["c"]).materialize()

    # observed-day anchor set: bounded at one row per distinct day, so
    # the driver-side take_all is output-sized (days, not events)
    days = grouped_agg(ud, ["day"], {"c": ("day", "size")}).drop_columns(["c"])
    day_index = pd.DatetimeIndex([r["day"] for r in days.take_all()])

    def fan(df: pd.DataFrame):
        n = len(df)
        day = df["day"].to_numpy().repeat(window_days)
        k = np.tile(np.arange(window_days, dtype="int64"), n)
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy().repeat(window_days),
            "day": day + k * np.timedelta64(1, "D"),
        })
        out = out[out["day"].isin(day_index)]
        return arrow_out(out.drop_duplicates())

    dedup = grouped_agg(
        ud.map_batches(fan, batch_format="pandas"),
        ["day", "user_id"], {"c": ("user_id", "size")},
        num_partitions=num_buckets,
    )

    def partial(df: pd.DataFrame):
        return arrow_out(
            df.groupby("day", as_index=False, sort=False).agg(wau=("user_id", "size"))
        )

    return grouped_agg(
        dedup.map_batches(partial, batch_format="pandas"),
        ["day"], {"wau": ("wau", "sum")},
    )


def event_path_topk(sf_dir: str, n: int = 3, k: int = 10, num_buckets: int | None = None):
    """Sequence mining (path, n): the top-k most frequent consecutive
    ``n``-event-type sequences, ordered per user by (ts, event_id) —
    the session-path / clickstream-motif query.

    One user-bucketed exchange does the per-user ordering (the
    unavoidable shuffle: order lives per user) and each bucket forms
    its n-grams with numpy shift-compares — no per-user Python.  Path
    counts leave the bucket pre-aggregated (one row per distinct path
    per bucket), and the final top-k is the exact per-partition
    head(k) -> P*k global sort (ngram_topk pattern)."""
    from ._agg import grouped_agg
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def add_bucket(df: pd.DataFrame):
        return arrow_out(
            df.assign(bucket=(df["user_id"] % num_buckets).astype("int32"))
        )

    def per_bucket(df: pd.DataFrame):
        df = df.sort_values(["user_id", "ts", "event_id"])
        et = df["event_type"].to_numpy(dtype=object)
        uid = df["user_id"].to_numpy()
        m = len(df) - n + 1
        if m <= 0:
            return arrow_out(pd.DataFrame({
                "path": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            }))
        # windows that stay inside one user: all n rows share user_id
        same = np.ones(m, dtype=bool)
        path = et[:m]
        for j in range(1, n):
            same &= uid[:m] == uid[j:m + j]
            path = path + ">" + et[j:m + j]
        vc = pd.Series(path[same]).value_counts()
        return arrow_out(pd.DataFrame({
            "path": vc.index.to_numpy(dtype=object),
            "n": vc.to_numpy(dtype="int64"),
        }))

    totals = grouped_agg(
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_bucket, batch_format="pandas"),
        ["path"], {"n": ("n", "sum")},
        finish_fn=lambda g: g.sort_values(["n", "path"],
                                          ascending=[False, True]).head(k),
    )
    return totals.sort(["n", "path"], descending=[True, False]).limit(k)


def pca_embeddings(sf_dir: str, k: int = 4):
    """Principal-component scores (vec_id, pc0..pc{k-1}) of every
    embedding — the dimensionality-reduction / whitening pass a
    curation pipeline runs before clustering or visualizing a corpus.

    Scale shape (the moment-partial pattern, like kmeans): pass 1
    reduces the corpus to (n, sum_x, sum_xxT) partials — each batch
    emits ONE row of d + d*d floats regardless of batch size, so the
    driver merge is block-count-, never corpus-, sized; the d x d
    covariance eigensolve runs on the driver (d is model-sized); pass 2
    broadcasts the d x k component matrix and projects each batch with
    one matmul.  Component signs are fixed by making each component's
    largest-|loading| entry positive (the standard determinism
    convention), so results are reproducible across runs and partition
    layouts."""
    path = _p(sf_dir, "embeddings")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    def moment_partial(batch: dict) -> dict:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        return {
            "n": np.array([len(V)], dtype=np.int64),
            "s": [V.sum(axis=0).tobytes()],
            "s2": [(V.T @ V).tobytes()],
        }

    parts = ds.map_batches(moment_partial, batch_format="numpy").take_all()
    n = sum(int(p["n"]) for p in parts)
    d = len(np.frombuffer(parts[0]["s"], dtype=np.float64))
    s = np.zeros(d)
    s2 = np.zeros((d, d))
    for p in parts:
        s += np.frombuffer(p["s"], dtype=np.float64)
        s2 += np.frombuffer(p["s2"], dtype=np.float64).reshape(d, d)
    mu = s / n
    cov = s2 / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)       # ascending
    W = evecs[:, ::-1][:, :k]                # top-k, descending eigenvalue
    flip = np.sign(W[np.abs(W).argmax(axis=0), np.arange(k)])
    W = W * flip
    ref = ray.put((mu, W))

    def project(batch: dict) -> dict:
        mu_b, W_b = ray.get(ref)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        P = (V - mu_b) @ W_b
        out = {"vec_id": batch["vec_id"]}
        for j in range(W_b.shape[1]):
            out[f"pc{j}"] = P[:, j]
        return out

    return ds.map_batches(project, batch_format="numpy")


def order_priority_counts(sf_dir: str, num_buckets: int | None = None):
    """o_orderpriority, order_count: per-priority count of orders with at
    least one LATE-shipped lineitem (l_shipdate > o_orderdate) — TPC-H
    Q4's shape: a distributed EXISTS semi-join whose predicate mixes an
    EQUALITY key (orderkey, routed by the bucket exchange) with an
    INEQUALITY (shipdate vs orderdate, evaluated per bucket after the
    key merge).  Completes the join family with the inequality-EXISTS
    variant (inner / broadcast / as-of / anti / semi / range / salted /
    left-outer already exist).

    Scale shape: the EXISTS only needs each order's MAX shipdate, so the
    lineitem side pre-reduces to one (orderkey, max_shipdate) row per
    key per batch — the in-batch combiner — and the exchange never
    carries raw lineitems; the per-bucket finish re-reduces the max,
    merges against orders (one row per key: orderkey is the orders PK)
    and emits ≤ |priorities| partial-count rows per bucket, so the final
    priority aggregate is tiny.  Dates travel as int64 microseconds —
    both sides emit one identical non-null schema, so no null-typed
    Arrow columns can split hash-shuffle groups."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]
    )
    casts = {"priority": pa.string()}

    def tag_orders(df: pd.DataFrame):
        keys = df["o_orderkey"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "priority": df["o_orderpriority"].to_numpy(),
            "odate": df["o_orderdate"].to_numpy(dtype="datetime64[us]").astype("int64"),
            "sdate": np.zeros(len(df), dtype="int64"),
            "side": "o",
        }), null_casts=casts)

    def tag_items(df: pd.DataFrame):
        # combiner: the EXISTS(l_shipdate > o_orderdate) only depends on
        # max(l_shipdate), so ship one row per orderkey per batch
        g = (
            pd.DataFrame({
                "key": df["l_orderkey"].to_numpy(dtype="int64"),
                "sdate": df["l_shipdate"].to_numpy(dtype="datetime64[us]").astype("int64"),
            })
            .groupby("key", as_index=False)["sdate"].max()
        )
        keys = g["key"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "priority": pd.Series([None] * len(g), dtype="object"),
            "odate": np.zeros(len(g), dtype="int64"),
            "sdate": g["sdate"].to_numpy(dtype="int64"),
            "side": "l",
        }), null_casts=casts)

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        items.map_batches(tag_items, batch_format="pandas")
    )

    def exists_bucket(df: pd.DataFrame):
        o = df[df["side"] == "o"][["key", "priority", "odate"]]
        l = (
            df[df["side"] == "l"]
            .groupby("key", as_index=False)["sdate"].max()
        )
        m = o.merge(l, on="key", how="inner")
        late = m[m["sdate"] > m["odate"]]
        part = late.groupby("priority", as_index=False).agg(
            order_count=("key", "size")
        )
        return arrow_out(pd.DataFrame({
            "o_orderpriority": part["priority"],
            "order_count": part["order_count"].astype("int64"),
        }), null_casts={"o_orderpriority": pa.string()})

    partials = both.groupby(
        "bucket", num_partitions=physical_partitions(num_buckets)
    ).map_groups(exists_bucket, batch_format="pandas")
    final = partials.groupby("o_orderpriority").aggregate(
        Sum("order_count", alias_name="order_count")
    )
    return final.map_batches(
        lambda df: arrow_out(df.assign(order_count=df["order_count"].astype("int64"))),
        batch_format="pandas",
    )


def returned_item_ranking(sf_dir: str, k: int = 20, num_buckets: int | None = None):
    """c_custkey, c_name, c_acctbal, revenue: top-k customers by revenue
    lost to RETURNED items — TPC-H Q10's shape: lineitem(l_returnflag =
    'R') ⋈ orders on orderkey (both large: union-tag partitioned hash
    join), re-keyed to custkey for the revenue aggregate, then the small
    customer dimension attached by broadcast and the global top-k taken.

    Scale shape: the returnflag predicate is PUSHED DOWN into the
    parquet read (row-group pruning); the per-bucket merge pre-reduces
    to (custkey, partial revenue) — the combiner — so the second
    exchange carries at most one row per custkey per bucket; the
    custkey aggregate's per-partition finish takes an EXACT top-k
    prefilter (each custkey lives wholly in one hash partition), so the
    driver-side sort sees ≤ P·k winner rows; customer attaches via
    ``ray.put`` once, never shuffled."""
    from ._agg import grouped_agg
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"),
    )
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )

    def tag_orders(df: pd.DataFrame):
        keys = df["o_orderkey"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "custkey": df["o_custkey"].to_numpy(dtype="int64"),
            "revenue": np.full(len(df), np.nan),
            "side": "o",
        }))

    def tag_items(df: pd.DataFrame):
        keys = df["l_orderkey"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "custkey": np.zeros(len(df), dtype="int64"),
            "revenue": (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy(),
            "side": "l",
        }))

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        items.map_batches(tag_items, batch_format="pandas")
    )

    def join_bucket(df: pd.DataFrame):
        o = df[df["side"] == "o"][["key", "custkey"]]
        l = df[df["side"] == "l"][["key", "revenue"]]
        merged = l.merge(o, on="key", how="inner")
        part = merged.groupby("custkey", as_index=False).agg(
            revenue=("revenue", "sum")
        )
        return arrow_out(pd.DataFrame({
            "c_custkey": part["custkey"].astype("int64"),
            "revenue": part["revenue"],
        }))

    partials = both.groupby(
        "bucket", num_partitions=physical_partitions(num_buckets)
    ).map_groups(join_bucket, batch_format="pandas")

    def topk_finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(revenue=df["revenue"].round(2))
        return df.sort_values(
            ["revenue", "c_custkey"], ascending=[False, True]
        ).head(k)

    totals = grouped_agg(
        partials, ["c_custkey"], {"revenue": ("revenue", "sum")},
        finish_fn=topk_finish,
    )

    import pyarrow.parquet as pq

    cust = pq.read_table(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_acctbal"]
    )
    dim_ref = ray.put({
        int(key): (name, bal)
        for key, name, bal in zip(
            cust.column("c_custkey").to_pylist(),
            cust.column("c_name").to_pylist(),
            cust.column("c_acctbal").to_pylist(),
        )
    })

    def attach_dim(df: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        looked = df["c_custkey"].map(dim)
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].astype("int64"),
            "c_name": looked.str[0],
            "c_acctbal": looked.str[1],
            "revenue": df["revenue"],
        })

    named = totals.map_batches(attach_dim, batch_format="pandas")
    return named.sort(["revenue", "c_custkey"], descending=[True, False]).limit(k)


def top_docs_per_source(sf_dir: str, k: int = 5, num_buckets: int | None = None):
    """doc_id, source, n_chars: the k longest documents of EVERY source —
    per-group top-k (row_number window, k > 1; the argmax operator
    ``top_user_per_event_type`` is the k = 1 special case).  Ties break
    on doc_id so the selection is deterministic.

    Scale shape: per-batch per-source head(k) is the in-batch combiner
    (the global per-source top-k is a subset of the union of per-batch
    top-ks), so the exchange carries ≤ k rows per source per batch;
    each source then lives wholly in one hash bucket, where a single
    vectorized sort + groupby-head finishes exactly."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"]
    )

    def prefilter(df: pd.DataFrame):
        g = df.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).groupby("source", sort=False).head(k)
        h = pd.util.hash_pandas_object(g["source"], index=False)
        return arrow_out(g.assign(bucket=(h % num_buckets).astype("int32")))

    def finish(df: pd.DataFrame):
        g = df.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).groupby("source", sort=False).head(k)
        return arrow_out(pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "source": g["source"],
            "n_chars": g["n_chars"].astype("int64"),
        }))

    return ds.map_batches(prefilter, batch_format="pandas").groupby(
        "bucket", num_partitions=physical_partitions(num_buckets)
    ).map_groups(finish, batch_format="pandas")


def embedding_centroid_dist(sf_dir: str):
    """vec_id, label, dist: each vector's Euclidean distance to ITS
    LABEL's centroid — the embedding-space outlier signal a curation
    pipeline thresholds to prune mislabeled / off-distribution examples
    (the within-cluster half of SemDeDup's prune rule: far-from-centroid
    = outlier, near-duplicate-of-neighbor = redundant).

    Scale shape: two passes, mirroring ``quality_zscore_by_lang`` lifted
    to vectors — pass 1 streams per-batch per-label (count, sum-vector)
    moment partials to the driver (bounded by |labels| × dim, never by
    corpus size), pass 2 broadcasts the labels-sized centroid matrix
    once via ``ray.put`` and computes all distances in one vectorized
    numpy expression per batch.  Elements are cast float32→float64
    BEFORE summing, matching the SQL mirror's CAST."""
    path = _p(sf_dir, "embeddings")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding", "label"])

    def moment_partial(batch: dict) -> dict:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        labels = np.asarray(batch["label"], dtype=np.int64)
        uniq = np.unique(labels)
        return {
            "label": uniq,
            "n": np.array([(labels == u).sum() for u in uniq], dtype=np.int64),
            "s": [V[labels == u].sum(axis=0).tobytes() for u in uniq],
        }

    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for part in ds.map_batches(moment_partial, batch_format="numpy").iter_batches(
        batch_format="pandas"
    ):
        for label, n, s in zip(part["label"], part["n"], part["s"]):
            vec = np.frombuffer(s, dtype=np.float64)
            if int(label) in sums:
                sums[int(label)] = sums[int(label)] + vec
                counts[int(label)] += int(n)
            else:
                sums[int(label)] = vec.copy()
                counts[int(label)] = int(n)
    centroids = {lab: sums[lab] / counts[lab] for lab in sums}
    cent_ref = ray.put(centroids)

    def dist(batch: dict) -> dict:
        cent = ray.get(cent_ref)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        labels = np.asarray(batch["label"], dtype=np.int64)
        C = np.stack([cent[int(lab)] for lab in labels])
        d = np.sqrt(((V - C) ** 2).sum(axis=1))
        return {
            "vec_id": np.asarray(batch["vec_id"], dtype=np.int64),
            "label": labels,
            "dist": np.floor(d * 10000) / 10000,
        }

    return ds.map_batches(dist, batch_format="numpy")


def orders_monthly_growth(sf_dir: str, num_buckets: int | None = None):
    """month, revenue, growth: monthly order revenue with month-over-month
    relative growth (LAG over an AGGREGATED time series — the resample +
    window composition; ``user_value_delta`` is LAG over raw rows).
    First month's growth is 0 by convention.

    Scale shape: per-batch per-month revenue partials are the in-batch
    combiner (≤ |months| rows per batch — bounded by the calendar, not
    the corpus), the driver reduces the months-sized series and computes
    the LAG locally: the window runs over OUTPUT-sized data only, the
    order table itself never lands anywhere."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "month": df["o_orderdate"].dt.strftime("%Y-%m"),
            "revenue": df["o_totalprice"],
        }).groupby("month", as_index=False)["revenue"].sum()
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.groupby("month", as_index=False)["revenue"].sum().sort_values(
        "month", ignore_index=True
    )
    m["revenue"] = m["revenue"].round(2)
    m["growth"] = (m["revenue"] / m["revenue"].shift(1) - 1).fillna(0.0).round(6)
    return pa.Table.from_pandas(m, preserve_index=False)


def events_anomaly_hours(sf_dir: str):
    """day, hour, n_events, zscore: each (day, hour) bucket's event count
    z-scored against the SAME HOUR-OF-DAY's distribution across all days
    — calendar-keyed anomaly detection (the "is this 3am spike unusual
    for 3am" monitor a streaming ingest pipeline runs over its own
    volume).  Hours whose across-day variance is zero score 0.

    Scale shape: per-batch (day, hour) count partials are the in-batch
    combiner (≤ |day×hour| rows per batch — bounded by the calendar,
    never the corpus); the driver reduces the calendar-sized series and
    computes the per-hour moments locally with the same explicit
    (sumsq - sum²/n)/n formula the SQL mirror uses.  The events table
    itself never lands anywhere."""
    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": df["ts"].dt.strftime("%Y-%m-%d"),
            "hour": df["ts"].dt.hour.astype("int64"),
        }).groupby(["day", "hour"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    c = parts.groupby(["day", "hour"], as_index=False)["n"].sum()
    c["n2"] = c["n"].astype("float64") ** 2
    m = c.groupby("hour").agg(
        nd=("n", "size"), s1=("n", "sum"), s2=("n2", "sum")
    )
    mu = m["s1"] / m["nd"]
    var = (m["s2"] - m["s1"].astype("float64") ** 2 / m["nd"]) / m["nd"]
    sd = np.sqrt(var.clip(lower=0.0))
    z = np.where(
        var.loc[c["hour"]].to_numpy() > 0,
        (c["n"].to_numpy() - mu.loc[c["hour"]].to_numpy())
        / sd.loc[c["hour"]].to_numpy(),
        0.0,
    )
    return pa.Table.from_pandas(pd.DataFrame({
        "day": c["day"],
        "hour": c["hour"].astype("int64"),
        "n_events": c["n"].astype("int64"),
        "zscore": np.round(z, 6),
    }), preserve_index=False)


def token_zipf_alpha(sf_dir: str, top_v: int = 1000, num_buckets: int | None = None):
    """n_vocab, alpha: the corpus's Zipf exponent — the slope of
    log(frequency) on log(rank) over the ``top_v`` most frequent tokens
    (freq ∝ rank^-alpha).  A corpus-health scalar: natural text sits
    near alpha ≈ 1; boilerplate-heavy or template-generated corpora
    drift far from it, so training pipelines track it per crawl batch.

    Scale shape: token counting is the ngram_topk exchange (in-batch
    value_counts combiner, coarse-bucket grouped sum); each token's
    total lives wholly in one hash partition, so the per-partition
    head(top_v) is an EXACT global pre-filter and the driver-side rank +
    least-squares fit run over ≤ P·top_v rows — never the full
    vocabulary (billions of distinct tokens at corpus scale)."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].fillna("").str.split().explode().dropna().value_counts()
        return pd.DataFrame({
            "tok": vc.index, "n": vc.to_numpy(dtype="int64")
        })

    winners = grouped_agg(
        ds.map_batches(partial_counts, batch_format="pandas"),
        ["tok"], {"n": ("n", "sum")},
        finish_fn=lambda g: g.sort_values(
            ["n", "tok"], ascending=[False, True]
        ).head(top_v),
    ).to_pandas()
    top = winners.sort_values(["n", "tok"], ascending=[False, True],
                              ignore_index=True).head(top_v)
    v = len(top)
    if v < 2:
        alpha = 0.0
    else:
        x = np.log(np.arange(1, v + 1, dtype=np.float64))
        y = np.log(top["n"].to_numpy(dtype=np.float64))
        slope = ((v * (x * y).sum() - x.sum() * y.sum())
                 / (v * (x * x).sum() - x.sum() ** 2))
        alpha = float(np.round(-slope, 6))
    return pa.Table.from_pandas(pd.DataFrame({
        "n_vocab": pd.Series([v], dtype="int64"),
        "alpha": pd.Series([alpha], dtype="float64"),
    }), preserve_index=False)


def source_quality_report(sf_dir: str, num_buckets: int | None = None):
    """source, n_docs, avg_chars, max_chars, n_langs: the per-source
    corpus report card — document count, mean/max length and language
    spread in ONE grouped pass (the summary table a curation run emits
    per crawl source before deciding quotas).

    Scale shape: per-batch (source, lang) partials (count / sum / max —
    all mergeable) are the in-batch combiner, one coarse-bucket
    grouped_agg merges them, and the driver finishes over the
    (sources × langs)-sized result — bounded by the source catalog,
    never the corpus."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["source", "lang", "n_chars"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "lang"], as_index=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum"), mx=("n_chars", "max")
        )

    parts = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "lang"],
        {"n": ("n", "sum"), "s": ("s", "sum"), "mx": ("mx", "max")},
    ).to_pandas()
    rep = parts.groupby("source").agg(
        n_docs=("n", "sum"), s=("s", "sum"), max_chars=("mx", "max"),
        n_langs=("lang", "size"),
    ).reset_index()
    return pa.Table.from_pandas(pd.DataFrame({
        "source": rep["source"],
        "n_docs": rep["n_docs"].astype("int64"),
        "avg_chars": (rep["s"].astype("float64") / rep["n_docs"]).round(4),
        "max_chars": rep["max_chars"].astype("int64"),
        "n_langs": rep["n_langs"].astype("int64"),
    }), preserve_index=False)


def weighted_sample_docs(sf_dir: str, k: int = 100):
    """doc_id, n_chars: a deterministic weighted sample WITHOUT
    replacement of k documents, sampling probability proportional to
    length — the Efraimidis–Spirakis A-ES scheme (each item ranked by
    ln(u)/w for u ∈ (0,1), top-k wins), with u derived from the shared
    md5 item hash instead of an RNG so the draw is reproducible across
    runs/partitionings AND fully SQL-checkable.  The weighted analogue
    of ``doc_sample`` (training pipelines sample proportional to
    quality/length when building mixtures).

    Scale shape: embarrassingly parallel scoring + per-batch head(k)
    (the combiner: the global top-k is a subset of the union of
    per-batch top-ks), so the final sort sees ≤ k rows per batch —
    never the corpus."""
    from ._util import arrow_out

    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "n_chars"]
    )

    def score_topk(df: pd.DataFrame):
        from ..functions.hashing import hash64_array

        df = df[df["n_chars"] > 0]
        h = hash64_array([str(i) for i in df["doc_id"]])
        u = h.astype(np.float64) / 18446744073709551616.0
        key = np.log(u) / df["n_chars"].to_numpy(dtype=np.float64)
        g = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype="int64"),
            "n_chars": df["n_chars"].to_numpy(dtype="int64"),
            "key": key,
        }).sort_values(["key", "doc_id"], ascending=[False, True]).head(k)
        return arrow_out(g)

    return (
        ds.map_batches(score_topk, batch_format="pandas")
        .sort(["key", "doc_id"], descending=[True, False])
        .limit(k)
        .drop_columns(["key"])
    )


def customer_activity_summary(sf_dir: str, num_buckets: int | None = None):
    """c_custkey, c_name, n_orders, total_spend, n_events, last_event_ts:
    a THREE-source cogroup on the shared customer key — the orders fact
    and the events fact each pre-aggregated per key, stitched to the
    customer dimension with LEFT-JOIN semantics (customers with no
    orders / no events keep zeros / NULL) in ONE tagged union exchange.

    Scale shape: both facts carry in-batch per-key combiners (count /
    sum / max — all mergeable), so the exchange moves at most one row
    per key per batch per side; the dimension rides the same exchange
    (no broadcast needed, covers an arbitrarily large dimension); the
    per-bucket finish is two vectorized groupbys + two left merges."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    cust = ray.data.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    orders = ray.data.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    events = ray.data.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    casts = {"name": pa.string()}

    def _frame(keys, name, n_ord, spend, n_ev, last_ts, side):
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "name": name,
            "n_ord": n_ord,
            "spend": spend,
            "n_ev": n_ev,
            "last_ts": last_ts,
            "side": side,
        }), null_casts=casts)

    def tag_cust(df: pd.DataFrame):
        keys = df["c_custkey"].to_numpy(dtype="int64")
        z = np.zeros(len(df), dtype="int64")
        return _frame(keys, df["c_name"].to_numpy(), z, z.astype("float64"),
                      z, z, "c")

    def tag_orders(df: pd.DataFrame):
        g = df.groupby("o_custkey", as_index=False).agg(
            n_ord=("o_totalprice", "size"), spend=("o_totalprice", "sum")
        )
        keys = g["o_custkey"].to_numpy(dtype="int64")
        z = np.zeros(len(g), dtype="int64")
        return _frame(keys, pd.Series([None] * len(g), dtype="object"),
                      g["n_ord"].astype("int64"), g["spend"].astype("float64"),
                      z, z, "o")

    def tag_events(df: pd.DataFrame):
        g = pd.DataFrame({
            "key": df["user_id"].to_numpy(dtype="int64"),
            "ts": df["ts"].to_numpy(dtype="datetime64[us]").astype("int64"),
        }).groupby("key", as_index=False).agg(n_ev=("ts", "size"), last_ts=("ts", "max"))
        keys = g["key"].to_numpy(dtype="int64")
        z = np.zeros(len(g), dtype="int64")
        return _frame(keys, pd.Series([None] * len(g), dtype="object"),
                      z, z.astype("float64"),
                      g["n_ev"].astype("int64"), g["last_ts"].astype("int64"), "e")

    union = (
        cust.map_batches(tag_cust, batch_format="pandas")
        .union(orders.map_batches(tag_orders, batch_format="pandas"))
        .union(events.map_batches(tag_events, batch_format="pandas"))
    )

    def cogroup(df: pd.DataFrame):
        c = df[df["side"] == "c"][["key", "name"]]
        o = df[df["side"] == "o"].groupby("key").agg(
            n_orders=("n_ord", "sum"), total_spend=("spend", "sum"))
        e = df[df["side"] == "e"].groupby("key").agg(
            n_events=("n_ev", "sum"), last=("last_ts", "max"))
        m = c.merge(o, left_on="key", right_index=True, how="left").merge(
            e, left_on="key", right_index=True, how="left")
        return arrow_out(pd.DataFrame({
            "c_custkey": m["key"].astype("int64"),
            "c_name": m["name"],
            "n_orders": m["n_orders"].fillna(0).astype("int64"),
            "total_spend": m["total_spend"].fillna(0.0).round(2),
            "n_events": m["n_events"].fillna(0).astype("int64"),
            "last_event_ts": pd.to_datetime(
                m["last"], unit="us").astype("datetime64[us]"),
        }), null_casts={"c_name": pa.string(),
                        "last_event_ts": pa.timestamp("us")})

    return union.groupby(
        "bucket", num_partitions=physical_partitions(num_buckets)
    ).map_groups(cogroup, batch_format="pandas")


def cross_source_overlap(sf_dir: str, n: int = 5, num_buckets: int | None = None):
    """source_a, source_b, n_shared: for every pair of sources, how many
    DISTINCT token ``n``-grams appear in both — the cross-crawl
    contamination matrix a curation run reads before deciding which
    source to dedup against which (a large off-diagonal cell means two
    crawls share substantial boilerplate/content; whole-document overlap
    is the degenerate case and is already covered per-doc by
    ``dedup_exact`` — shingles are the unit real contamination shows up
    at).

    Scale shape: grams hash to 64-bit keys at the scan (the shared
    ``_gram_positions`` + ``hash64_array`` idiom) and (hash, source)
    pairs are batch-deduped — the combiner — so the exchange carries
    fixed-size keys only; each hash lives wholly in one bucket, where
    pair expansion is one self-merge bounded by |sources|² per hash; the
    per-bucket partial pair counts (≤ |sources|² rows per bucket —
    output-sized) merge on the driver, so no second exchange is
    needed."""
    from ..functions.hashing import hash64_array
    from ._util import arrow_out, default_num_buckets, physical_partitions
    from .textstats import _gram_positions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["text", "source"])

    def hash_pairs(df: pd.DataFrame):
        doc_of, grams = _gram_positions(df, n)
        if len(grams):
            h = (hash64_array(list(grams)) >> np.uint64(1)).astype("int64")
            src = df["source"].to_numpy()[doc_of]
        else:
            h = np.empty(0, dtype="int64")
            src = np.empty(0, dtype=object)
        g = pd.DataFrame({"f": h, "source": src}).drop_duplicates()
        return arrow_out(
            g.assign(bucket=(g["f"] % num_buckets).astype("int32")),
            null_casts={"source": pa.string()},
        )

    def pairs_bucket(df: pd.DataFrame):
        g = df[["f", "source"]].drop_duplicates()
        m = g.merge(g, on="f", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        part = m.groupby(["source_a", "source_b"], as_index=False).agg(
            n_shared=("f", "size"))
        return arrow_out(pd.DataFrame({
            "source_a": part["source_a"],
            "source_b": part["source_b"],
            "n_shared": part["n_shared"].astype("int64"),
        }), null_casts={"source_a": pa.string(), "source_b": pa.string()})

    partials = ds.map_batches(hash_pairs, batch_format="pandas").groupby(
        "bucket", num_partitions=physical_partitions(num_buckets)
    ).map_groups(pairs_bucket, batch_format="pandas").to_pandas()
    if partials.empty or "source_a" not in partials.columns:
        partials = pd.DataFrame({
            "source_a": pd.Series([], dtype="object"),
            "source_b": pd.Series([], dtype="object"),
            "n_shared": pd.Series([], dtype="int64"),
        })
    rep = partials.groupby(["source_a", "source_b"], as_index=False).agg(
        n_shared=("n_shared", "sum"))
    return pa.Table.from_pandas(pd.DataFrame({
        "source_a": rep["source_a"],
        "source_b": rep["source_b"],
        "n_shared": rep["n_shared"].astype("int64"),
    }), preserve_index=False)


def ks_drift_stats(sf_dir: str):
    """n_train, n_valid, ks: the Kolmogorov–Smirnov statistic between the
    train and valid splits' document-length distributions — the drift
    check a pipeline runs to confirm a deterministic split didn't skew a
    feature (and, run across crawl snapshots, that the corpus itself
    hasn't drifted).  Split = ``doc_id % 10 < 8`` (train).

    Scale shape: per-batch per-length count partials (two int columns
    keyed by the length value — bounded by the distinct-length count,
    never the corpus) merge on the driver, where the two CDFs and the
    sup-gap are one vectorized cumsum over the lengths histogram."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        is_tr = (df["doc_id"] % 10 < 8).astype("int64")
        g = pd.DataFrame({
            "v": df["n_chars"].astype("int64"),
            "ct": is_tr,
            "cv": 1 - is_tr,
        }).groupby("v", as_index=False).sum()
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    c = parts.groupby("v", as_index=False).sum().sort_values("v", ignore_index=True)
    nt, nv = int(c["ct"].sum()), int(c["cv"].sum())
    f1 = c["ct"].cumsum().to_numpy(dtype=np.float64) / nt
    f2 = c["cv"].cumsum().to_numpy(dtype=np.float64) / nv
    ks = float(np.round(np.abs(f1 - f2).max(), 6)) if len(c) else 0.0
    return pa.Table.from_pandas(pd.DataFrame({
        "n_train": pd.Series([nt], dtype="int64"),
        "n_valid": pd.Series([nv], dtype="int64"),
        "ks": pd.Series([ks], dtype="float64"),
    }), preserve_index=False)


def event_props_stats(sf_dir: str):
    """event_type, n_events, sum_k, max_k: aggregate over the integer
    ``k`` field of the JSON side-data column ``events.props`` —
    semi-structured extraction, the one column family the registry
    didn't yet touch.  The field is pulled with ONE vectorized regex
    pass per batch (``Series.str.extract`` runs in C over the whole
    column; a per-row ``json.loads`` would be the per-row-Python
    anti-pattern — at 100 TB the difference is the job).  Extraction is
    null-safe: rows whose props lack ``k`` still count in ``n_events``
    and drop out of sum/max, matching SQL aggregate NULL semantics.
    The exchange then carries only (event_type, k) pairs — the JSON
    bodies never leave the scan."""
    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "events"), columns=["event_type", "props"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False),
            errors="coerce",
        )
        return pd.DataFrame({"event_type": df["event_type"], "k": k})

    agg = grouped_agg(
        ds.map_batches(derive, batch_format="pandas"),
        ["event_type"],
        {
            "n_events": ("k", "size"),
            "sum_k": ("k", "sum"),
            "max_k": ("k", "max"),
        },
    )

    def finish(df: pd.DataFrame):
        # match the oracle's coalesce(CAST(.. AS BIGINT), 0): an
        # all-null group sums/maxes to NaN here and NULL there
        from ._util import arrow_out

        return arrow_out(
            df.assign(
                sum_k=df["sum_k"].fillna(0).astype("int64"),
                max_k=df["max_k"].fillna(0).astype("int64"),
            )
        )

    return agg.map_batches(finish, batch_format="pandas")


def revenue_forecast(sf_dir: str):
    """revenue, n_items (one row): TPC-H Q6's shape — a pure
    filter-pushdown scan plus global scalar aggregate: what-if revenue
    from discounted small-quantity 1997 lineitems.  All three predicates
    ride into ``read_parquet(filter=...)`` so row groups that can't
    match never leave storage, the three needed columns are the only
    ones read, each batch reduces to a two-scalar partial, and the
    driver merges #blocks partial rows — nothing corpus-sized crosses
    an exchange and there is no shuffle at all."""
    import datetime as _dt

    flt = (
        (pc.field("l_shipdate") >= _dt.datetime(1997, 1, 1))
        & (pc.field("l_shipdate") < _dt.datetime(1998, 1, 1))
        & (pc.field("l_discount") >= 0.05)
        & (pc.field("l_discount") <= 0.07)
        & (pc.field("l_quantity") < 24.0)
    )
    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=flt,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "revenue": [float((df["l_extendedprice"] * df["l_discount"]).sum())],
                "n_items": [np.int64(len(df))],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return pa.Table.from_pandas(
        pd.DataFrame(
            {
                "revenue": pd.Series([round(float(parts["revenue"].sum()), 2)], dtype="float64"),
                "n_items": pd.Series([int(parts["n_items"].sum())], dtype="int64"),
            }
        ),
        preserve_index=False,
    )


def event_value_trend(sf_dir: str):
    """event_type, n, slope, intercept: per-type ordinary-least-squares
    trend of event value against time (hours since 2024-01-01) — the
    grouped-regression shape.  Classic mergeable-moments pattern: each
    batch reduces its rows to per-type sufficient statistics
    (n, Σx, Σy, Σx², Σxy) with ONE vectorized pandas groupby, the
    exchange carries only those 5-number partials (|types| rows per
    batch, never the events), and the per-group finish solves the
    normal equations.  The fixed origin keeps x small so the raw-moment
    formula (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) is well-conditioned and
    bit-agrees with the oracle's identical formula at round(6)."""
    from ._agg import grouped_agg
    from ._util import arrow_out

    origin_us = np.int64(1704067200000000)  # 2024-01-01T00:00:00Z in µs
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_type", "ts", "value"]
    )

    def partial(df: pd.DataFrame):
        x = (
            df["ts"].to_numpy(dtype="datetime64[us]").astype("int64") - origin_us
        ) / 3.6e9  # µs -> hours
        y = df["value"].to_numpy(dtype="float64")
        g = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "n": np.int64(1),
                    "sx": x,
                    "sy": y,
                    "sxx": x * x,
                    "sxy": x * y,
                }
            )
            .groupby("event_type", as_index=False)
            .sum()
        )
        return arrow_out(g)

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {
            "n": ("n", "sum"),
            "sx": ("sx", "sum"),
            "sy": ("sy", "sum"),
            "sxx": ("sxx", "sum"),
            "sxy": ("sxy", "sum"),
        },
    )

    def finish(df: pd.DataFrame):
        from ._util import arrow_out as _ao

        n = df["n"].to_numpy(dtype="float64")
        sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
        sxx, sxy = df["sxx"].to_numpy(), df["sxy"].to_numpy()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return _ao(
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "n": df["n"].astype("int64"),
                    "slope": np.round(slope, 6),
                    "intercept": np.round(intercept, 4),
                }
            )
        )

    return agg.map_batches(finish, batch_format="pandas")


def lineitem_correlations(sf_dir: str):
    """col_a, col_b, n, corr: Pearson correlation for every pair of the
    four lineitem numeric measures — the feature-correlation-matrix
    shape over a fact table.  Single scan, no shuffle: each batch
    reduces to one row of raw moments (n, Σxᵢ, Σxᵢ², Σxᵢxⱼ for all
    pairs), the driver merges #blocks such rows (bounded by block
    count, not data size) and emits the 6-row matrix."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    ds = ray.data.read_parquet(_p(sf_dir, "lineitem"), columns=cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {"n": [np.int64(len(df))]}
        arrs = {c: df[c].to_numpy(dtype="float64") for c in cols}
        for c in cols:
            out[f"s_{c}"] = [arrs[c].sum()]
            out[f"ss_{c}"] = [(arrs[c] * arrs[c]).sum()]
        for a, b in pairs:
            out[f"sp_{a}__{b}"] = [(arrs[a] * arrs[b]).sum()]
        return pd.DataFrame(out)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.sum()
    n = float(m["n"])
    rows = []
    for a, b in pairs:
        cov = n * m[f"sp_{a}__{b}"] - m[f"s_{a}"] * m[f"s_{b}"]
        va = n * m[f"ss_{a}"] - m[f"s_{a}"] ** 2
        vb = n * m[f"ss_{b}"] - m[f"s_{b}"] ** 2
        rows.append((a, b, int(n), round(float(cov / np.sqrt(va * vb)), 6)))
    return pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["col_a", "col_b", "n", "corr"]).astype(
            {"n": "int64", "corr": "float64"}
        ),
        preserve_index=False,
    )


def session_type_affinity(sf_dir: str, num_buckets: int | None = None):
    """type_a, type_b, n_both, lift: market-basket affinity between
    event types that co-occur inside the same user-hour session — the
    set-pair-mining shape (association rules over baskets).  lift =
    n_sessions · n_both / (n_a · n_b), where n_a counts sessions
    containing type a.

    Scale shape: each batch first dedupes to (user, hour, type) triples
    — the basket combiner — then ONE hash exchange on (user, hour)
    colocates every basket; per bucket, a vectorized self-merge expands
    pairs (bounded by |types|² per basket, 25 here) and reduces to
    tagged partials (≤ |types|² pair rows + |types| type rows + one
    session-count row per bucket), so the driver merges O(P·|types|²)
    rows — never the events."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )

    def tag(df: pd.DataFrame):
        t = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(dtype="int64"),
                # datetime64[h] truncation == date_trunc('hour', ts)
                "h": df["ts"].to_numpy(dtype="datetime64[h]").astype("int64"),
                "event_type": df["event_type"],
            }
        ).drop_duplicates()
        key = pd.util.hash_pandas_object(t[["user_id", "h"]], index=False)
        return arrow_out(t.assign(bucket=(key % num_buckets).astype("int32")))

    def bucket_fn(df: pd.DataFrame):
        t = df.drop_duplicates(["user_id", "h", "event_type"])
        n_sessions = len(t[["user_id", "h"]].drop_duplicates())
        types = t.groupby("event_type", as_index=False).agg(n=("h", "size"))
        m = t.merge(t, on=["user_id", "h"])
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = m.groupby(["event_type_x", "event_type_y"], as_index=False).agg(
            n=("h", "size")
        )
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "kind": "pair",
                        "type_a": pairs["event_type_x"],
                        "type_b": pairs["event_type_y"],
                        "n": pairs["n"].astype("int64"),
                    }
                ),
                pd.DataFrame(
                    {
                        "kind": "type",
                        "type_a": types["event_type"],
                        "type_b": "",
                        "n": types["n"].astype("int64"),
                    }
                ),
                pd.DataFrame(
                    {"kind": "sess", "type_a": [""], "type_b": [""],
                     "n": pd.Series([n_sessions], dtype="int64")}
                ),
            ],
            ignore_index=True,
        )
        return arrow_out(
            out,
            null_casts={
                "kind": pa.string(), "type_a": pa.string(), "type_b": pa.string()
            },
        )

    partials = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(bucket_fn, batch_format="pandas")
        .to_pandas()
    )
    n_sessions = int(partials.loc[partials["kind"] == "sess", "n"].sum())
    type_n = (
        partials[partials["kind"] == "type"]
        .groupby("type_a")["n"].sum()
    )
    p = (
        partials[partials["kind"] == "pair"]
        .groupby(["type_a", "type_b"], as_index=False)["n"].sum()
    )
    lift = (
        p["n"].to_numpy(dtype="float64")
        * n_sessions
        / (type_n[p["type_a"]].to_numpy(dtype="float64")
           * type_n[p["type_b"]].to_numpy(dtype="float64"))
    )
    return pa.Table.from_pandas(
        pd.DataFrame(
            {
                "type_a": p["type_a"],
                "type_b": p["type_b"],
                "n_both": p["n"].astype("int64"),
                "lift": np.round(lift, 6),
            }
        ),
        preserve_index=False,
    )


def _ed_le_1(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 check for two DISTINCT strings (verifier
    for the deletion-neighborhood candidates; runs only on the
    candidate set, which blocking keeps output-sized)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b = a with one char inserted: split at first mismatch
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def fuzzy_name_pairs(sf_dir: str, num_buckets: int | None = None):
    """name_a, name_b, dist: all pairs of distinct part names within
    edit distance 1 — the string-similarity join (EDJoin family).
    Candidate generation is deletion-neighborhood blocking: two strings
    u, v with ED(u,v) ≤ 1 necessarily share a key in
    {s} ∪ {s with one char deleted} (substitution: delete the differing
    position from both; insert/delete: the deletion variant equals the
    shorter string), so grouping on those keys is recall-complete and
    the O(n²) all-pairs scan never happens.

    Scale shape: key generation is vectorized per deletion POSITION
    (one pandas str-slice pass per position over the batch's distinct
    names — never a per-row loop), keyed rows are batch-deduped before
    ONE hash-bucketed exchange, per-bucket self-merge yields candidates
    bounded by the neighborhood collision rate, and the exact ≤1
    verifier runs only on that candidate set.  Cross-bucket duplicate
    pairs (one pair can share several keys) are deduped on the
    output-sized pair table; at corpus scale that dedup becomes one
    more hash exchange on the pair key (the neardup_pairs convention)."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(_p(sf_dir, "part"), columns=["p_name"])

    def tag(df: pd.DataFrame):
        names = pd.Series(pd.unique(df["p_name"].dropna())).astype(str)
        frames = [pd.DataFrame({"key": names, "name": names})]
        maxlen = int(names.str.len().max()) if len(names) else 0
        for i in range(maxlen):
            sel = names[names.str.len() > i]
            frames.append(
                pd.DataFrame(
                    {"key": sel.str.slice(0, i) + sel.str.slice(i + 1), "name": sel}
                )
            )
        t = pd.concat(frames, ignore_index=True).drop_duplicates()
        h = pd.util.hash_pandas_object(t["key"], index=False)
        return arrow_out(
            t.assign(bucket=(h % num_buckets).astype("int32")),
            null_casts={"key": pa.string(), "name": pa.string()},
        )

    def bucket_fn(df: pd.DataFrame):
        t = df.drop_duplicates(["key", "name"])
        m = t.merge(t, on="key")
        cand = m[m["name_x"] < m["name_y"]][["name_x", "name_y"]].drop_duplicates()
        keep = [
            _ed_le_1(a, b) for a, b in zip(cand["name_x"], cand["name_y"])
        ]
        out = cand[np.asarray(keep, dtype=bool)] if len(cand) else cand
        return arrow_out(
            pd.DataFrame({"name_a": out["name_x"], "name_b": out["name_y"]}),
            null_casts={"name_a": pa.string(), "name_b": pa.string()},
        )

    pairs = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(bucket_fn, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(ignore_index=True)
    )
    return pa.Table.from_pandas(
        pairs.assign(dist=np.ones(len(pairs), dtype="int64")),
        preserve_index=False,
    )


def promo_revenue_monthly(sf_dir: str, promo_prefix: str = "PROMO"):
    """month, promo_revenue: per ship-month percentage of discounted
    revenue that came from promo-type parts — TPC-H Q14's shape: a
    conditional-ratio aggregate over a fact ⋈ small-dimension join.

    Scale shape: the part dimension reduces to the SET of promo partkeys
    (one int64 per promo part), broadcast once with ``ray.put`` and
    probed per batch with ``np.isin`` — the fact table never shuffles
    for the join.  The per-batch (month, promo_rev, total_rev) partial
    is the in-batch combiner, bounded by the calendar (≤ |months| rows
    per batch), so the driver-side reduce sees months-sized data only."""
    from ._util import arrow_out

    import pyarrow.parquet as pq

    part = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey", "p_type"])
    types = np.asarray(part.column("p_type").to_pylist())
    keys = part.column("p_partkey").to_numpy()
    promo_ref = ray.put(np.sort(keys[np.char.startswith(types, promo_prefix)]))

    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame):
        promo = ray.get(promo_ref)
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        is_promo = np.isin(df["l_partkey"].to_numpy(), promo)
        g = pd.DataFrame({
            "month": df["l_shipdate"].dt.strftime("%Y-%m"),
            "promo_rev": np.where(is_promo, rev, 0.0),
            "total_rev": rev,
        }).groupby("month", as_index=False).sum()
        return arrow_out(g)

    parts = items.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.groupby("month", as_index=False).sum()
    m["promo_revenue"] = (100.0 * m["promo_rev"] / m["total_rev"]).round(4)
    return pa.Table.from_pandas(
        m[["month", "promo_revenue"]], preserve_index=False
    )


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#12",
                           fraction: float = 0.2,
                           num_buckets: int | None = None):
    """yearly_revenue (one row): total extended price of lineitems whose
    quantity is below ``fraction`` × the PART's OWN average quantity,
    for parts of one brand, scaled to a yearly figure (÷ 7) — TPC-H
    Q17's shape: a correlated per-group average consumed by a filter on
    the same group's rows (the "small-order long tail" revenue probe).

    Scale shape: the brand predicate reduces part to a small partkey
    set, broadcast via ``ray.put`` and probed per batch with
    ``np.isin`` — the fact read drops every non-brand row before the
    exchange.  Surviving rows bucket-exchange ON partkey so each
    group's average and its conditional sum are computed together in
    one ``map_groups`` pass (the correlated subquery never re-scans);
    the finish emits one partial sum per bucket, reduced to the single
    output row on the driver."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    import pyarrow.parquet as pq

    num_buckets = num_buckets or default_num_buckets()
    part = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    mask = pc.equal(part.column("p_brand"), brand)
    keys_ref = ray.put(np.sort(part.filter(mask).column("p_partkey").to_numpy()))

    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def keep_brand(df: pd.DataFrame):
        keys = ray.get(keys_ref)
        sub = df[np.isin(df["l_partkey"].to_numpy(), keys)]
        return arrow_out(pd.DataFrame({
            "key": sub["l_partkey"].to_numpy(dtype="int64"),
            "bucket": (sub["l_partkey"].to_numpy(dtype="int64")
                       % num_buckets).astype("int32"),
            "qty": sub["l_quantity"].to_numpy(),
            "price": sub["l_extendedprice"].to_numpy(),
        }))

    def per_part(df: pd.DataFrame):
        # per-group avg and the conditional sum in one pass; quantities
        # are integral doubles so group sums (and hence the avg) are
        # exact and the < comparison is deterministic on both engines
        avg = df.groupby("key")["qty"].transform("mean")
        small = df[df["qty"] < fraction * avg]
        return arrow_out(pd.DataFrame({
            "partial": [float(small["price"].sum())]
        }))

    partials = (
        items.map_batches(keep_brand, batch_format="pandas")
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    total = float(partials["partial"].sum()) if len(partials) else 0.0
    return pa.table({"yearly_revenue": [round(total / 7.0, 2)]})


def large_order_customers(sf_dir: str, min_qty: float = 250.0,
                          num_buckets: int | None = None):
    """c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty:
    orders whose TOTAL lineitem quantity exceeds ``min_qty``, with their
    customer — TPC-H Q18's shape: a grouped HAVING filter feeding a
    partitioned join, with the small dimension attached by broadcast.

    Scale shape: the lineitem side pre-reduces to (orderkey, qty-sum)
    per batch — the in-batch combiner — so the orderkey exchange never
    carries raw lineitems; each bucket re-reduces, applies the HAVING
    threshold (orderkey lives wholly in its bucket, so the filter is
    exact), and joins the co-bucketed orders rows; customer names
    attach via one ``ray.put`` map.  Output is HAVING-selected (rare
    giant orders), so the tail is result-sized."""
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"]
    )

    def tag_orders(df: pd.DataFrame):
        keys = df["o_orderkey"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "custkey": df["o_custkey"].to_numpy(dtype="int64"),
            "odate": df["o_orderdate"].to_numpy(dtype="datetime64[us]").astype("int64"),
            "price": df["o_totalprice"].to_numpy(),
            "qty": np.zeros(len(df)),
            "side": "o",
        }))

    def tag_items(df: pd.DataFrame):
        g = (
            pd.DataFrame({
                "key": df["l_orderkey"].to_numpy(dtype="int64"),
                "qty": df["l_quantity"].to_numpy(),
            }).groupby("key", as_index=False)["qty"].sum()
        )
        keys = g["key"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "custkey": np.zeros(len(g), dtype="int64"),
            "odate": np.zeros(len(g), dtype="int64"),
            "price": np.zeros(len(g)),
            "qty": g["qty"].to_numpy(),
            "side": "l",
        }))

    def having_join(df: pd.DataFrame):
        l = df[df["side"] == "l"].groupby("key", as_index=False)["qty"].sum()
        big = l[l["qty"] > min_qty]
        o = df[df["side"] == "o"][["key", "custkey", "odate", "price"]]
        m = big.merge(o, on="key", how="inner")
        return arrow_out(pd.DataFrame({
            "c_custkey": m["custkey"].astype("int64"),
            "o_orderkey": m["key"].astype("int64"),
            "o_orderdate": m["odate"].astype("datetime64[us]"),
            "o_totalprice": m["price"],
            "sum_qty": m["qty"].round(2),
        }))

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        items.map_batches(tag_items, batch_format="pandas")
    )
    winners = both.groupby(
        "bucket", num_partitions=physical_partitions(num_buckets)
    ).map_groups(having_join, batch_format="pandas")

    import pyarrow.parquet as pq

    cust = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    name_ref = ray.put(dict(zip(
        cust.column("c_custkey").to_pylist(), cust.column("c_name").to_pylist()
    )))

    def attach_name(df: pd.DataFrame):
        names = ray.get(name_ref)
        return arrow_out(
            df.assign(c_name=df["c_custkey"].map(names))[
                ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice", "sum_qty"]
            ],
            null_casts={"c_name": pa.string()},
        )

    return winners.map_batches(attach_name, batch_format="pandas")


def idle_rich_customers(sf_dir: str, priority: str = "1-URGENT",
                        num_buckets: int | None = None):
    """nation, n_cust, total_acctbal: per-nation count and balance of
    customers whose balance beats the GLOBAL positive-balance average
    but who never placed an order of the given priority — TPC-H Q22's
    shape: an uncorrelated scalar subquery consumed as a filter, an
    anti-join, and a grouped aggregate in one plan.

    Scale shape: the scalar average reduces per batch to one (sum, n)
    partial — two doubles per batch, merged on the driver and rebroadcast
    as plain Python floats in the closure; the anti-join bucket-exchanges
    custkeys with the order side pre-reduced to its in-batch DISTINCT
    custkey set (and pre-filtered by parquet predicate pushdown on the
    priority); each bucket emits per-nation partials, so the final
    nation aggregate is dimension-sized."""
    from ._agg import grouped_agg
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]

    # pass 1: global scalar — avg of positive balances (two-double partials)
    scalars = ray.data.read_parquet(
        _p(sf_dir, "customer"), columns=["c_acctbal"]
    ).map_batches(
        lambda df: pd.DataFrame({
            "s": [df.loc[df["c_acctbal"] > 0, "c_acctbal"].sum()],
            "n": [int((df["c_acctbal"] > 0).sum())],
        }),
        batch_format="pandas",
    ).to_pandas()
    avg_bal = float(scalars["s"].sum()) / max(1, int(scalars["n"].sum()))

    cust = ray.data.read_parquet(_p(sf_dir, "customer"), columns=cust_cols)
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey"],
        filter=(pc.field("o_orderpriority") == priority),
    )

    def tag_cust(df: pd.DataFrame):
        sub = df[df["c_acctbal"] > avg_bal]
        keys = sub["c_custkey"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "nationkey": sub["c_nationkey"].to_numpy(dtype="int64"),
            "acctbal": sub["c_acctbal"].to_numpy(),
            "side": "c",
        }))

    def tag_orders(df: pd.DataFrame):
        keys = np.unique(df["o_custkey"].to_numpy(dtype="int64"))
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "nationkey": np.zeros(len(keys), dtype="int64"),
            "acctbal": np.zeros(len(keys)),
            "side": "o",
        }))

    def anti_bucket(df: pd.DataFrame):
        present = set(df.loc[df["side"] == "o", "key"])
        c = df[df["side"] == "c"]
        keep = c[~c["key"].isin(present)]
        part = keep.groupby("nationkey", as_index=False).agg(
            n_cust=("key", "size"), total_acctbal=("acctbal", "sum")
        )
        return arrow_out(part)

    partials = (
        cust.map_batches(tag_cust, batch_format="pandas")
        .union(orders.map_batches(tag_orders, batch_format="pandas"))
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(anti_bucket, batch_format="pandas")
    )
    totals = grouped_agg(
        partials, ["nationkey"],
        {"n_cust": ("n_cust", "sum"), "total_acctbal": ("total_acctbal", "sum")},
    )

    import pyarrow.parquet as pq

    nat = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nat_ref = ray.put(dict(zip(
        nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()
    )))

    def attach_nation(df: pd.DataFrame):
        names = ray.get(nat_ref)
        return arrow_out(pd.DataFrame({
            "nation": df["nationkey"].map(names),
            "n_cust": df["n_cust"].astype("int64"),
            "total_acctbal": df["total_acctbal"].round(2),
        }), null_casts={"nation": pa.string()})

    return totals.map_batches(attach_nation, batch_format="pandas")


def order_count_distribution(sf_dir: str, num_buckets: int | None = None):
    """n_orders, n_customers: how many customers placed exactly k orders,
    INCLUDING the zero bucket — TPC-H Q13's shape: a LEFT OUTER join
    grouped twice (per-customer counts, then the distribution of those
    counts).  Composes ``customer_order_counts`` (the outer-join count
    pass, custkey-bucketed with in-batch combiners) with one more
    dimension-sized ``grouped_agg``: the second level's key cardinality
    is the max order count, so its exchange is trivially small."""
    from ._agg import grouped_agg

    counts = customer_order_counts(sf_dir, num_buckets=num_buckets)
    return grouped_agg(
        counts.select_columns(["c_custkey", "n_orders"]),
        ["n_orders"],
        {"n_customers": ("c_custkey", "size")},
    )


def nation_trade_volume(sf_dir: str, num_buckets: int | None = None):
    """supp_nation, cust_nation, l_year, revenue: cross-border shipped
    revenue per (supplier nation, customer nation, ship year) — TPC-H
    Q7's shape: the same dimension playing TWO ROLES (nation via the
    supplier on one side, via the customer on the other) across a
    fact⋈fact join, grouped by a derived calendar key.

    Scale shape: supplier⋈nation composes driver-side into one
    broadcast suppkey→nation dict (dimension-sized); the customer side
    is NOT broadcast — lineitem⋈orders co-locate per orderkey bucket
    (exchange 1, revenue pre-reduced per (orderkey, supp_nation, year)
    in the batch combiner), then the custkey-keyed partials co-locate
    with customer rows per custkey bucket (exchange 2, same union-tag
    pattern).  Each bucket emits ≤ |nations|²·|years| partial rows, so
    the final grouped_agg is dimension-bounded."""
    from ._agg import grouped_agg
    from ._util import arrow_out, default_num_buckets, physical_partitions

    import pyarrow.parquet as pq

    num_buckets = num_buckets or default_num_buckets()
    nat = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nat_map = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    sup = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    supp_ref = ray.put({
        int(k): nat_map[n] for k, n in zip(
            sup.column("s_suppkey").to_pylist(),
            sup.column("s_nationkey").to_pylist())
    })
    nat_ref = ray.put(nat_map)

    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )
    casts = {"supp_nation": pa.string()}

    def tag_items(df: pd.DataFrame):
        smap = ray.get(supp_ref)
        g = pd.DataFrame({
            "key": df["l_orderkey"].to_numpy(dtype="int64"),
            "supp_nation": df["l_suppkey"].map(smap),
            "l_year": df["l_shipdate"].dt.year.astype("int64"),
            "revenue": (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy(),
        }).groupby(["key", "supp_nation", "l_year"], as_index=False)["revenue"].sum()
        return arrow_out(pd.DataFrame({
            "key": g["key"],
            "bucket": (g["key"] % num_buckets).astype("int32"),
            "supp_nation": g["supp_nation"],
            "l_year": g["l_year"],
            "revenue": g["revenue"],
            "custkey": np.zeros(len(g), dtype="int64"),
            "side": "l",
        }), null_casts=casts)

    def tag_orders(df: pd.DataFrame):
        keys = df["o_orderkey"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "supp_nation": pd.Series([None] * len(df), dtype="object"),
            "l_year": np.zeros(len(df), dtype="int64"),
            "revenue": np.zeros(len(df)),
            "custkey": df["o_custkey"].to_numpy(dtype="int64"),
            "side": "o",
        }), null_casts=casts)

    def join_orderkey(df: pd.DataFrame):
        l = df[df["side"] == "l"][["key", "supp_nation", "l_year", "revenue"]]
        o = df[df["side"] == "o"][["key", "custkey"]]
        m = l.merge(o, on="key", how="inner")
        g = m.groupby(["custkey", "supp_nation", "l_year"],
                      as_index=False)["revenue"].sum()
        return arrow_out(pd.DataFrame({
            "key": g["custkey"].astype("int64"),
            "bucket": (g["custkey"].to_numpy(dtype="int64")
                       % num_buckets).astype("int32"),
            "supp_nation": g["supp_nation"],
            "l_year": g["l_year"],
            "revenue": g["revenue"],
            "nationkey": np.zeros(len(g), dtype="int64"),
            "side": "l",
        }), null_casts=casts)

    def tag_cust(df: pd.DataFrame):
        keys = df["c_custkey"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "key": keys,
            "bucket": (keys % num_buckets).astype("int32"),
            "supp_nation": pd.Series([None] * len(df), dtype="object"),
            "l_year": np.zeros(len(df), dtype="int64"),
            "revenue": np.zeros(len(df)),
            "nationkey": df["c_nationkey"].to_numpy(dtype="int64"),
            "side": "c",
        }), null_casts=casts)

    def join_custkey(df: pd.DataFrame):
        names = ray.get(nat_ref)
        l = df[df["side"] == "l"][["key", "supp_nation", "l_year", "revenue"]]
        c = df[df["side"] == "c"][["key", "nationkey"]]
        m = l.merge(c, on="key", how="inner")
        m["cust_nation"] = m["nationkey"].map(names)
        m = m[m["supp_nation"] != m["cust_nation"]]
        g = m.groupby(["supp_nation", "cust_nation", "l_year"],
                      as_index=False)["revenue"].sum()
        return arrow_out(g, null_casts={"supp_nation": pa.string(),
                                        "cust_nation": pa.string()})

    cust = ray.data.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    stage1 = (
        items.map_batches(tag_items, batch_format="pandas")
        .union(orders.map_batches(tag_orders, batch_format="pandas"))
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(join_orderkey, batch_format="pandas")
    )
    partials = (
        stage1.union(cust.map_batches(tag_cust, batch_format="pandas"))
        .groupby("bucket", num_partitions=physical_partitions(num_buckets))
        .map_groups(join_custkey, batch_format="pandas")
    )
    totals = grouped_agg(
        partials, ["supp_nation", "cust_nation", "l_year"],
        {"revenue": ("revenue", "sum")},
    )
    # round to 4, not 2: each term price*(1-disc) has exactly 4 decimal
    # digits, so the group sum is a 4-decimal lattice point and round(4)
    # recovers it exactly on both engines regardless of summation order —
    # while round(2) sits ON the half boundary for the ~0.5% of groups
    # ending in .xx5 and flips with the partial-sum order (measured: 8 of
    # 1581 groups at sf0.001)
    return totals.map_batches(
        lambda df: arrow_out(df.assign(revenue=df["revenue"].round(4))),
        batch_format="pandas",
    )


def top_supplier_revenue(sf_dir: str,
                         start: str = "1997-01-01", end: str = "1997-07-01"):
    """s_suppkey, s_name, total_revenue: the supplier(s) whose shipped
    revenue over the window equals the GLOBAL maximum — TPC-H Q15's
    shape: an aggregate consumed by an equality filter against its own
    maximum (the reference implements it as a view + scalar subquery).

    Scale shape: the date window pushes into the parquet read; per-batch
    (suppkey, revenue) partials are the combiner; the per-supplier
    aggregate is supplier-dimension-sized, so materializing it to take
    the max and filter the winners is bounded by the dimension, never
    the fact table; names attach from one broadcast-free driver-side
    dict (the winner set is tiny)."""
    from ._agg import grouped_agg

    lo, hi = np.datetime64(start, "us"), np.datetime64(end, "us")
    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi)),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"],
            "revenue": (df["l_extendedprice"] * (1 - df["l_discount"])),
        }).groupby("l_suppkey", as_index=False)["revenue"].sum()

    per_supp = grouped_agg(
        items.map_batches(partial, batch_format="pandas"),
        ["l_suppkey"], {"revenue": ("revenue", "sum")},
    ).to_pandas()  # supplier-dimension-sized: bounded materialization
    if len(per_supp) == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue": pa.array([], pa.float64())})
    winners = per_supp[per_supp["revenue"] == per_supp["revenue"].max()]

    import pyarrow.parquet as pq

    sup = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    names = dict(zip(sup.column("s_suppkey").to_pylist(),
                     sup.column("s_name").to_pylist()))
    out = pd.DataFrame({
        "s_suppkey": winners["l_suppkey"].astype("int64"),
        "s_name": winners["l_suppkey"].map(names),
        "total_revenue": winners["revenue"].round(4),  # 4-decimal-exact sum: lossless
    }).sort_values("s_suppkey", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# Q19's OR-of-ANDs predicate bank: (brand, max size, qty lo, qty hi);
# sizes start at 1, quantities are inclusive bounds
_Q19_RULES = (
    ("Brand#12", 20, 1.0, 20.0),
    ("Brand#23", 30, 10.0, 35.0),
    ("Brand#34", 40, 20.0, 50.0),
)


def disjunctive_predicate_revenue(sf_dir: str):
    """revenue, n_items (one row): discounted revenue of lineitems
    matching ANY of three (brand, size-range, quantity-range)
    conjunctions — TPC-H Q19's shape: a disjunction of multi-table
    conjunctions, where no single predicate can push into either scan
    and the join must evaluate the OR across both sides' attributes.

    Scale shape: the part attributes needed by the predicate (brand id,
    size) broadcast once as flat arrays keyed by sorted partkey
    (dimension-sized); each lineitem batch resolves its partkeys with
    one ``np.searchsorted`` and evaluates the OR-of-ANDs fully
    vectorized; output partials are two scalars per batch."""
    from ._util import arrow_out

    import pyarrow.parquet as pq

    part = pq.read_table(_p(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy()
    order = np.argsort(pk)
    brands = np.asarray(part.column("p_brand").to_pylist())[order]
    brand_ids = np.full(len(brands), -1, dtype=np.int8)
    for i, (b, _, _, _) in enumerate(_Q19_RULES):
        brand_ids[brands == b] = i
    attrs_ref = ray.put((
        pk[order],
        brand_ids,
        part.column("p_size").to_numpy().astype("int64")[order],
    ))

    items = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame):
        keys, bid, size = ray.get(attrs_ref)
        idx = np.searchsorted(keys, df["l_partkey"].to_numpy())
        b, s = bid[idx], size[idx]
        q = df["l_quantity"].to_numpy()
        keep = np.zeros(len(df), dtype=bool)
        for i, (_, max_size, qlo, qhi) in enumerate(_Q19_RULES):
            keep |= (b == i) & (s <= max_size) & (q >= qlo) & (q <= qhi)
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        return arrow_out(pd.DataFrame({
            "r": [float(rev[keep].sum())], "n": [int(keep.sum())]
        }))

    parts = items.map_batches(partial, batch_format="pandas").to_pandas()
    return pa.table({
        "revenue": [round(float(parts["r"].sum()), 4)],  # 4-decimal-exact sum: lossless
        "n_items": [int(parts["n"].sum())],
    })


def _pr_type_node(t: str) -> int:
    """Stable negative int64 node id for an event-type vertex (user
    vertices keep their non-negative user_id)."""
    h = int.from_bytes(
        hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
    )
    return -1 - (h >> 1)


def pagerank_user_types(sf_dir: str, iters: int = 15, damping: float = 0.85,
                        num_buckets: int | None = None):
    """node, rank: PageRank over the bipartite user↔event-type
    interaction graph (an edge per DISTINCT (user, type) pair) — the
    iterative broadcast-free matvec pattern: every round attaches the
    current rank vector to the edge list by a hash-partitioned lookup
    join and re-aggregates per destination.  Complements kmeans
    (iterative BROADCAST state) and labelprop (iterative min-semiring):
    this is the sum-semiring with per-node normalization.

    Scale shape: edges dedup per batch (combiner) then globally in one
    grouped exchange (the edge set is bounded by |users|×|types|, never
    by event volume); degrees compute once; each of the ``iters`` rounds
    is one ``_bucketed_attach`` + one grouped sum — O(iters) bounded
    exchanges, the rank vector never lands on the driver until the
    node-sized output.  The type-name reverse map is read from the
    deduped edge table, NOT a second corpus scan."""
    from ._agg import grouped_agg
    from ._util import arrow_out, default_num_buckets
    from .dedup import _bucketed_attach

    num_buckets = num_buckets or default_num_buckets()
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_type"]
    )

    def edge_batch(df: pd.DataFrame):
        g = df[["user_id", "event_type"]].drop_duplicates()
        return arrow_out(pd.DataFrame({
            "a": g["user_id"].to_numpy(dtype="int64"),
            "b": [_pr_type_node(t) for t in g["event_type"]],
            "type_str": g["event_type"].to_numpy(),
        }), null_casts={"type_str": pa.string()})

    edges = grouped_agg(
        ds.map_batches(edge_batch, batch_format="pandas"),
        ["a", "b", "type_str"], {"n": ("a", "size")},
        num_partitions=num_buckets,
    ).drop_columns(["n"]).materialize()

    # reverse map for the output, from the BOUNDED edge table
    type_names = {
        int(r["b"]): str(r["type_str"])
        for r in edges.select_columns(["b", "type_str"]).take_all()
    }

    def sym(df: pd.DataFrame):
        a = df["a"].to_numpy(dtype="int64")
        b = df["b"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "src": np.concatenate([a, b]), "dst": np.concatenate([b, a]),
        }))

    sym_edges = edges.map_batches(sym, batch_format="pandas").materialize()
    degrees = grouped_agg(
        sym_edges, ["src"], {"deg": ("dst", "size")},
        num_partitions=num_buckets,
    ).materialize()
    n_nodes = degrees.count()

    # out-degree rides on the edge list once; ranks re-attach per round
    edges_deg = _bucketed_attach(
        sym_edges, degrees, key_col="src", src_key="src", src_val="deg",
        out_col="src_deg", num_buckets=num_buckets,
        pair_fill={"src": -(1 << 62), "dst": -(1 << 62)}, val_type=pa.int64(),
    ).materialize()

    r0 = 1.0 / n_nodes
    ranks = degrees.map_batches(
        lambda df: arrow_out(pd.DataFrame({
            "src": df["src"].to_numpy(dtype="int64"),
            "rank": np.full(len(df), r0),
        })),
        batch_format="pandas",
    ).materialize()
    base = (1.0 - damping) / n_nodes

    def contrib(df: pd.DataFrame):
        return arrow_out(pd.DataFrame({
            "dst": df["dst"].to_numpy(dtype="int64"),
            "c": df["src_rank"].to_numpy() / df["src_deg"].to_numpy(),
        }))

    for _ in range(iters):
        attached = _bucketed_attach(
            edges_deg, ranks, key_col="src", src_key="src", src_val="rank",
            out_col="src_rank", num_buckets=num_buckets,
            pair_fill={"src": -(1 << 62), "dst": -(1 << 62), "src_deg": 0},
            val_type=pa.float64(),
        )
        sums = grouped_agg(
            attached.map_batches(contrib, batch_format="pandas"),
            ["dst"], {"s": ("c", "sum")}, num_partitions=num_buckets,
        )
        ranks = sums.map_batches(
            lambda df: arrow_out(pd.DataFrame({
                "src": df["dst"].to_numpy(dtype="int64"),
                "rank": base + damping * df["s"].to_numpy(),
            })),
            batch_format="pandas",
        ).materialize()

    def name_nodes(df: pd.DataFrame):
        ids = df["src"].to_numpy(dtype="int64")
        names = [
            f"t:{type_names[int(i)]}" if i < 0 else f"u:{int(i)}" for i in ids
        ]
        return arrow_out(pd.DataFrame({
            "node": names, "rank": df["rank"].round(9),
        }), null_casts={"node": pa.string()})

    return ranks.map_batches(name_nodes, batch_format="pandas")
