"""Mergeable-sketch aggregates.

The scale pattern for distinct-counting: each batch emits ONE serialized
sketch (here HyperLogLog, Flajolet et al. 2007), a tiny merge stage ORs
the registers, and the cardinality estimate comes from the merged sketch
— no shuffle ever sees individual keys.  Deterministic (md5 item
hashes, no process-dependent state).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

import ray.data


class HyperLogLog:
    """Plain HLL with 2^p registers and the standard bias corrections."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized register update from 64-bit item hashes."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (hashes << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        ranks = np.zeros(len(hashes), dtype=np.uint8)
        work = rest.copy()
        bit = np.uint64(1) << np.uint64(63)
        for r in range(1, 64 - self.p + 2):
            mask = (work & bit).astype(bool)
            ranks[(ranks == 0) & mask] = r
            work = work << np.uint64(1)
            if (ranks != 0).all():
                break
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.power(2.0, -self.registers.astype(np.float64)).sum()
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)  # linear counting for small n
        return est

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, payload: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(payload, dtype=np.uint8).copy())


from ..functions.hashing import hash64_array as _hash_items  # shared idiom


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): ``d`` rows of
    ``w`` counters; an item's estimate is the MIN over its row counters
    (always >= the true count).  Merge = elementwise sum — the property
    that makes it a one-pass distributed aggregate.  Deterministic: row
    seeds derive from the row index via the same md5 item hashing as the
    rest of the engine."""

    def __init__(self, w: int = 2048, d: int = 4, table: np.ndarray | None = None):
        self.w = w
        self.d = d
        self.table = table if table is not None else np.zeros((d, w), dtype=np.int64)

    def _cols(self, hashes: np.ndarray) -> np.ndarray:
        """(d, n) column indices: one independent slot per row via a
        seeded affine remix of the 64-bit item hash."""
        rows = np.arange(self.d, dtype=np.uint64)[:, None]
        mixed = hashes[None, :] * (rows * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1))
        return ((mixed >> np.uint64(17)) % np.uint64(self.w)).astype(np.int64)

    def add(self, hashes: np.ndarray, counts: np.ndarray) -> None:
        cols = self._cols(hashes)
        for r in range(self.d):
            np.add.at(self.table[r], cols[r], counts)

    def estimate(self, hashes: np.ndarray) -> np.ndarray:
        cols = self._cols(hashes)
        return np.min(
            np.stack([self.table[r][cols[r]] for r in range(self.d)]), axis=0
        )

    def merge(self, other: "CountMin") -> "CountMin":
        return CountMin(self.w, self.d, self.table + other.table)

    def serialize(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def deserialize(cls, payload: bytes, w: int = 2048, d: int = 4) -> "CountMin":
        return cls(w, d, np.frombuffer(payload, dtype=np.int64).reshape(d, w).copy())


def heavy_hitter_tokens(sf_dir: str, k: int = 20, w: int = 2048, d: int = 4,
                        candidates_per_batch: int | None = None):
    """Approximate top-k tokens by count: each batch emits ONE Count-Min
    sketch plus its local top candidate tokens; the merged sketch scores
    the (small) candidate union.  The exchange carries d*w counters and a
    few candidate strings per batch — never per-token rows.  CM
    guarantees estimate >= true count.  Candidate recall is
    PROBABILISTIC, not guaranteed (ADVICE r2): a globally heavy token
    spread thinly enough to miss every batch's local top list would
    vanish — so the per-batch candidate list scales with k (8x headroom
    by default; a token in the true top-k but below every batch's local
    top-8k is astronomically unlikely for natural count distributions,
    and the pytest pins the winners against exact counts at test scale)."""
    import os

    if candidates_per_batch is None:
        candidates_per_batch = max(64, 8 * k)

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for text in df["text"].fillna(""):
            c.update(text.split())
        cm = CountMin(w, d)
        if c:
            toks = sorted(c.keys())
            cm.add(_hash_items(toks), np.array([c[t] for t in toks], dtype=np.int64))
        cands = [t for t, _ in c.most_common(candidates_per_batch)]
        return pd.DataFrame({"sketch": [cm.serialize()], "cands": [cands]})

    rows = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    merged = CountMin(w, d)
    cands: set = set()
    for row in rows:
        merged = merged.merge(CountMin.deserialize(row["sketch"], w, d))
        cands.update(row["cands"])
    cand_list = sorted(cands)
    if not cand_list:
        return ray.data.from_items([])
    est = merged.estimate(_hash_items(cand_list))
    order = np.lexsort((np.array(cand_list, dtype=object), -est))[:k]
    return ray.data.from_items(
        [{"token": cand_list[i], "est_count": int(est[i])} for i in order]
    )


def approx_distinct_tokens(sf_dir: str, p: int = 12):
    """Approximate distinct-token count over documents.text: one HLL per
    batch -> merge -> estimate.  Returns a one-row Dataset
    (n_distinct_tokens_approx: int64); exactness is the oracle's job
    (pytest bounds the error against the exact distinct count)."""
    import os

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        hll = HyperLogLog(p)
        toks = set()
        for text in df["text"].fillna(""):
            toks.update(text.split())
        if toks:
            hll.add_hashes(_hash_items(sorted(toks)))
        return pd.DataFrame({"sketch": [hll.serialize()]})

    sketches = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    merged = HyperLogLog(p)
    for row in sketches:
        merged = merged.merge(HyperLogLog.deserialize(row["sketch"], p))
    est = int(round(merged.estimate()))
    return ray.data.from_items([{"n_distinct_tokens_approx": est}])


class TDigest:
    """Merging t-digest (Dunning & Ertl 2019) with the k1 scale function,
    binned variant: each sorted point is assigned to the integer cell of
    k(q) = (delta / 2pi) * asin(2q - 1) at its mid-rank and cells are
    reduced with a weighted mean — fully vectorized (one argsort + one
    groupby per build/merge), deterministic, and mergeable (merge =
    concat centroids, re-sort, re-bin).  Accuracy concentrates at the
    tails exactly like the classic greedy variant; the pytest bounds
    the rank error empirically."""

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, dtype="float64")
        self.weights = weights if weights is not None else np.empty(0, dtype="float64")

    @staticmethod
    def _compress(vals: np.ndarray, wts: np.ndarray, delta: int) -> "TDigest":
        order = np.argsort(vals, kind="stable")
        v, w = vals[order], wts[order]
        total = w.sum()
        q_mid = (np.cumsum(w) - w / 2) / total
        k = np.floor(delta / (2 * np.pi) * np.arcsin(2 * q_mid - 1) / 1.0)
        # reduce each k-cell to its weighted mean; cells are contiguous
        # in the sorted order so this is one vectorized pass
        cell, idx = np.unique(k, return_inverse=True)
        cw = np.bincount(idx, weights=w)
        cm = np.bincount(idx, weights=v * w) / cw
        return TDigest(delta, cm, cw)

    @classmethod
    def from_values(cls, vals: np.ndarray, delta: int = 200) -> "TDigest":
        vals = np.asarray(vals, dtype="float64")
        return cls._compress(vals, np.ones(len(vals)), delta) if len(vals) else cls(delta)

    def merge(self, other: "TDigest") -> "TDigest":
        if not len(other.means):
            return self
        if not len(self.means):
            return other
        return self._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
            self.delta,
        )

    def quantile(self, q: float) -> float:
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def serialize(self) -> bytes:
        return np.concatenate([self.means, self.weights]).tobytes()

    @classmethod
    def deserialize(cls, raw: bytes, delta: int) -> "TDigest":
        arr = np.frombuffer(raw, dtype="float64")
        h = len(arr) // 2
        return cls(delta, arr[:h].copy(), arr[h:].copy())


def approx_quantiles_value(sf_dir: str, qs=(0.5, 0.9, 0.99), delta: int = 200):
    """Approximate quantiles of events.value via a mergeable t-digest:
    one digest per batch -> centroid merge -> interpolation.  Returns
    one row per requested quantile (q: float64, value_est: float64).
    Rows-only (sketch): the pytest bounds the RANK error of each
    estimate against the exact CDF.  Same scale shape as the HLL —
    the exchange carries one serialized sketch per batch, never
    values."""
    import os

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        td = TDigest.from_values(df["value"].to_numpy(dtype="float64"), delta)
        return pd.DataFrame({"sketch": [td.serialize()]})

    merged = TDigest(delta)
    for row in ds.map_batches(sketch_batch, batch_format="pandas").take_all():
        merged = merged.merge(TDigest.deserialize(row["sketch"], delta))
    return ray.data.from_items(
        [{"q": float(q), "value_est": merged.quantile(float(q))} for q in qs]
    )


def approx_distinct_users_by_type(sf_dir: str, p: int = 12):
    """Per-event-type approximate distinct-user counts — the PER-GROUP
    mergeable-sketch pattern (one HLL as the aggregation STATE of each
    group), vs ``approx_distinct_tokens``'s single global sketch.

    Scale shape: each batch emits ONE serialized HLL row per event type
    seen in the batch (|types| × 4 KiB, never user ids), the driver
    merges per type (group count is dimension-bounded), and the exact
    twin ``event_type_distinct_users`` is the oracle in tests.  At
    100 TB this replaces the exact twin's distinct-key exchange with a
    constant-size register OR."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.groupby("event_type", sort=False):
            hll = HyperLogLog(p)
            users = np.unique(g["user_id"].to_numpy(dtype="int64"))
            hll.add_hashes(_hash_items([str(u) for u in users]))
            rows.append({"event_type": etype, "sketch": hll.serialize()})
        return pd.DataFrame(rows, columns=["event_type", "sketch"])

    partials = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    merged: dict[str, HyperLogLog] = {}
    for row in partials:
        h = HyperLogLog.deserialize(row["sketch"], p)
        t = row["event_type"]
        merged[t] = merged[t].merge(h) if t in merged else h
    out = sorted(
        (t, int(round(h.estimate()))) for t, h in merged.items()
    )
    return ray.data.from_items(
        [{"event_type": t, "n_users_approx": n} for t, n in out]
    )
