"""Mergeable-sketch aggregates.

The scale pattern for distinct-counting: each batch emits ONE serialized
sketch (here HyperLogLog, Flajolet et al. 2007), a tiny merge stage ORs
the registers, and the cardinality estimate comes from the merged sketch
— no shuffle ever sees individual keys.  Deterministic (blake2b item
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
