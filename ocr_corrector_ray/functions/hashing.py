"""Deterministic 64-bit item hashing shared by the sketch/dedup/fingerprint
operators (blake2b digest-8, big-endian; PYTHONHASHSEED-independent,
stable across processes and nodes)."""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np


def hash64(value: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(), "big"
    )


def hash64_array(values: Iterable[str]) -> np.ndarray:
    return np.asarray([hash64(v) for v in values], dtype=np.uint64)
