"""Deterministic 64-bit item hashing shared by the sketch/dedup/
fingerprint operators (PYTHONHASHSEED-independent, stable across
processes and nodes).

The hash is the little-endian low 8 bytes of md5 — EXACTLY DuckDB's
``md5_number_lower``, so every operator built on it (simhash bit votes,
winnowing gram hashes) is recomputable in ANSI-SQL and can carry a full
DuckDB oracle instead of a rows-only check.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np


def hash64(value: str) -> int:
    """uint64 item hash == DuckDB ``md5_number_lower(value)``."""
    return int.from_bytes(hashlib.md5(value.encode("utf-8")).digest()[8:16], "little")


def hash64_array(values: Iterable[str]) -> np.ndarray:
    return np.asarray([hash64(v) for v in values], dtype=np.uint64)
