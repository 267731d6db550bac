"""Regenerate tests/goldens/neardup_sf0001.json with a SERIAL
single-process recomputation of the near-dup pipelines.

The golden pins the DISTRIBUTED join-based verification path against an
independent oracle: everything here is plain numpy/dict code with no Ray
— same algorithms (minhash LSH banding + exact shingle-Jaccard verify;
multi-table hyperplane LSH + exact cosine verify), none of the
distributed machinery (_bucketed_attach, band-bucket shuffles).  Rerun
after any change to the shared item hash (functions/hashing.py) or the
near-dup parameters.

Usage: python scripts/regen_neardup_golden.py   (writes the golden)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ocr_corrector_ray.functions.hashing import hash64_array  # noqa: E402
from ocr_corrector_ray.pipelines.dedup import (  # noqa: E402
    _MERSENNE,
    _perm_params,
    _shingles,
)

SF = "/root/testdata/sf0.001"
GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                      "neardup_sf0001.json")


def minhash_pairs(num_perm=64, bands=16, shingle_n=3, threshold=0.5):
    docs = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    a, b = _perm_params(num_perm)
    M = np.uint64(_MERSENNE)
    rows_per_band = num_perm // bands

    sigs = {}
    texts = {}
    for r in docs:
        text = r["text"] or ""
        texts[r["doc_id"]] = text
        sh = _shingles(text, shingle_n)
        if not sh:
            sigs[r["doc_id"]] = np.full(num_perm, np.iinfo(np.int64).max,
                                        dtype=np.int64)
            continue
        x = hash64_array(sh)
        vals = (a[:, None] * x[None, :] + b[:, None]) % M
        sigs[r["doc_id"]] = vals.min(axis=1).astype(np.int64)

    buckets = defaultdict(list)
    for did in sorted(sigs):
        s = sigs[did].reshape(bands, rows_per_band)
        for bi in range(bands):
            h = hashlib.blake2b(s[bi].tobytes(), digest_size=8).digest()
            buckets[(bi, h)].append(did)

    cands = set()
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cands.add((members[i], members[j]))

    out = []
    shingle_sets = {d: frozenset(_shingles(t, shingle_n)) for d, t in texts.items()}
    for a_id, b_id in sorted(cands):
        sa, sb = shingle_sets[a_id], shingle_sets[b_id]
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            # floor-scale, not round — matches the operator and its
            # DuckDB oracle (round-half modes differ across engines)
            out.append([int(a_id), int(b_id), math.floor(j * 1e4) / 1e4])
    return sorted(out)


def embedding_pairs(n_tables=8, n_planes=6, threshold=0.4, dim=64, seed=11):
    tbl = pq.read_table(
        os.path.join(SF, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim))
    pows = 1 << np.arange(n_planes, dtype=np.int64)

    cands = set()
    for t in range(n_tables):
        bucket = ((V @ planes[t].T) > 0) @ pows
        groups = defaultdict(list)
        for vid, bk in zip(ids, bucket):
            groups[bk].append(int(vid))
        for members in groups.values():
            members = sorted(members)
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    cands.add((members[i], members[j]))

    idx = {int(v): i for i, v in enumerate(ids)}
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    out = []
    for a_id, b_id in sorted(cands):
        c = float((Vn[idx[a_id]] * Vn[idx[b_id]]).sum())
        if c >= threshold:
            out.append([a_id, b_id, float(np.round(c, 6))])
    return sorted(out)


def main():
    golden = {"minhash": minhash_pairs(), "embedding": embedding_pairs()}
    with open(GOLDEN, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {GOLDEN}: {len(golden['minhash'])} minhash pairs, "
          f"{len(golden['embedding'])} embedding pairs")


if __name__ == "__main__":
    main()
