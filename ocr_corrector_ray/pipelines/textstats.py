"""Text-analysis operators (rows-only checks): n-gram language ID and
winnowing document fingerprints.  The SQL-expressible text stats live in
analytics.py."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

import ray.data

# tiny built-in letter-bigram profiles (synthetic but deterministic):
# rank lists of the most characteristic bigrams per language.
_PROFILES = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "es": ["de", "en", "os", "es", "la", "ar", "el", "ue", "ra", "as"],
    "de": ["en", "er", "ch", "de", "ei", "te", "in", "nd", "ie", "ge"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "ou", "ai", "it"],
}


def _p(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def lang_id_ngram(sf_dir: str):
    """doc_id, lang_pred: cosine of the doc's letter-bigram frequency
    vector against each profile; 'und' for CJK/empty docs.  A heuristic
    n-gram language identifier (rows-only oracle)."""
    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    langs = sorted(_PROFILES)
    vocab = sorted({b for prof in _PROFILES.values() for b in prof})
    v_index = {b: i for i, b in enumerate(vocab)}
    P = np.zeros((len(langs), len(vocab)))
    for li, lang in enumerate(langs):
        for rank, bg in enumerate(_PROFILES[lang]):
            P[li, v_index[bg]] = len(_PROFILES[lang]) - rank
    P = P / np.linalg.norm(P, axis=1, keepdims=True)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in df["text"].fillna(""):
            letters = "".join(c for c in text.lower() if c.isalpha() and c.isascii())
            if len(letters) < 4:
                preds.append("und")
                continue
            v = np.zeros(len(vocab))
            for i in range(len(letters) - 1):
                j = v_index.get(letters[i : i + 2])
                if j is not None:
                    v[j] += 1
            norm = np.linalg.norm(v)
            if norm == 0:
                preds.append("und")
                continue
            sims = P @ (v / norm)
            preds.append(langs[int(np.argmax(sims))])
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": preds})

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
            hs = np.asarray(
                [
                    int.from_bytes(
                        hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(), "big"
                    ) >> 1
                    for g in grams
                ],
                dtype=np.int64,
            )
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


def tfidf_top_terms(sf_dir: str, k: int = 3, min_df: int = 2):
    """Per-doc top-k TF-IDF terms (doc_id, term, tfidf) — the classic
    corpus-statistics op for boilerplate/keyword analysis.

    Two passes: (1) the document-frequency table as a coarse grouped
    count over in-batch DISTINCT (doc, token) pairs — the combiner means
    the exchange carries each doc's distinct tokens once; (2) the small
    DF table (pruned to ``min_df``; token vocabularies are sublinear in
    corpus size) broadcasts via ray.put and each batch scores its docs
    locally.  idf = ln(N / df); ties broken by term for determinism."""
    import math

    import ray as _ray

    from ._agg import grouped_agg

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = ds.count()

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        doc_out, tok_out = [], []
        for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
            for tok in set(text.split()):
                doc_out.append(doc_id)
                tok_out.append(tok)
        return pd.DataFrame({"doc_id": doc_out, "token": tok_out})

    df_table = grouped_agg(
        ds.map_batches(distinct_pairs, batch_format="pandas"),
        ["token"], {"df": ("doc_id", "size")},
    ).to_pandas()
    df_table = df_table[df_table["df"] >= min_df]
    idf_ref = _ray.put(
        {t: math.log(n_docs / d) for t, d in zip(df_table["token"], df_table["df"])}
    )

    class Score:
        def __init__(self, ref):
            self.idf = _ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            doc_out, term_out, val_out = [], [], []
            for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
                toks = text.split()
                if not toks:
                    continue
                counts: dict = {}
                for t in toks:
                    counts[t] = counts.get(t, 0) + 1
                scored = sorted(
                    (
                        (-(c / len(toks)) * self.idf[t], t)
                        for t, c in counts.items()
                        if t in self.idf
                    ),
                )[:k]
                for neg, t in scored:
                    doc_out.append(doc_id)
                    term_out.append(t)
                    val_out.append(round(-neg, 6))
            return pd.DataFrame({
                "doc_id": pd.Series(doc_out, dtype="int64"),
                "term": term_out,
                "tfidf": pd.Series(val_out, dtype="float64"),
            })

    return ds.map_batches(Score, fn_constructor_kwargs={"ref": idf_ref},
                          batch_format="pandas", concurrency=2)
