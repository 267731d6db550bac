"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction+correction pipeline on a
deterministic synthetic interleaved-document corpus sized for sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data-pipeline operators); ``oracle_sql()``
gives the DuckDB-equivalent SQL for the SQL-expressible subset.

Ray is initialised by the driver before this module is imported; nothing
here calls ray.init/ray.shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_STOP_SQL = "('the','a','of','to','and','in','is')"

# single source of truth for event_type_pivot: the Ray query pins this
# list (raising on any unseen type) and the oracle's FILTER columns are
# generated from it, so a datagen change cannot silently desync them
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _corpus_for(sf_dir: str) -> str:
    import os

    from ocr_corrector_ray import datagen

    # GRAFT_BENCH_DOCS: bench.py --scaling runs the identical pipeline on a
    # larger corpus so compute dominates fixed per-run costs; unset in
    # normal driver runs.
    n = int(os.environ.get("GRAFT_BENCH_DOCS", "0") or 0)
    return datagen.corpus_path(n or datagen.num_docs_for_sf_dir(sf_dir))


def _ocr_correct(sf_dir: str, mode: str = "explode"):
    from ocr_corrector_ray.pipelines.correct import corrected_dataset

    return corrected_dataset(_corpus_for(sf_dir), mode=mode)


def _ocr_correct_flat(sf_dir: str, mode: str = "explode"):
    """Corrected docs exploded back to span rows (stable scalar schema for
    the driver's row/schema checks)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def flatten(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = spans.flatten()
        return pa.table(
            {
                "doc_id": pc.take(batch.column("doc_id"), parent),
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
                "offset": flat.field("offset"),
            }
        )

    return _ocr_correct(sf_dir, mode).map_batches(flatten, batch_format="pyarrow")


def _ocr_extract(sf_dir: str):
    """Extraction stage only: exploded span rows after HTML/PDF
    main-content extraction."""
    import ray.data

    from ocr_corrector_ray.stages.explode import explode_docs
    from ocr_corrector_ray.stages.extract_stage import extract_batch

    ds = ray.data.read_parquet(_corpus_for(sf_dir))
    return (
        ds.map_batches(explode_docs, batch_format="pyarrow")
        .map_batches(extract_batch, batch_format="pyarrow")
        .drop_columns(["probs"])
    )


def _correction_pairs(sf_dir: str):
    import ray.data

    from ocr_corrector_ray.pipelines.training import correction_pairs

    return correction_pairs(ray.data.read_parquet(_corpus_for(sf_dir)))


def _confusion_counts(sf_dir: str):
    from ocr_corrector_ray.pipelines.training import confusion_counts

    return confusion_counts(_correction_pairs(sf_dir))


def _mask_probabilities(sf_dir: str):
    import ray.data

    from ocr_corrector_ray.pipelines.training import correction_pairs, mask_probabilities

    # denominator needs UNCHANGED spans too (reference corpus scan parity)
    pairs = correction_pairs(
        ray.data.read_parquet(_corpus_for(sf_dir)), changed_only=False
    )
    return mask_probabilities(pairs)


def _training_instances(sf_dir: str):
    import ray.data

    from ocr_corrector_ray.pipelines.training import (
        correction_pairs,
        mask_probabilities,
        training_instances,
    )

    # one lazy pair stream (all spans, as the reference's doc files carry
    # unchanged lines too); it executes twice — once reduced to the tiny
    # mask-probability table, once feeding instance generation
    pairs = correction_pairs(
        ray.data.read_parquet(_corpus_for(sf_dir)), changed_only=False
    )
    mp = mask_probabilities(pairs).to_pandas()
    probs = dict(zip(mp["char"], mp["mask_probability"]))
    return training_instances(pairs, probs)


def _approx_distinct_tokens(sf_dir: str):
    from ocr_corrector_ray.pipelines.sketches import approx_distinct_tokens

    return approx_distinct_tokens(sf_dir)


def _approx_distinct_users_by_type(sf_dir: str):
    from ocr_corrector_ray.pipelines.sketches import approx_distinct_users_by_type

    return approx_distinct_users_by_type(sf_dir)


def _heavy_hitter_tokens(sf_dir: str):
    from ocr_corrector_ray.pipelines.sketches import heavy_hitter_tokens

    return heavy_hitter_tokens(sf_dir)


def _approx_quantiles_value(sf_dir: str):
    from ocr_corrector_ray.pipelines.sketches import approx_quantiles_value

    return approx_quantiles_value(sf_dir)


def _media_features(sf_dir: str):
    import ray.data

    from ocr_corrector_ray.stages.media import media_features

    return media_features(ray.data.read_parquet(_corpus_for(sf_dir)))


def _media_resize(sf_dir: str):
    import ray.data

    from ocr_corrector_ray.stages.media import media_resize

    return media_resize(ray.data.read_parquet(_corpus_for(sf_dir)))


def _media_frame_sample(sf_dir: str):
    import ray.data

    from ocr_corrector_ray.stages.media import media_frame_sample

    return media_frame_sample(ray.data.read_parquet(_corpus_for(sf_dir)))


def _media_audio_features(sf_dir: str):
    import ray.data

    from ocr_corrector_ray.stages.media import media_audio_features

    return media_audio_features(ray.data.read_parquet(_corpus_for(sf_dir)))


def _ocr_correct_delta(sf_dir: str):
    """Flagship pipeline over the changed-spans-only exchange
    (mode='delta', stages/delta.py): needs the bucketized input layout,
    built once per corpus under /tmp and reused."""
    import os

    from ocr_corrector_ray import datagen
    from ocr_corrector_ray.state.checkpoint import bucketize_input

    src = _corpus_for(sf_dir)
    bdir = src.rstrip("/") + "_buckets32"
    if not os.path.exists(os.path.join(bdir, "_layout.json")):
        bucketize_input(src, bdir, 32)
    import pyarrow as pa
    import pyarrow.compute as pc

    from ocr_corrector_ray.pipelines.correct import corrected_dataset

    def flatten(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = spans.flatten()
        return pa.table(
            {
                "doc_id": pc.take(batch.column("doc_id"), parent),
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
                "offset": flat.field("offset"),
            }
        )

    return corrected_dataset(bdir, mode="delta").map_batches(
        flatten, batch_format="pyarrow"
    )


def _ocr_correct_scorer(sf_dir: str):
    """Flagship pipeline with the full tokenize/frame/mask/score LM harness
    (deterministic random-projection network) instead of the synthetic
    confusion LM."""
    from ocr_corrector_ray.correct import CorrectorConfig
    from ocr_corrector_ray.pipelines.correct import corrected_dataset

    return corrected_dataset(_corpus_for(sf_dir), cfg=CorrectorConfig(lm_backend="scorer"))


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale (500 synthetic docs)."""
    return _ocr_correct_flat("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """Registry ordered for the driver's 50-entry correctness window.

    The driver checks the FIRST 50 entries in insertion order.  Entries
    1-50 are the two flagship rows-only signals (``ocr_correct``,
    ``ocr_extract``) plus 48 DuckDB-oracled queries, so every oracled
    query family gets a driver hash row.  The oracled queries in the
    tail are there because the window can't hold all of them; each is
    either driver-green in a PREVIOUS round's CORRECTNESS file (rows on
    disk) or was added in the final session with the window already
    packed (those are pinned by the sf0.001 parametrized oracle pytest
    + the local sf0.01 gate):

    - ``token_counts`` / ``lang_script`` / ``fingerprints`` /
      ``embedding_norms`` / ``minhash_sketch``: driver-green in
      CORRECTNESS_r04; their kernels also feed in-window queries
      (``pack_sequences`` recomputes n_tokens,
      ``dedup_exact_keep_best``+``curated_docs`` key on the same md5,
      ``ann_topk``/``embedding_cosine_pairs`` divide by the same norms,
      ``minhash_neardup_pairs`` bands the same signature values).
    - ``doc_stats`` / ``quality_scores``: driver-green in BOTH
      CORRECTNESS_r03 and r04; swapped out in r5 so the never-checked
      ``doc_token_entropy`` and ``dup_ngram_ratio`` get a direct row.
    - ``event_type_distinct_users`` / ``customers_with_orders`` /
      ``top_customers``: driver-green in CORRECTNESS_r04; swapped out
      this session so the three r5-close-out additions
      (``train_split_stats``, ``token_repetition_stats``,
      ``unigram_xent_docs``) get a direct hash row.

    The rest of the tail is rows-only by nature (see ``oracle_sql``).
    """
    from ocr_corrector_ray.pipelines import analytics, dedup, textstats

    return {
        # -- driver check window (first 50) -------------------------------
        # flagship correction + extraction (non-SQL: rows-only check;
        # exactness vs the serial oracle is pinned in tests/)
        "ocr_correct": _ocr_correct_flat,
        "ocr_extract": _ocr_extract,
        # SQL-checked general operators
        "doc_token_entropy": textstats.doc_token_entropy,
        "dup_ngram_ratio": textstats.dup_ngram_ratio,
        "dedup_exact": analytics.dedup_exact,
        "ann_topk": analytics.ann_topk,
        "events_hourly": analytics.events_hourly,
        "events_sliding": analytics.events_sliding,
        "sessionize": analytics.sessionize,
        "pricing_summary": analytics.pricing_summary,
        "lang_quantile_chars": analytics.lang_quantile_chars,
        "doc_sample": analytics.doc_sample,
        "stratified_sample": analytics.stratified_sample,
        "part_type_revenue": analytics.part_type_revenue,
        "user_running_value": analytics.user_running_value,
        "ngram_topk": analytics.ngram_topk,
        "customers_without_orders": analytics.customers_without_orders,
        "train_split_stats": analytics.train_split_stats,
        "token_repetition_stats": textstats.token_repetition_stats,
        "unigram_xent_docs": textstats.unigram_xent_docs,
        "order_revenue": analytics.order_revenue,
        "purchase_prior_click": analytics.purchase_prior_click,
        "part_type_stats": analytics.part_type_stats,
        "top_user_per_event_type": analytics.top_user_per_event_type,
        "range_join_value_bands": analytics.range_join_value_bands,
        "keep_latest_events": analytics.keep_latest_events,
        "events_rollup": analytics.events_rollup,
        "shipping_priority": analytics.shipping_priority,
        "supplier_region_stats": analytics.supplier_region_stats,
        "dedup_exact_keep_best": analytics.dedup_exact_keep_best,
        "doc_length_decile": analytics.doc_length_decile,
        "event_type_pivot": lambda sf: analytics.event_type_pivot(sf, types=_EVENT_TYPES),
        "user_value_delta": analytics.user_value_delta,
        # near-dup family (oracled)
        "minhash_neardup_pairs": dedup.minhash_neardup_pairs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "simhash_signatures": dedup.simhash_signatures,
        "simhash_neardup_pairs": dedup.simhash_neardup_pairs,
        "embedding_cosine_pairs": dedup.embedding_cosine_pairs,
        "neardup_survivors": dedup.neardup_survivors,
        "neardup_survivors_simhash": lambda sf: dedup.neardup_survivors(sf, source="simhash"),
        # text analysis + curation (oracled)
        "lang_id_ngram": textstats.lang_id_ngram,
        "winnowing_fingerprints": textstats.winnowing_fingerprints,
        "tfidf_top_terms": textstats.tfidf_top_terms,
        "pack_sequences": textstats.pack_sequences,
        "curated_docs": textstats.curated_docs,
        "decontaminate_docs": textstats.decontaminate_docs,
        "domain_quota_docs": analytics.domain_quota_docs,
        "quality_percentile_docs": analytics.quality_percentile_docs,
        # extraction-kernel conformance: the flagship's PDF/HTML extraction
        # kernels run over artifact-wrapped documents.text with the wrap +
        # rule chain mirrored in DuckDB (value-hash check on the kernels)
        "extract_pdf_kernel": analytics.extract_pdf_kernel,
        "extract_html_kernel": analytics.extract_html_kernel,
        # -- tail (entry 51+, outside the driver window) -------------------
        # flagship physical-plan variants: conformance-identical to
        # ocr_correct (tests/test_pipeline_conformance.py asserts
        # span-sequence equality across all three plans + scorer backend)
        "ocr_correct_hybrid": lambda sf: _ocr_correct_flat(sf, mode="hybrid"),
        "ocr_correct_fused": lambda sf: _ocr_correct_flat(sf, mode="fused"),
        "ocr_correct_delta": _ocr_correct_delta,
        "ocr_correct_scorer": _ocr_correct_scorer,
        # oracled but redundantly pinned in-window (see docstring)
        "token_counts": analytics.token_counts,
        "lang_script": analytics.lang_script,
        "fingerprints": analytics.fingerprints,
        "embedding_norms": analytics.embedding_norms,
        "minhash_sketch": dedup.minhash_sketch,
        "doc_stats": analytics.doc_stats,
        "quality_scores": analytics.quality_scores,
        "event_type_distinct_users": analytics.event_type_distinct_users,
        "customers_with_orders": analytics.customers_with_orders,
        "top_customers": analytics.top_customers,
        # oracled, added this session with the window already packed:
        # the sf0.001 parametrized oracle pytest + the local sf0.01
        # gate are their correctness evidence
        "line_dedup_docs": textstats.line_dedup_docs,
        "redact_pii_docs": textstats.redact_pii_docs,
        "user_retention_cohorts": analytics.user_retention_cohorts,
        "local_supplier_volume": analytics.local_supplier_volume,
        "conversion_funnel": analytics.conversion_funnel,
        "salted_skew_join": analytics.salted_skew_join,
        "dedup_incremental": analytics.dedup_incremental,
        "customer_order_counts": analytics.customer_order_counts,
        "quality_zscore_by_lang": analytics.quality_zscore_by_lang,
        "weekly_active_users": analytics.weekly_active_users,
        "bigram_pmi_topk": textstats.bigram_pmi_topk,
        "event_path_topk": analytics.event_path_topk,
        "dsir_importance_weights": textstats.dsir_importance_weights,
        "substring_dup_spans": dedup.substring_dup_spans,
        # SemDeDup-flavoured semantic dedup: survivors over the EXACT
        # cosine pair graph (recall-complete, unlike the LSH
        # embedding_neardup source), so it carries a full SQL oracle
        "neardup_survivors_cosine": lambda sf: dedup.neardup_survivors(
            sf, threshold=0.4, source="cosine"
        ),
        # context-window chunking + multilingual temperature resampling
        "chunk_docs": textstats.chunk_docs,
        "lang_temperature_weights": textstats.lang_temperature_weights,
        # CCNet-style perplexity terciles over the unigram-xent scores
        "ccnet_bucket_docs": textstats.ccnet_bucket_docs,
        # Gopher rule-set quality filter (Rae et al. 2021 §A1.1) and the
        # Stupid-Backoff bigram-LM perplexity signal (Brants et al. 2007)
        "gopher_quality_docs": textstats.gopher_quality_docs,
        "stupid_backoff_xent": textstats.stupid_backoff_xent,
        # fastText-style hashed-ngram quality classifier (Joulin et al.
        # 2016), plus the two TPC-H join shapes that complete the join
        # family: Q4 (inequality-EXISTS semi-join) and Q10 (returned-item
        # customer ranking: partitioned join + broadcast dim + exact top-k)
        "hashed_ngram_quality": textstats.hashed_ngram_quality,
        "order_priority_counts": analytics.order_priority_counts,
        "returned_item_ranking": analytics.returned_item_ranking,
        # per-group top-k window (k>1), embedding-space outlier signal
        # (within-cluster centroid distance), and LAG over an aggregated
        # monthly series (resample + window composition)
        "top_docs_per_source": analytics.top_docs_per_source,
        "embedding_centroid_dist": analytics.embedding_centroid_dist,
        "orders_monthly_growth": analytics.orders_monthly_growth,
        # calendar-keyed anomaly z-scores, the corpus Zipf exponent
        # (distributed top-V + driver-side log-log fit), and the
        # per-source corpus report card (one grouped pass)
        "events_anomaly_hours": analytics.events_anomaly_hours,
        "token_zipf_alpha": analytics.token_zipf_alpha,
        "source_quality_report": analytics.source_quality_report,
        # deterministic Efraimidis–Spirakis weighted sample and the
        # three-source cogroup (dimension + two pre-aggregated facts in
        # one tagged exchange, LEFT-JOIN semantics)
        "weighted_sample_docs": analytics.weighted_sample_docs,
        "customer_activity_summary": analytics.customer_activity_summary,
        # cross-crawl contamination matrix and train/valid KS drift check
        "cross_source_overlap": analytics.cross_source_overlap,
        "ks_drift_stats": analytics.ks_drift_stats,
        # semi-structured JSON field extraction (events.props) and the
        # TPC-H Q6 pushdown-scan + scalar-aggregate shape
        "event_props_stats": analytics.event_props_stats,
        "revenue_forecast": analytics.revenue_forecast,
        # grouped OLS trend and the feature-correlation matrix — both
        # mergeable-moments patterns (the exchange carries sufficient
        # statistics, never rows)
        "event_value_trend": analytics.event_value_trend,
        "lineitem_correlations": analytics.lineitem_correlations,
        # market-basket lift over user-hour sessions (set-pair mining)
        "session_type_affinity": analytics.session_type_affinity,
        # string-similarity join via deletion-neighborhood blocking
        "fuzzy_name_pairs": analytics.fuzzy_name_pairs,
        # the remaining classic TPC-H join/aggregate shapes: Q14
        # (conditional-ratio over a broadcast dim join), Q17 (correlated
        # per-group average consumed by a filter on the same group), Q18
        # (grouped HAVING feeding a partitioned join), Q22 (scalar
        # subquery + anti-join + grouped agg), Q13 (outer-join counts
        # grouped twice into a distribution)
        "promo_revenue_monthly": analytics.promo_revenue_monthly,
        "small_quantity_revenue": analytics.small_quantity_revenue,
        "large_order_customers": analytics.large_order_customers,
        "idle_rich_customers": analytics.idle_rich_customers,
        "order_count_distribution": analytics.order_count_distribution,
        # and the last three distinct TPC-H shapes: Q7 (one dimension in
        # two roles across a fact⋈fact join, two chained exchanges), Q15
        # (aggregate filtered by equality against its own max), Q19
        # (OR-of-ANDs predicate spanning both join sides)
        "nation_trade_volume": analytics.nation_trade_volume,
        "top_supplier_revenue": analytics.top_supplier_revenue,
        "disjunctive_predicate_revenue": analytics.disjunctive_predicate_revenue,
        # rows-only by nature
        # max-munch segmentation: pytest-pinned.  vocab_top=16 < the
        # synthetic corpus's 31-word vocabulary so the driver row shows
        # real multi-piece shattering (default 512 suits real corpora)
        "wordpiece_fertility": lambda sf: textstats.wordpiece_fertility(
            sf, vocab_top=16
        ),
        "ivf_ann_topk": analytics.ivf_ann_topk,  # approximate: recall-bound-tested
        "kmeans_embeddings": analytics.kmeans_embeddings,  # iterative
        "pagerank_user_types": analytics.pagerank_user_types,  # iterative
        "pca_embeddings": analytics.pca_embeddings,  # eigensolve: numpy-pinned
        "minhash_signatures": dedup.minhash_signatures,  # list-shaped
        "embedding_neardup": dedup.embedding_neardup,  # LSH recall < 1
        "approx_distinct_tokens": _approx_distinct_tokens,
        # per-group mergeable sketch (HLL as each group's aggregation
        # state); exact twin event_type_distinct_users is the oracle in
        # tests (estimates are tolerance-tested, not hash-comparable)
        "approx_distinct_users_by_type": _approx_distinct_users_by_type,
        "heavy_hitter_tokens": _heavy_hitter_tokens,
        "approx_quantiles_value": _approx_quantiles_value,
        "bloom_decontaminate_docs": textstats.bloom_decontaminate_docs,
        # training-data tooling + multimodal plumbing (rows-only)
        "correction_pairs": _correction_pairs,
        "confusion_counts": _confusion_counts,
        "mask_probabilities": _mask_probabilities,
        "training_instances": _training_instances,
        "media_features": _media_features,
        "media_resize": _media_resize,
        "media_frame_sample": _media_frame_sample,
        "media_audio_features": _media_audio_features,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for every HONESTLY SQL-expressible query.

    The remaining rows-only entries, and why each has no oracle:
    - ``ocr_correct`` / ``_hybrid`` / ``_fused`` / ``_scorer`` /
      ``ocr_extract`` and the training tooling (``correction_pairs``,
      ``confusion_counts``, ``mask_probabilities``,
      ``training_instances``): run over the driver-synthesized corpus
      (not one of the pre-registered views), and the correction /
      extraction kernels use backreference regexes + BK-tree /
      char-similarity lookups outside RE2/SQL.  Exactness is pinned
      against the serial oracle implementation in tests/ instead.
    - ``minhash_signatures``: list<int64>-shaped output (the banding
      stages consume it); list columns don't survive the driver's
      column-wise value hash, so the SAME computation is oracle-checked
      through its exploded scalar view ``minhash_sketch`` (the uint64
      wrap of the (a*x+b) remix is reproduced exactly with HUGEINT
      modular arithmetic).  ``minhash_neardup_pairs`` and the
      ``neardup_survivors*`` closures are fully oracled below; the
      serial golden (tests/goldens, scripts/regen_neardup_golden.py)
      stays as a second, engine-independent pin.
    - ``embedding_neardup``: LSH recall < 1 by design, so no exact SQL
      predicate reproduces its candidate set; its exact-recall superset
      IS oracled as ``embedding_cosine_pairs`` (and a recall test pins
      neardup pairs as a subset of the exact pairs).
    - ``ivf_ann_topk`` (approximate, recall-bound-tested),
      ``kmeans_embeddings`` / ``pagerank_user_types`` (iterative —
      PageRank is pinned against a dense numpy power iteration in
      tests), ``pca_embeddings``
      (eigensolve — numpy-pinned in tests), ``approx_distinct_tokens`` /
      ``approx_distinct_users_by_type`` /
      ``heavy_hitter_tokens`` / ``approx_quantiles_value`` (sketches —
      estimates are tolerance/rank-error-tested, winners pinned vs
      exact in tests/), ``bloom_decontaminate_docs`` (Bloom membership:
      a strict superset of the oracled exact ``decontaminate_docs`` —
      the superset property and FP inflation are pytest-pinned),
      ``media_features`` / ``media_resize`` / ``media_frame_sample`` /
      ``media_audio_features`` (binary payload decode / resize /
      seek-sample / PCM-spectral stages).
    - ``wordpiece_fertility``: wordpiece max-munch segmentation under a
      corpus-learned vocab is not SQL-expressible; a pytest replays the
      identical FullTokenizer serially and asserts exact equality.
    """
    toks = r"regexp_split_to_array(trim(text), '\s+')"
    n_tokens = rf"CASE WHEN trim(text) = '' THEN 0 ELSE len({toks}) END"
    n_stop = rf"CASE WHEN trim(text) = '' THEN 0 ELSE len(list_filter({toks}, x -> x IN {_STOP_SQL})) END"

    # ---- MinHash family fragments -------------------------------------
    # The (p, a, b) permutation constants are generated by the SAME
    # seeded RNG the Ray operator uses (dedup._perm_params) and inlined
    # as a VALUES list, so the oracle recomputes identical signatures.
    # CAST(... AS HUGEINT): a < 2^61 and h < 2^64, so a*h + b < 2^126
    # fits signed 128-bit; "% 2^64" reproduces numpy's intentional
    # uint64 wrap bit-for-bit (verified: HUGEINT remix == numpy wrap).
    from ocr_corrector_ray.pipelines.dedup import _perm_params

    _pa, _pb = _perm_params(64)
    mh_vals = ", ".join(f"({p}, {int(_pa[p])}, {int(_pb[p])})" for p in range(64))
    mh_cte = rf"""
            perms(p, a, b) AS (VALUES {mh_vals}),
            mh_tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            mh_sh AS (
                SELECT doc_id,
                       CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                            ELSE list_transform(range(1, len(t) - 1),
                                                i -> array_to_string(t[i:i+2], ' '))
                       END AS s
                FROM mh_tk),
            mh_hx AS (
                SELECT doc_id, md5_number_lower(us.sg) AS h
                FROM mh_sh, LATERAL unnest(s) AS us(sg)),
            mh_mn AS (
                SELECT doc_id, pm.p AS perm,
                       min(CAST(((CAST(pm.a AS HUGEINT) * h + pm.b)
                                 % 18446744073709551616)
                                % 2305843009213693951 AS BIGINT)) AS mh
                FROM mh_hx CROSS JOIN perms pm GROUP BY doc_id, pm.p)"""
    # Bands: 64 perms / 16 bands = 4 rows per band; docs sharing a band's
    # exact 4-value slice are LSH candidates (grouping on the raw values
    # is equivalent to the operator's blake2b band digest).  The
    # operator's degenerate-bucket cap (500) cannot trigger at oracle
    # scale (500 docs total), so candidate sets agree.
    mh_pairs_cte = f"""{mh_cte},
            mh_bands AS (
                SELECT doc_id, perm // 4 AS band_id,
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm) AS bsig
                FROM mh_mn GROUP BY 1, 2),
            mh_cand AS (
                SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                FROM mh_bands x JOIN mh_bands y
                  ON y.band_id = x.band_id AND y.bsig = x.bsig
                 AND x.doc_id < y.doc_id),
            mh_sets AS (SELECT doc_id, list_distinct(s) AS s FROM mh_sh),
            mh_jac AS (
                SELECT c.a, c.b,
                       CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(sa.s, sb.s))) AS j
                FROM mh_cand c JOIN mh_sets sa ON sa.doc_id = c.a
                               JOIN mh_sets sb ON sb.doc_id = c.b)"""

    # ---- SimHash fragments (shared by sigs / pairs / survivors) -------
    sim_cte = r"""
            sim_tok AS (
                SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            sim_h AS (SELECT doc_id, md5_number_lower(tok) AS h FROM sim_tok),
            sim_bits AS (
                SELECT doc_id, bb.b,
                       sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM sim_h, (SELECT unnest(generate_series(0, 63)) AS b) bb
                GROUP BY doc_id, bb.b),
            sim_sig0 AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN v > 0 THEN
                                  CASE WHEN b = 63 THEN -9223372036854775807 - 1
                                       ELSE (CAST(1 AS BIGINT) << b) END
                                ELSE 0 END) AS BIGINT) AS simhash
                FROM sim_bits GROUP BY doc_id),
            sim_sig AS (
                SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS BIGINT) AS simhash
                FROM documents d LEFT JOIN sim_sig0 s USING (doc_id)),
            -- hamming-band candidate generation is recall-COMPLETE for
            -- max_hamming <= bands-1 (pigeonhole), so the operator's
            -- output equals the plain all-pairs hamming filter
            sim_pairs AS (
                SELECT a.doc_id AS a, b.doc_id AS b,
                       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
                FROM sim_sig a JOIN sim_sig b ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)"""

    def closure_sql(pair_cte: str, pair_rel: str,
                    id_table: str = "documents", id_col: str = "doc_id") -> str:
        """Survivors = ids minus connected-component non-representatives:
        min-id labels via a recursive reachability CTE over the verified
        pair graph (UNION dedups rows, so the iteration terminates)."""
        return f"""
            WITH RECURSIVE {pair_cte},
            cc_e AS (SELECT a, b FROM {pair_rel}
                     UNION ALL
                     SELECT b AS a, a AS b FROM {pair_rel}),
            cc_reach(node, m) AS (
                SELECT a AS node, b AS m FROM cc_e
                UNION
                SELECT r.node, e.b AS m FROM cc_reach r JOIN cc_e e ON e.a = r.m),
            cc_drops AS (
                SELECT node FROM cc_reach GROUP BY node HAVING min(m) < node)
            SELECT {id_col} FROM {id_table}
            WHERE {id_col} NOT IN (SELECT node FROM cc_drops)
        """

    # ---- extraction-kernel conformance ---------------------------------
    # The artifact wrap (analytics._wrap_pdf / HTML_WRAP_PRE+POST) and the
    # kernel rule chains (functions/extract.py) are mirrored step by step;
    # the wrap constants are imported so Ray and SQL can never drift.
    from ocr_corrector_ray.pipelines.analytics import HTML_WRAP_POST, HTML_WRAP_PRE

    extract_pdf_sql = r"""
        WITH w AS (
            SELECT doc_id,
                   replace(regexp_replace(replace(coalesce(text, ''), ' ', '  '),
                                          '(.{40})', '\1-' || chr(10), 'g'),
                           'e', 'e' || chr(12)) AS w
            FROM documents)
        SELECT doc_id,
               regexp_replace(replace(replace(regexp_replace(w, '-' || chr(10), '', 'g'),
                                              chr(12), ''),
                                      chr(10), ''),
                              ' {2,}', ' ', 'g') AS text
        FROM w
    """
    extract_html_sql = (
        r"""
        WITH h AS (
            SELECT doc_id, '__PRE__' || coalesce(text, '') || '__POST__' AS h
            FROM documents),
        -- boilerplate containers dropped wholesale (extract.py:36-39,55)
        s1 AS (
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                h,
                '<script[^>]*>.*?</script\s*>', '', 'gis'),
                '<style[^>]*>.*?</style\s*>', '', 'gis'),
                '<head[^>]*>.*?</head\s*>', '', 'gis'),
                '<nav[^>]*>.*?</nav\s*>', '', 'gis'),
                '<footer[^>]*>.*?</footer\s*>', '', 'gis'),
                '<aside[^>]*>.*?</aside\s*>', '', 'gis') AS s
            FROM h),
        -- anchor text marked with the same \x01/\x02 sentinels (extract.py:56)
        s2 AS (SELECT doc_id, regexp_replace(s, '<a\b[^>]*>(.*?)</a\s*>',
                                             chr(1) || '\1' || chr(2), 'gis') AS s FROM s1),
        -- block boundaries -> newline; remaining tags become the chr(3)
        -- tag-mark sentinel so each line keeps its inline-tag count for
        -- the text-density rule (extract.py:57-58)
        s3 AS (SELECT doc_id, regexp_replace(s,
                 '<br\s*/?>|</(?:p|div|li|h[1-6]|tr|td|section|article|ul|ol|table)\s*>',
                 chr(10), 'gi') AS s FROM s2),
        s4 AS (SELECT doc_id, regexp_replace(s, '<[^>]+>', chr(3), 'g') AS s FROM s3),
        -- entity unescape, same order as extract.py:46-49
        s5 AS (SELECT doc_id,
                 replace(replace(replace(replace(replace(replace(s,
                   '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&#39;', chr(39)), '&amp;', '&') AS s
               FROM s4),
        lines AS (
            SELECT doc_id,
                   unnest(string_split(s, chr(10))) AS line,
                   unnest(range(1, length(string_split(s, chr(10))) + 1)) AS ord
            FROM s5),
        feat AS (
            SELECT doc_id, ord, line,
                   length(line) - length(replace(line, chr(3), '')) AS n_tags,
                   trim(replace(replace(replace(line, chr(1), ''), chr(2), ''),
                                chr(3), ''),
                        ' ' || chr(9) || chr(13) || chr(12) || chr(11)) AS visible
            FROM lines),
        -- per-line keep rule: >=2 CJK chars, or >=25 visible chars with
        -- link density < 0.5 AND text density (visible chars per inline
        -- tag) >= 6 (extract.py:66-103)
        feat2 AS (
            SELECT doc_id, ord, visible, n_tags,
                   length(visible)
                     - length(regexp_replace(visible, '[一-龥]', '', 'g')) AS n_cjk,
                   length(regexp_replace(visible, '\s', '', 'g')) AS n_vis,
                   length(regexp_replace(replace(replace(replace(line, chr(1), ''), chr(2), ''),
                                                 chr(3), ''),
                                         '\s', '', 'g'))
                     - length(regexp_replace(replace(replace(replace(
                         regexp_replace(line, chr(1) || '[^' || chr(2) || ']*' || chr(2), '', 'g'),
                         chr(1), ''), chr(2), ''), chr(3), ''), '\s', '', 'g')) AS in_link
            FROM feat)
        SELECT doc_id,
               string_agg(
                 CASE WHEN visible = '' THEN ''
                      WHEN n_cjk >= 2 THEN visible
                      WHEN n_vis >= 25 AND in_link / greatest(1, n_vis) < 0.5
                           AND CAST(n_vis AS DOUBLE) / (n_tags + 1) >= 6.0 THEN visible
                      ELSE '' END, '' ORDER BY ord) AS text
        FROM feat2 GROUP BY doc_id
    """
        .replace("__PRE__", HTML_WRAP_PRE)
        .replace("__POST__", HTML_WRAP_POST)
    )

    return {
        "doc_stats": f"""
            SELECT lang, source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   floor((CAST(sum(n_chars) AS DOUBLE) / count(*)) * 10000) / 10000 AS avg_chars
            FROM documents GROUP BY lang, source
        """,
        "token_counts": f"""
            SELECT doc_id, {n_tokens} AS n_tokens FROM documents
        """,
        "quality_scores": f"""
            WITH t AS (SELECT doc_id, {n_tokens} AS n, {n_stop} AS s FROM documents)
            SELECT doc_id,
                   n AS n_tokens,
                   CASE WHEN n = 0 THEN 0.0
                        ELSE floor((CAST(s AS DOUBLE) * 10000) / n) / 10000 END AS stop_ratio,
                   (n >= 20 AND
                    (CASE WHEN n = 0 THEN 0.0 ELSE floor((CAST(s AS DOUBLE) * 10000) / n) / 10000 END)
                      BETWEEN 0.01 AND 0.6) AS is_quality
            FROM t
        """,
        "lang_script": """
            SELECT CASE WHEN regexp_matches(text, '[一-龥]') THEN 'cjk' ELSE 'latin' END AS script,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "fingerprints": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
            FROM embeddings
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 10),
                 v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
            SELECT query_id, neighbor_id, cos_sim FROM (
                SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.e, v.e), 6) AS cos_sim,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY list_cosine_similarity(q.e, v.e) DESC, v.vec_id) AS rn
                FROM q, v WHERE q.vec_id <> v.vec_id) WHERE rn <= 5
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_sliding": """
            SELECT event_type,
                   time_bucket(INTERVAL 15 MINUTES, ts)
                     - to_minutes(15 * k.k) AS window_start,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events, (SELECT unnest(generate_series(0, 3)) AS k) k
            GROUP BY 1, 2
        """,
        "sessionize": """
            SELECT user_id,
                   CAST(1 + sum(CASE WHEN diff > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM (SELECT user_id, ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS diff
                  FROM events) t
            GROUP BY user_id
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(CAST(sum(l_quantity) AS DOUBLE) / count(*), 4) AS avg_qty,
                   round(sum(l_extendedprice) / count(*), 4) AS avg_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "order_revenue": """
            SELECT o.o_orderpriority,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "purchase_prior_click": """
            SELECT p.event_id, c.ts AS prior_click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts > c.ts
        """,
        "part_type_stats": """
            SELECT split_part(p_type, ' ', 1) AS type_prefix,
                   count(*) AS n_parts,
                   round(sum(p_retailprice), 2) AS sum_price,
                   round(max(p_retailprice), 2) AS max_price
            FROM part GROUP BY 1
        """,
        "top_user_per_event_type": """
            SELECT event_type, user_id, total_value FROM (
                SELECT event_type, user_id, round(sum(value), 4) AS total_value,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY round(sum(value), 4) DESC, user_id) AS rn
                FROM events GROUP BY event_type, user_id) WHERE rn = 1
        """,
        "range_join_value_bands": """
            WITH bands AS (
                SELECT k AS band_id, k * 25.0 AS lo, k * 25.0 + 37.5 AS hi
                FROM range(0, 20) t(k)
            )
            SELECT b.band_id, b.lo, b.hi,
                   count(*) AS n_events,
                   round(sum(e.value), 2) AS sum_value
            FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
            GROUP BY 1, 2, 3
        """,
        "keep_latest_events": """
            SELECT user_id, event_type, event_id, ts, value FROM (
                SELECT user_id, event_type, event_id, ts, value,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1
        """,
        "dedup_exact_keep_best": """
            SELECT doc_id, n_chars FROM (
                SELECT doc_id, n_chars,
                       row_number() OVER (PARTITION BY md5(coalesce(text, ''))
                                          ORDER BY n_chars DESC, doc_id) AS rn
                FROM documents) WHERE rn = 1
        """,
        "supplier_region_stats": """
            SELECT r.r_name AS region,
                   count(*) AS n_suppliers,
                   round(sum(s.s_acctbal), 2) AS sum_acctbal,
                   round(max(s.s_acctbal), 2) AS max_acctbal
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1
        """,
        "shipping_priority": """
            SELECT l_orderkey, revenue, o_orderdate, o_orderpriority FROM (
                SELECT l.l_orderkey,
                       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                       o.o_orderdate, o.o_orderpriority
                FROM customer c, orders o, lineitem l
                WHERE c.c_mktsegment = 'BUILDING'
                  AND c.c_custkey = o.o_custkey
                  AND l.l_orderkey = o.o_orderkey
                  AND o.o_orderdate < TIMESTAMP '1998-01-01'
                  AND l.l_shipdate > TIMESTAMP '1998-01-01'
                GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority)
            ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
        """,
        "doc_length_decile": """
            SELECT doc_id, n_chars,
                   CAST(least(ceil(cume_dist() OVER (ORDER BY n_chars) * 10), 10)
                        AS BIGINT) AS decile
            FROM documents
        """,
        "events_rollup": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(hour, -1) AS hour,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour, value
                  FROM events)
            GROUP BY ROLLUP (event_type, hour)
        """,
        "event_type_pivot": "SELECT user_id, " + ", ".join(
            f"round(coalesce(sum(value) FILTER (event_type = '{t}'), 0), 2) AS sum_{t}"
            for t in _EVENT_TYPES
        ) + " FROM events GROUP BY user_id",
        "user_value_delta": """
            SELECT event_id,
                   round(value - lag(value) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id), 4) AS delta
            FROM events
        """,
        "lang_quantile_chars": """
            SELECT lang, count(*) AS n_docs,
                   quantile_disc(n_chars, 0.5) AS p50_chars,
                   quantile_disc(n_chars, 0.9) AS p90_chars
            FROM documents GROUP BY lang
        """,
        "doc_sample": """
            SELECT doc_id, n_chars FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) < '10'
        """,
        "train_split_stats": """
            SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'train'
                        WHEN md5(CAST(doc_id AS VARCHAR)) < 'f3' THEN 'valid'
                        ELSE 'test' END AS split,
                   count(*) AS n_docs,
                   sum(n_chars) AS total_chars
            FROM documents GROUP BY 1
        """,
        "stratified_sample": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
                FROM documents) WHERE rn <= 20
        """,
        "part_type_revenue": """
            SELECT split_part(p.p_type, ' ', 1) AS type_prefix,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1
        """,
        "user_running_value": """
            SELECT event_id,
                   round(sum(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 4) AS running_value
            FROM events
        """,
        "ngram_topk": r"""
            WITH toks AS (
                SELECT regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(text) <> ''),
            g AS (
                SELECT array_to_string(t[i:i+2], ' ') AS ngram
                FROM toks, LATERAL unnest(generate_series(1, len(t) - 2)) AS u(i))
            SELECT ngram, count(*) AS n FROM g
            GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20
        """,
        "event_type_distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        # numpy/DuckDB float64 cosine agreement measured at 6e-16 and the
        # nearest pair sits 1.3e-4 from the 0.4 threshold (sf0.01), so the
        # >= predicate and round(..., 6) are boundary-safe on both sides
        "embedding_cosine_pairs": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
        "ngram_jaccard_pairs": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(text) <> ''),
            sh AS (
                SELECT doc_id,
                       CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                            ELSE list_distinct(list_transform(
                                     range(1, len(t) - 1),
                                     i -> array_to_string(t[i:i+2], ' ')))
                       END AS s
                FROM tk)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   floor(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s)))
                         * 10000) / 10000 AS jaccard
            FROM sh a JOIN sh b ON b.doc_id <> a.doc_id
            WHERE a.doc_id IN (0, 1, 2, 3, 4)
        """,
        "tfidf_top_terms": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(text) <> ''),
            pairs AS (
                SELECT doc_id, unnest(t) AS term, len(t) AS n_toks FROM tk),
            tf AS (
                SELECT doc_id, term, count(*) AS c, max(n_toks) AS n_toks
                FROM pairs GROUP BY doc_id, term),
            df AS (
                SELECT term, count(*) AS df
                FROM (SELECT DISTINCT doc_id, term FROM pairs)
                GROUP BY term HAVING count(*) >= 2),
            scored AS (
                SELECT tf.doc_id, tf.term,
                       floor((CAST(tf.c AS DOUBLE) / tf.n_toks)
                             * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df.df)
                             * 1000000) / 1000000 AS tfidf
                FROM tf JOIN df USING (term))
            SELECT doc_id, term, tfidf FROM (
                SELECT doc_id, term, tfidf,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY tfidf DESC, term) AS rn
                FROM scored) WHERE rn <= 3
        """,
        "winnowing_fingerprints": """
            WITH g AS (
                SELECT doc_id, coalesce(text, '') AS txt,
                       unnest(generate_series(1, len(coalesce(text, '')) - 4)) AS pos
                FROM documents),
            h AS (
                SELECT doc_id, pos,
                       CAST(md5_number_lower(substr(txt, pos, 5)) >> 1 AS BIGINT) AS h
                FROM g),
            w AS (
                SELECT doc_id, pos, h,
                       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wm,
                       count(*) OVER (PARTITION BY doc_id) AS n_grams
                FROM h),
            sel AS (
                SELECT doc_id, wm FROM w WHERE n_grams > 4 AND pos >= 4
                UNION ALL
                SELECT doc_id, min(h) AS wm FROM w WHERE n_grams <= 4 GROUP BY doc_id),
            agg AS (
                SELECT doc_id, count(DISTINCT wm) AS n_fingerprints,
                       min(wm) AS min_fingerprint
                FROM sel GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_fingerprints, 0) AS n_fingerprints,
                   coalesce(a.min_fingerprint, 0) AS min_fingerprint
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "lang_id_ngram": """
            WITH l AS (
                SELECT doc_id,
                       regexp_replace(lower(coalesce(text, '')), '[^a-z]', '', 'g') AS ltr
                FROM documents),
            bg AS (
                SELECT doc_id, ltr, unnest(generate_series(1, len(ltr) - 1)) AS pos
                FROM l),
            b2 AS (SELECT doc_id, substr(ltr, pos, 2) AS b FROM bg),
            prof(lang, b, w) AS (VALUES
                ('en','th',10),('en','he',9),('en','in',8),('en','er',7),('en','an',6),
                ('en','re',5),('en','on',4),('en','at',3),('en','en',2),('en','nd',1),
                ('es','de',10),('es','en',9),('es','os',8),('es','es',7),('es','la',6),
                ('es','ar',5),('es','el',4),('es','ue',3),('es','ra',2),('es','as',1),
                ('de','en',10),('de','er',9),('de','ch',8),('de','de',7),('de','ei',6),
                ('de','te',5),('de','in',4),('de','nd',3),('de','ie',2),('de','ge',1),
                ('fr','es',10),('fr','le',9),('fr','de',8),('fr','en',7),('fr','re',6),
                ('fr','nt',5),('fr','on',4),('fr','ou',3),('fr','ai',2),('fr','it',1)),
            sc AS (
                SELECT b2.doc_id, prof.lang, sum(prof.w) AS s
                FROM b2 JOIN prof USING (b) GROUP BY 1, 2),
            best AS (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY s DESC, lang) AS rn
                FROM sc)
            SELECT l.doc_id,
                   CASE WHEN len(l.ltr) < 4 THEN 'und'
                        ELSE coalesce(b.lang, 'und') END AS lang_pred
            FROM l LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b
              USING (doc_id)
        """,
        "customers_without_orders": """
            SELECT c.c_custkey, c.c_name
            FROM customer c
            ANTI JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
              ON o.o_custkey = c.c_custkey
        """,
        "simhash_signatures": f"""
            WITH {sim_cte}
            SELECT doc_id, simhash FROM sim_sig
        """,
        "simhash_neardup_pairs": f"""
            WITH {sim_cte}
            SELECT a, b, hamming FROM sim_pairs
        """,
        "minhash_sketch": f"""
            WITH {mh_cte}
            SELECT d.doc_id, CAST(pm.p AS BIGINT) AS perm,
                   coalesce(m.mh, 9223372036854775807) AS minhash
            FROM documents d CROSS JOIN perms pm
            LEFT JOIN mh_mn m ON m.doc_id = d.doc_id AND m.perm = pm.p
        """,
        "minhash_neardup_pairs": f"""
            WITH {mh_pairs_cte}
            SELECT a, b, floor(j * 10000) / 10000 AS jaccard
            FROM mh_jac WHERE j >= 0.5
        """,
        "neardup_survivors": closure_sql(
            f"{mh_pairs_cte},\n            vp AS (SELECT a, b FROM mh_jac WHERE j >= 0.5)",
            "vp",
        ),
        "neardup_survivors_simhash": closure_sql(sim_cte, "sim_pairs"),
        "customers_with_orders": """
            SELECT c.c_custkey, c.c_name
            FROM customer c
            SEMI JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
              ON o.o_custkey = c.c_custkey
        """,
        "decontaminate_docs": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            grams AS (
                SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
                FROM tk, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
            SELECT grams.doc_id, count(*) AS n_hits
            FROM grams JOIN bench USING (g)
            WHERE grams.doc_id % 97 <> 0
            GROUP BY 1
        """,
        "domain_quota_docs": """
            SELECT doc_id, source, n_chars FROM (
                SELECT doc_id, source, n_chars,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id) AS rn
                FROM documents) WHERE rn <= 10
        """,
        "quality_percentile_docs": """
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN (
                SELECT lang, quantile_disc(n_chars, 0.9) AS cut
                FROM documents GROUP BY 1) t USING (lang)
            WHERE d.n_chars >= t.cut
        """,
        "doc_token_entropy": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            p AS (SELECT doc_id, unnest(t) AS tok, len(t) AS n FROM tk),
            c AS (SELECT doc_id, tok, max(n) AS n, count(*) AS c
                  FROM p GROUP BY doc_id, tok),
            e AS (SELECT doc_id, max(n) AS n_tokens,
                         floor((log2(CAST(max(n) AS DOUBLE))
                                - sum(c * log2(CAST(c AS DOUBLE))) / max(n))
                               * 10000) / 10000 AS entropy
                  FROM c GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(e.n_tokens, 0) AS n_tokens,
                   coalesce(e.entropy, 0.0) AS entropy
            FROM documents d LEFT JOIN e USING (doc_id)
        """,
        "unigram_xent_docs": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            p AS (SELECT doc_id, unnest(t) AS tok, len(t) AS n FROM tk),
            c AS (SELECT doc_id, tok, count(*) AS c, max(n) AS n
                  FROM p GROUP BY doc_id, tok),
            ct AS (SELECT tok, sum(c) AS ct FROM c GROUP BY tok),
            tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS n_total FROM ct),
            e AS (
                SELECT c.doc_id, max(c.n) AS n_tokens,
                       floor(sum(c.c * (log2((SELECT n_total FROM tot))
                                        - log2(CAST(ct.ct AS DOUBLE))))
                             / max(c.n) * 10000) / 10000 AS xent
                FROM c JOIN ct USING (tok) GROUP BY c.doc_id)
            SELECT d.doc_id,
                   coalesce(e.n_tokens, 0) AS n_tokens,
                   coalesce(e.xent, 0.0) AS xent
            FROM documents d LEFT JOIN e USING (doc_id)
        """,
        "token_repetition_stats": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            p AS (
                SELECT doc_id, unnest(t) AS tok,
                       unnest(range(1, len(t) + 1)) AS pos, len(t) AS n
                FROM tk),
            c AS (SELECT doc_id, tok, count(*) AS c, max(n) AS n
                  FROM p GROUP BY doc_id, tok),
            tf AS (SELECT doc_id, max(n) AS n,
                          floor((CAST(max(c) AS DOUBLE) * 10000) / max(n))
                            / 10000 AS top_frac
                   FROM c GROUP BY doc_id),
            -- gaps-and-islands: consecutive positions of one token share
            -- (pos - row_number) and form one run
            m AS (SELECT doc_id, tok, pos,
                         pos - row_number() OVER (PARTITION BY doc_id, tok
                                                  ORDER BY pos) AS grp
                  FROM p),
            runs AS (SELECT doc_id, count(*) AS run
                     FROM m GROUP BY doc_id, tok, grp),
            mr AS (SELECT doc_id, max(run) AS max_run FROM runs GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(tf.n, 0) AS n_tokens,
                   coalesce(tf.top_frac, 0.0) AS top_token_frac,
                   coalesce(mr.max_run, 0) AS max_run,
                   coalesce(tf.top_frac <= 0.125 AND mr.max_run <= 2, FALSE) AS keep
            FROM documents d
            LEFT JOIN tf USING (doc_id)
            LEFT JOIN mr USING (doc_id)
        """,
        "dup_ngram_ratio": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            g AS (
                SELECT doc_id, len(t) - 2 AS total,
                       len(list_distinct(list_transform(
                           range(1, len(t) - 1),
                           i -> array_to_string(t[i:i+2], ' ')))) AS dist
                FROM tk WHERE len(t) >= 3)
            SELECT d.doc_id,
                   coalesce(g.total, 0) AS n_ngrams,
                   coalesce(floor((1.0 - CAST(g.dist AS DOUBLE) / g.total)
                                  * 10000) / 10000, 0.0) AS dup_ratio
            FROM documents d LEFT JOIN g USING (doc_id)
        """,
        "curated_docs": r"""
            WITH sig AS (
                SELECT doc_id, md5(coalesce(text, '')) AS fp,
                       CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
                       coalesce(text, '') AS txt
                FROM documents),
            st AS (
                SELECT doc_id,
                       CASE WHEN n_tokens = 0 THEN 0.0
                            ELSE floor((CAST(len(list_filter(
                                     regexp_split_to_array(trim(txt), '\s+'),
                                     x -> x IN ('the','a','of','to','and','in','is')))
                                   AS DOUBLE) * 10000) / n_tokens) / 10000 END AS stop_ratio
                FROM sig),
            tk AS (
                SELECT doc_id, regexp_split_to_array(trim(txt), '\s+') AS t
                FROM sig WHERE n_tokens > 0),
            p AS (SELECT doc_id, unnest(t) AS tok, len(t) AS n FROM tk),
            cc AS (SELECT doc_id, tok, max(n) AS n, count(*) AS c
                   FROM p GROUP BY doc_id, tok),
            en AS (SELECT doc_id,
                          floor((log2(CAST(max(n) AS DOUBLE))
                                 - sum(c * log2(CAST(c AS DOUBLE))) / max(n))
                                * 10000) / 10000 AS entropy
                   FROM cc GROUP BY doc_id),
            du AS (
                SELECT doc_id, floor((1.0 - CAST(len(list_distinct(list_transform(
                           range(1, len(t) - 1),
                           i -> array_to_string(t[i:i+2], ' ')))) AS DOUBLE)
                           / (len(t) - 2)) * 10000) / 10000 AS dup_ratio
                FROM tk WHERE len(t) >= 3),
            win AS (SELECT fp, min(doc_id) AS keep FROM sig GROUP BY fp)
            SELECT s.doc_id, s.n_tokens,
                   coalesce(en.entropy, 0.0) AS entropy,
                   coalesce(du.dup_ratio, 0.0) AS dup_ratio
            FROM sig s
            JOIN win w ON s.doc_id = w.keep
            LEFT JOIN st USING (doc_id)
            LEFT JOIN en USING (doc_id)
            LEFT JOIN du USING (doc_id)
            WHERE s.n_tokens >= 20
              AND st.stop_ratio >= 0.01 AND st.stop_ratio <= 0.6
              AND coalesce(en.entropy, 0.0) >= 3.0
              AND coalesce(du.dup_ratio, 0.0) <= 0.2
        """,
        "pack_sequences": r"""
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                         AS n_tokens,
                       CAST(doc_id % 8 AS INT) AS bucket
                FROM documents),
            c AS (
                SELECT doc_id, bucket, n_tokens,
                       CAST(coalesce(sum(n_tokens) OVER (
                                PARTITION BY bucket ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS BIGINT) AS tok_start
                FROM t)
            SELECT doc_id, bucket, n_tokens, tok_start,
                   tok_start // 256 AS seq_in_bucket
            FROM c
        """,
        "top_customers": """
            SELECT t.c_custkey, c.c_name, t.total_price
            FROM (SELECT o_custkey AS c_custkey, round(sum(o_totalprice), 2) AS total_price
                  FROM orders GROUP BY o_custkey) t
            JOIN customer c ON c.c_custkey = t.c_custkey
            ORDER BY t.total_price DESC, t.c_custkey
            LIMIT 10
        """,
        "extract_pdf_kernel": extract_pdf_sql,
        "extract_html_kernel": extract_html_sql,
        # C4-style line-level dedup: 8-token chunks, corpus-wide first
        # occurrence survives (min doc_id, then min position); the
        # dedup key is md5_number_lower(chunk) >> 1 on BOTH sides (the
        # repo's shared hash64 idiom, functions/hashing.py)
        "line_dedup_docs": r"""
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            chunks AS (
              SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
                     array_to_string(t[(u.i*8+1):(u.i*8+8)], ' ') AS chunk
              FROM toks, LATERAL (SELECT unnest(range(CAST(ceil(len(t)/8.0) AS BIGINT))) AS i) u
            ),
            ranked AS (
              SELECT doc_id, chunk_idx, chunk,
                     count(*) OVER (PARTITION BY doc_id) AS n_chunks,
                     min(doc_id * 1048576 + chunk_idx)
                         OVER (PARTITION BY md5_number_lower(chunk) >> 1) AS wkey
              FROM chunks
            )
            SELECT doc_id,
                   string_agg(chunk, ' ' ORDER BY chunk_idx) AS kept_text,
                   min(n_chunks) AS n_chunks,
                   count(*) AS n_kept
            FROM ranked WHERE doc_id * 1048576 + chunk_idx = wkey
            GROUP BY doc_id
        """,
        # PII scrub over artifact-wrapped text (deterministic injection,
        # the extract-kernel wrap pattern); scrub order pinned
        # email -> phone -> IP on both sides, RE2-compatible patterns
        "redact_pii_docs": r"""
            WITH wrapped AS (
              SELECT doc_id,
                     coalesce(text, '') || ' contact user' || doc_id || '@example.com'
                     || CASE WHEN doc_id % 2 = 1 THEN ' alt' || doc_id || '@mail.example.org' ELSE '' END
                     || ' tel 555-' || (1000 + doc_id % 9000)
                     || CASE WHEN doc_id % 3 = 0 THEN ' host 10.0.' || (doc_id % 256) || '.' || (doc_id % 254 + 1) ELSE '' END
                     AS t
              FROM documents
            ),
            e AS (SELECT doc_id,
                         len(regexp_extract_all(t, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}')) AS n_emails,
                         regexp_replace(t, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
                  FROM wrapped),
            p AS (SELECT doc_id, n_emails,
                         len(regexp_extract_all(t, '\b\d{3}-\d{4}\b')) AS n_phones,
                         regexp_replace(t, '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS t
                  FROM e)
            SELECT doc_id, n_emails, n_phones,
                   len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
                   regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean_text
            FROM p
        """,
        # product-analytics retention triangle: cohort = day of a
        # user's first event; n_users = cohort members active at each
        # day offset
        "user_retention_cohorts": """
            WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
            firsts AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
            SELECT f.cohort_day,
                   date_diff('day', f.cohort_day, u.day) AS day_offset,
                   count(*) AS n_users
            FROM ud u JOIN firsts f USING (user_id)
            GROUP BY 1, 2
        """,
        # TPC-H Q5 shape: 6-table snowflake with the customer-nation =
        # supplier-nation cross-dimension equality, region-filtered
        "local_supplier_volume": """
            SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
            GROUP BY n_name
        """,
        # two-step funnel: of users whose first click fell on click_day,
        # how many first-purchased within 7 days of that click
        "conversion_funnel": """
            WITH c AS (SELECT user_id, min(ts) AS first_click FROM events
                       WHERE event_type = 'click' GROUP BY 1),
            p AS (SELECT user_id, min(ts) AS first_purchase FROM events
                  WHERE event_type = 'purchase' GROUP BY 1)
            SELECT date_trunc('day', first_click) AS click_day,
                   count(*) AS n_clickers,
                   sum(CASE WHEN first_purchase >= first_click
                             AND first_purchase <= first_click + INTERVAL 7 DAY
                        THEN 1 ELSE 0 END) AS n_converted
            FROM c LEFT JOIN p USING (user_id)
            GROUP BY 1
        """,
        # hot-key-salted shuffle join: the dimension weight is derived
        # from the shared hash64 idiom so SQL rebuilds it exactly
        "salted_skew_join": """
            WITH dim AS (SELECT DISTINCT event_type,
                         CAST(md5_number_lower(event_type) % 100 AS DOUBLE) / 10.0 AS weight
                         FROM events)
            SELECT user_id, round(sum(value * weight), 4) AS score
            FROM events JOIN dim USING (event_type)
            GROUP BY user_id
        """,
        # snapshot-incremental dedup: new batch (doc_id%10>=5) anti-joins
        # the prior snapshot's digest set; in-batch dups keep lowest id
        "dedup_incremental": """
            WITH prior AS (SELECT DISTINCT md5(coalesce(text, '')) AS h
                           FROM documents WHERE doc_id % 10 < 5),
            new_batch AS (
              SELECT doc_id, n_chars, md5(coalesce(text, '')) AS h,
                     row_number() OVER (PARTITION BY md5(coalesce(text, ''))
                                        ORDER BY doc_id) AS rn
              FROM documents WHERE doc_id % 10 >= 5)
            SELECT doc_id, n_chars FROM new_batch
            WHERE rn = 1 AND h NOT IN (SELECT h FROM prior)
        """,
        # LEFT OUTER join with zero-fill for never-ordered customers
        "customer_order_counts": """
            SELECT c_custkey, count(o_custkey) AS n_orders,
                   round(coalesce(sum(o_totalprice), 0), 2) AS total_price
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        """,
        # top-k consecutive event-type sequences per user order
        "event_path_topk": """
            WITH o AS (
                SELECT event_type,
                       lead(event_type, 1) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS e2,
                       lead(event_type, 2) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS e3
                FROM events)
            SELECT event_type || '>' || e2 || '>' || e3 AS path,
                   count(*) AS n
            FROM o WHERE e3 IS NOT NULL
            GROUP BY 1 ORDER BY n DESC, path LIMIT 10
        """,
        # rolling 7-day distinct-user count anchored to observed days
        "weekly_active_users": """
            WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                        FROM events),
            days AS (SELECT DISTINCT day FROM ud)
            SELECT d.day, count(DISTINCT u.user_id) AS wau
            FROM days d JOIN ud u
              ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
            GROUP BY d.day
        """,
        # top-k adjacent-token collocations by PMI; the association
        # ratio is computed in the same (c*N)/(cl*cr) order as the Ray
        # kernel so the floor-scaled double hashes identically
        "bigram_pmi_topk": r"""
            WITH tk AS (
                SELECT regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            uni AS (SELECT unnest(t) AS tok FROM tk),
            uc AS (SELECT tok, count(*) AS ct FROM uni GROUP BY tok),
            nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM uni),
            bg AS (
                SELECT t[i] AS l, t[i+1] AS r
                FROM tk, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)),
            bc AS (SELECT l, r, count(*) AS c FROM bg
                   GROUP BY l, r HAVING count(*) >= 5),
            scored AS (
                SELECT bc.l || ' ' || bc.r AS ngram, bc.c AS n,
                       floor(log2(CAST(bc.c AS DOUBLE) * (SELECT n_total FROM nt)
                                  / (CAST(ul.ct AS DOUBLE) * ur.ct))
                             * 10000) / 10000 AS pmi
                FROM bc JOIN uc ul ON ul.tok = bc.l
                        JOIN uc ur ON ur.tok = bc.r)
            SELECT ngram, n, pmi FROM scored
            ORDER BY pmi DESC, ngram LIMIT 20
        """,
        # DSIR importance weights: hashed token-bigram log-likelihood
        # ratio of target (doc_id%97==0) vs raw; bucket = the shared
        # hash64 (md5_number_lower) % 1024 so SQL rebuilds the features
        # exactly, add-1 smoothing on both sides
        "dsir_importance_weights": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            grams AS (
                SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
                FROM tk, UNNEST(range(1, len(t))) AS u(i)),
            b AS (SELECT doc_id,
                         CAST(md5_number_lower(g) % 1024 AS BIGINT) AS bkt
                  FROM grams),
            tgt AS (SELECT bkt, count(*) AS c FROM b WHERE doc_id % 97 = 0 GROUP BY 1),
            rw AS (SELECT bkt, count(*) AS c FROM b WHERE doc_id % 97 <> 0 GROUP BY 1),
            tot AS (SELECT (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) FROM tgt) AS nt,
                           (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) FROM rw) AS nr),
            lr AS (SELECT r.k AS bkt,
                          ln((coalesce(t.c, 0) + 1) / ((SELECT nt FROM tot) + 1024.0))
                          - ln((coalesce(w.c, 0) + 1) / ((SELECT nr FROM tot) + 1024.0)) AS w
                   FROM range(0, 1024) r(k)
                   LEFT JOIN tgt t ON t.bkt = r.k
                   LEFT JOIN rw w ON w.bkt = r.k),
            sc AS (SELECT b.doc_id, count(*) AS n_grams, sum(lr.w) AS s
                   FROM b JOIN lr USING (bkt)
                   WHERE b.doc_id % 97 <> 0 GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(sc.n_grams, 0) AS n_grams,
                   coalesce(floor(sc.s * 10000) / 10000, 0.0) AS logweight
            FROM documents d LEFT JOIN sc USING (doc_id)
            WHERE d.doc_id % 97 <> 0
        """,
        # exact-substring duplication sampled at fixed 32-char windows
        # every 16 chars; window hash = the shared hash64 idiom
        "substring_dup_spans": """
            WITH w AS (
                SELECT doc_id, md5_number_lower(substr(text, CAST(p AS INT), 32)) AS h
                FROM documents,
                     UNNEST(generate_series(1, len(coalesce(text, '')) - 31, 16)) AS u(p)),
            nd AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY h),
            per AS (SELECT w.doc_id, count(*) AS n_windows,
                           CAST(coalesce(sum(CASE WHEN nd.n_docs >= 2
                                                  THEN 1 ELSE 0 END), 0)
                                AS BIGINT) AS n_dup
                    FROM w JOIN nd USING (h) GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(per.n_windows, 0) AS n_windows,
                   coalesce(per.n_dup, 0) AS n_dup_windows,
                   coalesce(floor(CAST(per.n_dup AS DOUBLE) / per.n_windows
                                  * 10000) / 10000, 0.0) AS dup_frac
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "neardup_survivors_cosine": closure_sql(
            """cp AS (
                SELECT a.vec_id AS a, b.vec_id AS b
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[])) >= 0.4)""",
            "cp", id_table="embeddings", id_col="vec_id",
        ),
        # CCNet perplexity terciles: the unigram-xent CTE chain + exact
        # quantile_disc cuts (1-based ceil(n*q)-th element, the same
        # semantics the Ray side reads off its bounded histogram)
        "ccnet_bucket_docs": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            p AS (SELECT doc_id, unnest(t) AS tok, len(t) AS n FROM tk),
            c AS (SELECT doc_id, tok, count(*) AS c, max(n) AS n
                  FROM p GROUP BY doc_id, tok),
            ct AS (SELECT tok, sum(c) AS ct FROM c GROUP BY tok),
            tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS n_total FROM ct),
            e AS (
                SELECT c.doc_id, max(c.n) AS n_tokens,
                       floor(sum(c.c * (log2((SELECT n_total FROM tot))
                                        - log2(CAST(ct.ct AS DOUBLE))))
                             / max(c.n) * 10000) / 10000 AS xent
                FROM c JOIN ct USING (tok) GROUP BY c.doc_id),
            cuts AS (SELECT quantile_disc(xent, 1.0/3) AS c1,
                            quantile_disc(xent, 2.0/3) AS c2 FROM e)
            SELECT doc_id, n_tokens, xent,
                   CASE WHEN xent <= c1 THEN 'head'
                        WHEN xent <= c2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM e, cuts
        """,
        # fixed-size context-window chunking: non-overlapping 64-token
        # chunks of the whitespace-token stream (1-based inclusive list
        # slicing mirrors the Python [ci*64:(ci+1)*64] slice)
        "chunk_docs": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t,
                       len(regexp_split_to_array(trim(text), '\s+')) AS n
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            ch AS (
                SELECT doc_id, t, n, CAST(u.ci AS BIGINT) AS chunk_id
                FROM tk, UNNEST(range(0, CAST(ceil(n / 64.0) AS BIGINT))) AS u(ci))
            SELECT doc_id, chunk_id,
                   least(64, n - chunk_id * 64) AS n_tokens,
                   array_to_string(t[chunk_id * 64 + 1:least((chunk_id + 1) * 64, n)],
                                   ' ') AS chunk_text
            FROM ch
        """,
        # XLM-R-style temperature resampling: doc weight q_l/p_l with
        # q_l ∝ p_l^0.3; floor-scaled 1e4 per the bit-match rule
        "lang_temperature_weights": """
            WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
                       FROM documents GROUP BY lang),
            tot AS (SELECT sum(n) AS total FROM c),
            w AS (SELECT lang, n / (SELECT total FROM tot) AS p,
                         pow(n / (SELECT total FROM tot), 0.3) AS pa
                  FROM c),
            z AS (SELECT sum(pa) AS zz FROM w)
            SELECT d.doc_id, d.lang,
                   floor(w.pa / (SELECT zz FROM z) / w.p * 10000) / 10000
                       AS doc_weight
            FROM documents d JOIN w USING (lang)
        """,
        # per-language z-score normalization; population variance via the
        # same explicit (sumsq - sum^2/n)/n formula as the Ray side
        # Gopher rule set: every ratio floor-scaled to 1e4 and thresholds
        # compared on the SCALED values, mirroring the Ray kernel
        "gopher_quality_docs": rf"""
            WITH t AS (
                SELECT doc_id, coalesce(text, '') AS txt,
                       CASE WHEN trim(coalesce(text, '')) = '' THEN NULL
                            ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
                FROM documents),
            f AS (
                SELECT doc_id,
                       coalesce(len(tk), 0) AS n_words,
                       coalesce(len(array_to_string(tk, '')), 0) AS sum_len,
                       coalesce(len(list_filter(tk,
                           x -> regexp_matches(x, '[A-Za-z]'))), 0) AS n_alpha,
                       coalesce(len(list_filter(tk,
                           x -> x IN {_STOP_SQL})), 0) AS n_stop,
                       len(txt) - len(replace(txt, '#', ''))
                         + len(regexp_extract_all(txt, '\.\.\.')) AS symbols
                FROM t),
            s AS (
                SELECT doc_id, n_words, n_stop,
                       floor(CAST(sum_len AS DOUBLE) / greatest(n_words, 1)
                             * 10000) / 10000 AS mean_word_len,
                       floor(CAST(n_alpha AS DOUBLE) / greatest(n_words, 1)
                             * 10000) / 10000 AS frac_alpha_words,
                       floor(CAST(symbols AS DOUBLE) / greatest(n_words, 1)
                             * 10000) / 10000 AS symbol_ratio
                FROM f)
            SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
                   symbol_ratio, n_stop,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND symbol_ratio < 0.1 AND frac_alpha_words >= 0.8
                    AND n_stop >= 2) AS keep
            FROM s
        """,
        # Stupid Backoff: per-(doc, bigram) c-weighted log terms so the
        # arithmetic matches the Ray kernel's distinct-bigram rows; the
        # LM prune (ctb >= 30) decides hit vs backoff on both sides
        "stupid_backoff_xent": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            bg AS (
                SELECT doc_id, t[i] AS l, t[i+1] AS r
                FROM tk, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)),
            bgc AS (SELECT doc_id, l, r, count(*) AS c FROM bg GROUP BY 1, 2, 3),
            bc AS (SELECT l, r, sum(c) AS ctb FROM bgc GROUP BY l, r),
            lm AS (SELECT * FROM bc WHERE ctb >= 30),
            uni AS (SELECT unnest(t) AS tok FROM tk),
            uc AS (SELECT tok, count(*) AS ct FROM uni GROUP BY tok),
            nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM uni),
            sc AS (
                SELECT bgc.doc_id, bgc.c,
                       bgc.c * CASE WHEN lm.ctb IS NOT NULL
                            THEN log2(CAST(lm.ctb AS DOUBLE))
                                 - log2(CAST(ul.ct AS DOUBLE))
                            ELSE log2(0.4) + log2(CAST(ur.ct AS DOUBLE))
                                 - log2((SELECT n FROM nt))
                       END AS lg
                FROM bgc
                LEFT JOIN lm ON lm.l = bgc.l AND lm.r = bgc.r
                JOIN uc ul ON ul.tok = bgc.l
                JOIN uc ur ON ur.tok = bgc.r),
            e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                         floor(-sum(lg) / sum(c) * 10000) / 10000 AS xent
                  FROM sc GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(e.n_bigrams, 0) AS n_bigrams,
                   coalesce(e.xent, 0.0) AS xent
            FROM documents d LEFT JOIN e USING (doc_id)
        """,
        "quality_zscore_by_lang": """
            WITH m AS (SELECT lang, count(*) AS n,
                              sum(CAST(n_chars AS DOUBLE)) AS s,
                              sum(CAST(n_chars AS DOUBLE) * n_chars) AS s2
                       FROM documents GROUP BY lang)
            SELECT doc_id, d.lang,
                   round((n_chars - s / n) / sqrt((s2 - s * s / n) / n), 6) AS zscore
            FROM documents d JOIN m ON d.lang = m.lang
        """,
        # fastText-style classifier: hashed token-bigram features via the
        # shared md5 idiom, deterministic Knuth-multiplicative weights
        "hashed_ngram_quality": r"""
            WITH tk AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            grams AS (
                SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
                FROM tk, UNNEST(range(1, len(t))) AS u(i)),
            b AS (SELECT doc_id,
                         CAST(md5_number_lower(g) % 2048 AS BIGINT) AS bkt
                  FROM grams),
            sc AS (SELECT doc_id, count(*) AS n_grams,
                          sum(((bkt * 2654435761) % 4096) / 2048.0 - 1.0) AS s
                   FROM b GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(sc.n_grams, 0) AS n_grams,
                   coalesce(floor(sc.s / sc.n_grams * 10000) / 10000, 0.0) AS score,
                   coalesce(sc.s / sc.n_grams > 0.0, false) AS keep
            FROM documents d LEFT JOIN sc USING (doc_id)
        """,
        # TPC-H Q4 shape: EXISTS semi-join with an inequality predicate
        "order_priority_counts": """
            SELECT o.o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY 1
        """,
        # TPC-H Q10 shape: returned-item revenue per customer, top 20
        "returned_item_ranking": """
            WITH rev AS (
                SELECT o.o_custkey AS c_custkey,
                       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                           AS revenue
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE l.l_returnflag = 'R'
                GROUP BY 1)
            SELECT c.c_custkey, c.c_name, c.c_acctbal, rev.revenue
            FROM rev JOIN customer c USING (c_custkey)
            ORDER BY rev.revenue DESC, c.c_custkey
            LIMIT 20
        """,
        # per-group top-k window: the k longest docs of every source
        "top_docs_per_source": """
            SELECT doc_id, source, n_chars FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 5
        """,
        # within-label centroid distance over the embedding table
        "embedding_centroid_dist": """
            WITH e AS (
                SELECT vec_id, label, i AS dim,
                       CAST(embedding[i] AS DOUBLE) AS v
                FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
            c AS (SELECT label, dim, avg(v) AS cv FROM e GROUP BY 1, 2),
            d AS (SELECT e.vec_id, e.label,
                         sqrt(sum((e.v - c.cv) * (e.v - c.cv))) AS dist
                  FROM e JOIN c ON e.label = c.label AND e.dim = c.dim
                  GROUP BY 1, 2)
            SELECT vec_id, label, floor(dist * 10000) / 10000 AS dist FROM d
        """,
        # LAG over an aggregated monthly revenue series
        "orders_monthly_growth": """
            WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                              round(sum(o_totalprice), 2) AS revenue
                       FROM orders GROUP BY 1)
            SELECT month, revenue,
                   coalesce(round(revenue / lag(revenue)
                                  OVER (ORDER BY month) - 1, 6), 0.0) AS growth
            FROM m
        """,
        # calendar-keyed anomaly: (day, hour) counts z-scored against the
        # same hour-of-day's across-day distribution (population moments)
        "events_anomaly_hours": """
            WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                              CAST(extract(hour FROM ts) AS BIGINT) AS hour,
                              CAST(count(*) AS BIGINT) AS n_events
                       FROM events GROUP BY 1, 2),
            m AS (SELECT hour, count(*) AS nd,
                         sum(CAST(n_events AS DOUBLE)) AS s1,
                         sum(CAST(n_events AS DOUBLE) * n_events) AS s2
                  FROM c GROUP BY 1)
            SELECT c.day, c.hour, c.n_events,
                   CASE WHEN (m.s2 - m.s1 * m.s1 / m.nd) / m.nd > 0
                        THEN round((c.n_events - m.s1 / m.nd)
                                   / sqrt((m.s2 - m.s1 * m.s1 / m.nd) / m.nd), 6)
                        ELSE 0.0 END AS zscore
            FROM c JOIN m USING (hour)
        """,
        # Zipf exponent over the top-1000 tokens: -slope of ln(freq) on
        # ln(rank) (regr_slope = covar_pop/var_pop, the same least-squares
        # fit the Ray side computes)
        "token_zipf_alpha": r"""
            WITH tk AS (
                SELECT regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            uni AS (SELECT unnest(t) AS tok FROM tk),
            uc AS (SELECT tok, count(*) AS n FROM uni GROUP BY tok),
            r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank
                  FROM uc QUALIFY rank <= 1000)
            SELECT CAST(count(*) AS BIGINT) AS n_vocab,
                   coalesce(round(-regr_slope(ln(CAST(n AS DOUBLE)),
                                              ln(CAST(rank AS DOUBLE))), 6),
                            0.0) AS alpha
            FROM r
        """,
        # per-source corpus report card
        "source_quality_report": """
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
            FROM documents GROUP BY source
        """,
        # Efraimidis–Spirakis A-ES weighted sample, u from the shared md5
        # idiom: rank by ln(u)/w (same order as u^(1/w)), top-k wins
        "weighted_sample_docs": """
            WITH s AS (
                SELECT doc_id, n_chars,
                       ln(md5_number_lower(CAST(doc_id AS VARCHAR))
                          / 18446744073709551616.0) / n_chars AS key
                FROM documents WHERE n_chars > 0)
            SELECT doc_id, n_chars FROM s
            ORDER BY key DESC, doc_id LIMIT 100
        """,
        # three-source cogroup: customer dim + per-key order/event facts
        "customer_activity_summary": """
            SELECT c.c_custkey, c.c_name,
                   coalesce(o.n_orders, 0) AS n_orders,
                   coalesce(o.total_spend, 0.0) AS total_spend,
                   coalesce(e.n_events, 0) AS n_events,
                   e.last_event_ts
            FROM customer c
            LEFT JOIN (SELECT o_custkey,
                              CAST(count(*) AS BIGINT) AS n_orders,
                              round(sum(o_totalprice), 2) AS total_spend
                       FROM orders GROUP BY 1) o
              ON o.o_custkey = c.c_custkey
            LEFT JOIN (SELECT user_id,
                              CAST(count(*) AS BIGINT) AS n_events,
                              max(ts) AS last_event_ts
                       FROM events GROUP BY 1) e
              ON e.user_id = c.c_custkey
        """,
        # cross-crawl contamination matrix: distinct token 5-grams shared
        # by every source pair (a < b); the SQL joins gram strings where
        # the Ray side joins their 64-bit hashes (same equivalence up to
        # md5 collisions, the dedup_exact convention)
        "cross_source_overlap": r"""
            WITH tk AS (
                SELECT source, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE trim(coalesce(text, '')) <> ''),
            g AS (SELECT DISTINCT source, array_to_string(t[i:i+4], ' ') AS g
                  FROM tk, UNNEST(range(1, len(t) - 3)) AS u(i))
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
            GROUP BY 1, 2
        """,
        # Kolmogorov-Smirnov drift between the train/valid length
        # distributions (split: doc_id % 10 < 8)
        "ks_drift_stats": """
            WITH d AS (SELECT n_chars AS v,
                              CASE WHEN doc_id % 10 < 8 THEN 1 ELSE 0 END
                                  AS is_tr
                       FROM documents),
            tot AS (SELECT CAST(sum(is_tr) AS DOUBLE) AS nt,
                           CAST(sum(1 - is_tr) AS DOUBLE) AS nv
                    FROM d),
            c AS (SELECT v, sum(is_tr) AS ct, sum(1 - is_tr) AS cv
                  FROM d GROUP BY v),
            k AS (SELECT sum(ct) OVER (ORDER BY v) / (SELECT nt FROM tot)
                             AS f1,
                         sum(cv) OVER (ORDER BY v) / (SELECT nv FROM tot)
                             AS f2
                  FROM c)
            SELECT (SELECT CAST(nt AS BIGINT) FROM tot) AS n_train,
                   (SELECT CAST(nv AS BIGINT) FROM tot) AS n_valid,
                   round(max(abs(f1 - f2)), 6) AS ks
            FROM k
        """,
        # semi-structured extraction: aggregate over the integer `k`
        # field of the JSON props column; coalesce-to-0 matches the Ray
        # side's fillna(0) for a hypothetical all-null group
        "event_props_stats": """
            SELECT event_type,
                   count(*) AS n_events,
                   coalesce(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                                 AS BIGINT), 0) AS sum_k,
                   coalesce(CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                                 AS BIGINT), 0) AS max_k
            FROM events GROUP BY event_type
        """,
        # TPC-H Q6 shape: filter-pushdown scan + global scalar aggregate
        "revenue_forecast": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        # grouped OLS: the oracle computes slope/intercept from the SAME
        # raw-moment formula over the SAME fixed-origin x (hours since
        # 2024-01-01), so both engines face identical conditioning
        "event_value_trend": """
            WITH d AS (
                SELECT event_type,
                       (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0 AS x,
                       value AS y
                FROM events),
            s AS (
                SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(x * y) AS sxy
                FROM d GROUP BY event_type)
            SELECT event_type, n,
                   round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
                   round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                         4) AS intercept
            FROM s
        """,
        # feature-correlation matrix over the lineitem measures; corr()
        # (Welford) vs the Ray side's raw moments agree at round(6) —
        # the measures are O(1)-O(10^4) so cancellation is negligible
        "lineitem_correlations": """
            WITH pairs(col_a, col_b) AS (VALUES
                ('l_quantity', 'l_extendedprice'),
                ('l_quantity', 'l_discount'),
                ('l_quantity', 'l_tax'),
                ('l_extendedprice', 'l_discount'),
                ('l_extendedprice', 'l_tax'),
                ('l_discount', 'l_tax')),
            c AS (SELECT count(*) AS n,
                         corr(l_quantity, l_extendedprice) AS c_qe,
                         corr(l_quantity, l_discount) AS c_qd,
                         corr(l_quantity, l_tax) AS c_qt,
                         corr(l_extendedprice, l_discount) AS c_ed,
                         corr(l_extendedprice, l_tax) AS c_et,
                         corr(l_discount, l_tax) AS c_dt
                  FROM lineitem)
            SELECT p.col_a, p.col_b, c.n,
                   round(CASE
                       WHEN p.col_a = 'l_quantity' AND p.col_b = 'l_extendedprice' THEN c_qe
                       WHEN p.col_a = 'l_quantity' AND p.col_b = 'l_discount' THEN c_qd
                       WHEN p.col_a = 'l_quantity' AND p.col_b = 'l_tax' THEN c_qt
                       WHEN p.col_a = 'l_extendedprice' AND p.col_b = 'l_discount' THEN c_ed
                       WHEN p.col_a = 'l_extendedprice' AND p.col_b = 'l_tax' THEN c_et
                       ELSE c_dt END, 6) AS corr
            FROM pairs p CROSS JOIN c
        """,
        # market-basket lift: event types co-occurring in the same
        # user-hour session; lift = n_sessions*n_both/(n_a*n_b)
        "session_type_affinity": """
            WITH ut AS (
                SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type
                FROM events),
            n AS (SELECT count(*) AS n_sessions
                  FROM (SELECT DISTINCT user_id, h FROM ut)),
            tc AS (SELECT event_type, count(*) AS c FROM ut GROUP BY event_type),
            pc AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                          count(*) AS n_both
                   FROM ut a JOIN ut b
                     ON a.user_id = b.user_id AND a.h = b.h
                    AND a.event_type < b.event_type
                   GROUP BY 1, 2)
            SELECT pc.type_a, pc.type_b, pc.n_both,
                   round(CAST(pc.n_both AS DOUBLE) * n.n_sessions
                         / (ta.c * tb.c), 6) AS lift
            FROM pc JOIN tc ta ON ta.event_type = pc.type_a
                    JOIN tc tb ON tb.event_type = pc.type_b
                    CROSS JOIN n
        """,
        # string-similarity join: distinct part names within edit
        # distance 1 (dist is always 1: names are distinct, so ED=0 is
        # impossible); the Ray side blocks on deletion neighborhoods,
        # the oracle brute-forces levenshtein over the tiny name dim
        "fuzzy_name_pairs": """
            WITH n AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
            FROM n a JOIN n b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 1
        """,
        # TPC-H Q14 shape: promo share of discounted revenue per ship-month
        "promo_revenue_monthly": """
            SELECT strftime(l.l_shipdate, '%Y-%m') AS month,
                   round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                                          THEN l.l_extendedprice * (1 - l.l_discount)
                                          ELSE 0 END)
                         / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                     AS promo_revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1
        """,
        # TPC-H Q17 shape: quantities are integral doubles, so per-part
        # sums (hence the avg and the < comparison) are exact on both
        # engines; the final sum is rounded after the /7 scale
        "small_quantity_revenue": """
            SELECT round(coalesce(sum(l.l_extendedprice), 0) / 7.0, 2)
                     AS yearly_revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = 'Brand#12'
              AND l.l_quantity < 0.2 * (
                    SELECT avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = l.l_partkey)
        """,
        # TPC-H Q18 shape: orders whose total quantity beats the HAVING
        # threshold, with their customer
        "large_order_customers": """
            SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice, round(t.sq, 2) AS sum_qty
            FROM (SELECT l_orderkey, sum(l_quantity) AS sq
                  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250) t
            JOIN orders o ON o.o_orderkey = t.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        # TPC-H Q22 shape: above-global-average balances with no URGENT
        # order, counted per nation
        "idle_rich_customers": """
            SELECT n.n_name AS nation,
                   count(*) AS n_cust,
                   round(sum(c.c_acctbal), 2) AS total_acctbal
            FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
            WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                                 WHERE c2.c_acctbal > 0)
              AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                                      WHERE o_orderpriority = '1-URGENT')
            GROUP BY 1
        """,
        # TPC-H Q13 shape: distribution of per-customer order counts,
        # zero bucket included via the LEFT join
        "order_count_distribution": """
            SELECT n_orders, count(*) AS n_customers FROM (
                SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
                FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                GROUP BY 1) GROUP BY 1
        """,
        # TPC-H Q7 shape: cross-border revenue per (supplier nation,
        # customer nation, ship year) — all cross pairs
        "nation_trade_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                     AS revenue
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            WHERE n1.n_name <> n2.n_name
            GROUP BY 1, 2, 3
        """,
        # TPC-H Q15 shape: supplier(s) at the global revenue maximum over
        # the ship window
        "top_supplier_revenue": """
            WITH r AS (
                SELECT l_suppkey,
                       sum(l_extendedprice * (1 - l_discount)) AS rev
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1997-07-01'
                GROUP BY 1)
            SELECT r.l_suppkey AS s_suppkey, s.s_name,
                   round(r.rev, 4) AS total_revenue
            FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
            WHERE r.rev = (SELECT max(rev) FROM r)
        """,
        # TPC-H Q19 shape: OR of (brand, size-range, qty-range)
        # conjunctions spanning both join sides (bounds mirror
        # analytics._Q19_RULES)
        "disjunctive_predicate_revenue": """
            SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                     AS revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 20
                   AND l.l_quantity BETWEEN 1 AND 20)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
                   AND l.l_quantity BETWEEN 10 AND 35)
               OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 40
                   AND l.l_quantity BETWEEN 20 AND 50)
        """,
    }
