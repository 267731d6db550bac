"""Semantic tests for the ninth-r5-session operators (beyond the
parametrized DuckDB-oracle equality in test_queries.py): JSON props
extraction, the Q6 pushdown scan, grouped OLS trend, the correlation
matrix, session market-basket lift, and the deletion-neighborhood
fuzzy string join."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in ["documents", "events", "part", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_event_props_stats_counts_every_event(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import event_props_stats

    got = event_props_stats(SF_DIR).to_pandas()
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert got["n_events"].sum() == n_events
    # k is 0..99 in the fixture, so per-type max is bounded and sums positive
    assert (got["max_k"] <= 99).all() and (got["sum_k"] > 0).all()


def test_revenue_forecast_matches_unfiltered_recompute(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import revenue_forecast

    got = revenue_forecast(SF_DIR).to_pandas()
    exp = con.execute(
        """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                  count(*) AS n
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
             AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""
    ).fetchone()
    assert len(got) == 1
    assert got["revenue"].iloc[0] == pytest.approx(exp[0], abs=0.011)
    assert int(got["n_items"].iloc[0]) == exp[1]


def test_event_value_trend_slope_matches_numpy_polyfit(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import event_value_trend

    got = event_value_trend(SF_DIR).to_pandas().set_index("event_type")
    ev = con.execute("SELECT event_type, ts, value FROM events").df()
    origin = pd.Timestamp("2024-01-01").to_datetime64()
    for t, g in ev.groupby("event_type"):
        x = (g["ts"].to_numpy("datetime64[us]") - origin).astype("int64") / 3.6e9
        slope, intercept = np.polyfit(x, g["value"].to_numpy(), 1)
        assert got.loc[t, "slope"] == pytest.approx(slope, abs=1e-5)
        assert got.loc[t, "intercept"] == pytest.approx(intercept, abs=1e-3)
        assert got.loc[t, "n"] == len(g)


def test_lineitem_correlations_match_pandas(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import lineitem_correlations

    got = lineitem_correlations(SF_DIR).to_pandas()
    li = con.execute(
        "SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem"
    ).df()
    assert len(got) == 6
    for _, r in got.iterrows():
        assert r["corr"] == pytest.approx(
            li[r["col_a"]].corr(li[r["col_b"]]), abs=1e-5
        )


def test_session_affinity_counts_bounded_by_sessions(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import session_type_affinity

    got = session_type_affinity(SF_DIR).to_pandas()
    n_sessions = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT user_id, date_trunc('hour', ts) FROM events)"
    ).fetchone()[0]
    assert (got["n_both"] <= n_sessions).all()
    assert (got["n_both"] >= 1).all() and (got["lift"] > 0).all()
    assert (got["type_a"] < got["type_b"]).all()


def test_fuzzy_pairs_blocking_is_recall_complete(ray_session, con):
    """The deletion-neighborhood candidates must reproduce the brute-force
    levenshtein<=1 pair set exactly (recall AND precision)."""
    from ocr_corrector_ray.pipelines.analytics import fuzzy_name_pairs

    got = (
        fuzzy_name_pairs(SF_DIR)
        .to_pandas()
        .sort_values(["name_a", "name_b"], ignore_index=True)
    )
    exp = con.execute(
        """WITH n AS (SELECT DISTINCT p_name FROM part)
           SELECT a.p_name AS name_a, b.p_name AS name_b
           FROM n a JOIN n b ON a.p_name < b.p_name
           WHERE levenshtein(a.p_name, b.p_name) <= 1
           ORDER BY 1, 2"""
    ).df()
    pd.testing.assert_frame_equal(got[["name_a", "name_b"]], exp)
    assert (got["dist"] == 1).all()
