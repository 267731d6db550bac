"""Semantic tests for the tenth-r5-session operators (beyond the
parametrized DuckDB-oracle equality in test_queries.py): the remaining
classic TPC-H join/aggregate shapes — Q14 conditional ratio, Q17
correlated per-group average, Q18 grouped HAVING join, Q22 scalar
subquery + anti-join, Q13 count distribution."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "part", "nation", "supplier"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_promo_revenue_is_a_percentage_over_all_months(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import promo_revenue_monthly

    got = promo_revenue_monthly(SF_DIR).to_pandas()
    n_months = con.execute(
        "SELECT count(DISTINCT strftime(l_shipdate, '%Y-%m')) FROM lineitem"
    ).fetchone()[0]
    assert len(got) == n_months
    assert got["promo_revenue"].between(0, 100).all()
    # promo parts exist in the fixture, so the share is non-trivial
    assert got["promo_revenue"].gt(0).any()


def test_small_quantity_revenue_bounds(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import small_quantity_revenue

    got = small_quantity_revenue(SF_DIR).to_pandas()
    assert len(got) == 1
    # strictly below the unconditional brand revenue (the avg filter bites)
    full = con.execute(
        """SELECT sum(l_extendedprice) / 7.0 FROM lineitem l
           JOIN part p ON p.p_partkey = l.l_partkey
           WHERE p.p_brand = 'Brand#12'"""
    ).fetchone()[0]
    assert 0 <= got["yearly_revenue"].iloc[0] < full


def test_large_order_customers_threshold_is_exact(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import large_order_customers

    got = large_order_customers(SF_DIR, min_qty=250.0).to_pandas()
    # every emitted order's recomputed quantity clears the threshold,
    # and no qualifying order is missed
    per_order = con.execute(
        "SELECT l_orderkey, sum(l_quantity) sq FROM lineitem GROUP BY 1"
    ).df().set_index("l_orderkey")["sq"]
    assert set(got["o_orderkey"]) == set(per_order[per_order > 250.0].index)
    for _, r in got.iterrows():
        assert r["sum_qty"] == pytest.approx(per_order[r["o_orderkey"]])
    # customer attach is consistent with the orders table
    o2c = con.execute("SELECT o_orderkey, o_custkey FROM orders").df()
    m = got.merge(o2c, on="o_orderkey")
    assert (m["c_custkey"] == m["o_custkey"]).all()


def test_idle_rich_customers_anti_join_holds(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import idle_rich_customers

    got = idle_rich_customers(SF_DIR).to_pandas()
    # recompute the qualifying set serially and compare per-nation counts
    exp = con.execute(
        """SELECT n.n_name AS nation, count(*) AS n_cust
           FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
           WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                                WHERE c2.c_acctbal > 0)
             AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                                     WHERE o_orderpriority = '1-URGENT')
           GROUP BY 1"""
    ).df()
    assert got["n_cust"].sum() == exp["n_cust"].sum() > 0
    merged = got.merge(exp, on="nation", suffixes=("", "_exp"))
    assert len(merged) == len(exp) == len(got)
    assert (merged["n_cust"] == merged["n_cust_exp"]).all()


def test_order_count_distribution_accounts_for_every_customer(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import order_count_distribution

    got = order_count_distribution(SF_DIR).to_pandas()
    n_cust = con.execute("SELECT count(*) FROM customer").fetchone()[0]
    n_orders = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    # partition of the customer set; counts weighted by k re-sum to |orders|
    assert got["n_customers"].sum() == n_cust
    assert (got["n_orders"] * got["n_customers"]).sum() == n_orders


def test_nation_trade_volume_excludes_domestic_and_covers_total(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import nation_trade_volume

    got = nation_trade_volume(SF_DIR).to_pandas()
    assert (got["supp_nation"] != got["cust_nation"]).all()
    # cross-border + domestic = all shipped revenue (recomputed serially)
    total = con.execute(
        """SELECT sum(l.l_extendedprice * (1 - l.l_discount))
           FROM lineitem l
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
           JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
           WHERE n1.n_name <> n2.n_name"""
    ).fetchone()[0]
    assert got["revenue"].sum() == pytest.approx(total, rel=1e-9)


def test_top_supplier_is_the_argmax(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import top_supplier_revenue

    got = top_supplier_revenue(SF_DIR).to_pandas()
    exp = con.execute(
        """SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-07-01'
           GROUP BY 1 ORDER BY rev DESC LIMIT 2"""
    ).df()
    assert len(got) >= 1
    assert got["s_suppkey"].iloc[0] == exp["l_suppkey"].iloc[0]
    # the winner strictly beats the runner-up (no hidden tie ambiguity)
    assert exp["rev"].iloc[0] > exp["rev"].iloc[1]
    assert got["total_revenue"].iloc[0] == pytest.approx(exp["rev"].iloc[0])


def test_disjunctive_predicate_matches_per_rule_union(ray_session, con):
    from ocr_corrector_ray.pipelines.analytics import (
        _Q19_RULES,
        disjunctive_predicate_revenue,
    )

    got = disjunctive_predicate_revenue(SF_DIR).to_pandas()
    # rules are brand-disjoint, so the union count is the sum of the
    # per-rule counts — recompute each conjunction independently
    n = 0
    for brand, max_size, qlo, qhi in _Q19_RULES:
        n += con.execute(
            f"""SELECT count(*) FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                WHERE p.p_brand = '{brand}' AND p.p_size BETWEEN 1 AND {max_size}
                  AND l.l_quantity BETWEEN {qlo} AND {qhi}"""
        ).fetchone()[0]
    assert int(got["n_items"].iloc[0]) == n > 0


def test_grouped_hll_matches_exact_within_error(ray_session, con):
    """Per-type HLL estimate within ~3 sigma (1.04/sqrt(2^12) ~= 1.6%) of
    the exact distinct-user count, for every event type."""
    from ocr_corrector_ray.pipelines.sketches import approx_distinct_users_by_type

    got = {
        r["event_type"]: r["n_users_approx"]
        for r in approx_distinct_users_by_type(SF_DIR).take_all()
    }
    con.execute(
        f"CREATE VIEW IF NOT EXISTS events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    exact = dict(con.execute(
        "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
    ).fetchall())
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert abs(got[t] - n) / n < 0.05, (t, got[t], n)


def test_pagerank_matches_dense_numpy(ray_session, con):
    """Distributed PageRank == dense numpy power iteration on the same
    bipartite edge set (same iteration count, same init, same damping)."""
    import numpy as np

    from ocr_corrector_ray.pipelines.analytics import (
        _pr_type_node,
        pagerank_user_types,
    )

    got = pagerank_user_types(SF_DIR, iters=15).to_pandas()
    con.execute(
        f"CREATE VIEW IF NOT EXISTS events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    edges = con.execute(
        "SELECT DISTINCT user_id, event_type FROM events"
    ).fetchall()
    pairs = {(int(u), _pr_type_node(t)) for u, t in edges}
    nodes = sorted({x for p in pairs for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[b], idx[a]] = 1.0
        A[idx[a], idx[b]] = 1.0
    deg = A.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(15):
        r = (1 - 0.85) / n + 0.85 * (A @ (r / deg))
    assert len(got) == n
    # ranks form a probability distribution and match per node
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-6)
    for _, row in got.iterrows():
        name = row["node"]
        node = (
            _pr_type_node(name[2:]) if name.startswith("t:") else int(name[2:])
        )
        assert row["rank"] == pytest.approx(r[idx[node]], abs=1e-9), name
    # type hubs out-rank individual users in a bipartite graph this shape
    tmin = got[got["node"].str.startswith("t:")]["rank"].min()
    umax = got[got["node"].str.startswith("u:")]["rank"].max()
    assert tmin > umax
