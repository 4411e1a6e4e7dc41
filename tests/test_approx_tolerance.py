"""Quantified-error checks for the approximate-aggregate entries.

Sketches are engine-specific, so these entries are rows-only for the
cross-engine gate — but their ESTIMATES still have documented error
bounds, checked here against exact DuckDB values on the same parquet:

* ``approx_count_distinct`` — HyperLogLog++ with default rsd=0.05;
  assert within 5× the documented relative standard deviation (a hard
  failure means a broken sketch, not an unlucky draw — both engines
  and the data are deterministic, so this is a stable regression
  check, not a flaky statistical one).
* ``percentile_approx`` — the Greenwald-Khanna sketch with default
  accuracy=10000 bounds RANK error by n/10000; assert the estimate
  lies between the exact values at ranks p±(n/10000 + 1).
"""

from __future__ import annotations

import duckdb

from duckdb_redis_olap_scanner_spark.plans.catalog import registry

from .conftest import SF_DIR_ORACLE

_HLL_RSD = 0.05
_GK_ACCURACY = 10000


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"'{SF_DIR_ORACLE}/lineitem.parquet'"
    )
    return con


def test_approx_count_distinct_within_hll_bound(spark):
    row = (
        registry()["agg_approx_distinct"].fn(spark, SF_DIR_ORACLE).collect()[0]
    )
    con = _duck()
    exact_parts, exact_orders = con.execute(
        "SELECT COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_orderkey)"
        " FROM lineitem"
    ).fetchone()
    for got, exact in (
        (row.approx_parts, exact_parts),
        (row.approx_orders, exact_orders),
    ):
        assert abs(got - exact) <= 5 * _HLL_RSD * exact, (got, exact)


def test_approx_percentile_within_gk_rank_bound(spark):
    rows = registry()["agg_approx_percentile"].fn(spark, SF_DIR_ORACLE).collect()
    con = _duck()
    for r in rows:
        flag = r.l_returnflag
        (n,) = con.execute(
            "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = ?", [flag]
        ).fetchone()
        slack = n // _GK_ACCURACY + 1
        for pct, got in ((0.5, r.p50_price), (0.95, r.p95_price)):
            target = int(pct * n)
            lo_rank = max(1, target - slack)
            hi_rank = min(n, target + slack)
            lo, hi = con.execute(
                """
                WITH ranked AS (
                    SELECT l_extendedprice p,
                           ROW_NUMBER() OVER (ORDER BY l_extendedprice) rk
                    FROM lineitem WHERE l_returnflag = ?
                )
                SELECT MIN(p) FILTER (rk = ?), MIN(p) FILTER (rk = ?)
                FROM ranked
                """,
                [flag, lo_rank, hi_rank],
            ).fetchone()
            assert lo <= got <= hi, (flag, pct, got, lo, hi)


def test_hll_sketch_union_within_bound(spark):
    """Per-flag and merged HLL-sketch estimates within 5x the default
    lgConfigK=12 relative error (~1.6%) of exact distinct counts —
    and the merged estimate must act like a union, not a sum."""
    rows = {
        r.l_returnflag: r.est_distinct_orders
        for r in registry()["agg_hll_sketch_union"]
        .fn(spark, SF_DIR_ORACLE)
        .collect()
    }
    con = _duck()
    exact = dict(
        con.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_orderkey)"
            " FROM lineitem GROUP BY l_returnflag"
        ).fetchall()
    )
    (exact_all,) = con.execute(
        "SELECT COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()
    exact["ALL"] = exact_all
    rel = 5 * 0.016
    for flag, est in rows.items():
        assert abs(est - exact[flag]) <= rel * exact[flag], (flag, est)
    # Union semantics: orders appear under several flags, so the merged
    # estimate must be far below the sum of the per-flag estimates.
    per_sum = sum(v for k, v in rows.items() if k != "ALL")
    assert rows["ALL"] < 0.7 * per_sum
