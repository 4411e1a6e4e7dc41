"""Quantified-error checks for the approximate-aggregate entries.

Since r5 the entries themselves are driver-verifiable: each outputs the
EXACT value (cross-engine hash-checkable) plus a boolean pinning the
sketch estimate within a documented tolerance, so a drifted sketch
fails the oracle hash gate. These tests (a) assert the booleans hold
and the exact columns match DuckDB, and (b) re-derive the RAW estimates
to check them against tighter, sketch-specific error bounds:

* ``approx_count_distinct`` — HyperLogLog++ with default rsd=0.05;
  assert within 5× the documented relative standard deviation (both
  engines and the data are deterministic, so this is a stable
  regression check, not a flaky statistical one).
* ``percentile_approx`` — the Greenwald-Khanna sketch with default
  accuracy=10000 bounds RANK error by n/10000; assert the estimate
  lies between the exact values at ranks p±(n/10000 + 1).
* ``hll_sketch_agg``/``hll_union_agg`` — lgConfigK=12 (~1.6% relative
  error); the merged estimate must act like a union, not a sum.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.plans.catalog import registry, table

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


def test_approx_entries_report_in_tolerance(spark):
    """Every *_ok boolean the three entries emit must be True, and the
    exact companion columns must equal DuckDB's exact values — the same
    contract the driver's hash gate now enforces."""
    con = _duck()
    row = (
        registry()["agg_approx_distinct"].fn(spark, SF_DIR_ORACLE).collect()[0]
    )
    exact_parts, exact_orders = con.execute(
        "SELECT COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_orderkey)"
        " FROM lineitem"
    ).fetchone()
    assert (row.exact_parts, row.exact_orders) == (exact_parts, exact_orders)
    assert row.parts_est_ok and row.orders_est_ok

    rows = (
        registry()["agg_approx_percentile"].fn(spark, SF_DIR_ORACLE).collect()
    )
    assert rows and all(r.p50_est_ok and r.p95_est_ok for r in rows)

    hll = (
        registry()["agg_hll_sketch_union"].fn(spark, SF_DIR_ORACLE).collect()
    )
    exact = dict(
        con.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_orderkey)"
            " FROM lineitem GROUP BY l_returnflag"
        ).fetchall()
    )
    (exact["ALL"],) = con.execute(
        "SELECT COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()
    assert {r.l_returnflag: r.exact_distinct_orders for r in hll} == exact
    assert all(r.est_ok for r in hll)


def test_approx_count_distinct_within_hll_bound(spark):
    got = (
        table(spark, SF_DIR_ORACLE, "lineitem")
        .agg(
            F.approx_count_distinct("l_partkey").alias("ap"),
            F.approx_count_distinct("l_orderkey").alias("ao"),
        )
        .collect()[0]
    )
    exact_parts, exact_orders = _duck().execute(
        "SELECT COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_orderkey)"
        " FROM lineitem"
    ).fetchone()
    for est, exact in ((got.ap, exact_parts), (got.ao, exact_orders)):
        assert abs(est - exact) <= 5 * _HLL_RSD * exact, (est, exact)


def test_approx_percentile_within_gk_rank_bound(spark):
    rows = (
        table(spark, SF_DIR_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5).alias("p50"),
            F.percentile_approx("l_extendedprice", 0.95).alias("p95"),
        )
        .collect()
    )
    con = _duck()
    for r in rows:
        flag = r.l_returnflag
        (n,) = con.execute(
            "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = ?", [flag]
        ).fetchone()
        slack = n // _GK_ACCURACY + 1
        for pct, got in ((0.5, r.p50), (0.95, r.p95)):
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
    """Raw per-flag and merged HLL estimates within 5× the lgK=12
    relative error of exact counts — and union, not sum."""
    l = table(spark, SF_DIR_ORACLE, "lineitem")
    per_flag = l.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    per = {
        r.l_returnflag: r.est
        for r in per_flag.select(
            "l_returnflag", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    (merged,) = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]
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
    rel = 5 * 0.016
    for flag, est in per.items():
        assert abs(est - exact[flag]) <= rel * exact[flag], (flag, est)
    assert abs(merged - exact_all) <= rel * exact_all
    # Union semantics: orders appear under several flags, so the merged
    # estimate must be far below the sum of the per-flag estimates.
    assert merged < 0.7 * sum(per.values())
