"""Focused tests for the r21 histogram-based exact percentile finisher
(``plans.relational.exact_group_percentiles``), which replaced Spark's
``Percentile`` aggregate in ``agg_percentile_standard`` /
``agg_approx_percentile`` (3.5 s → 1.3 s at sf0.1, results
bit-identical).

The finisher's exactness claims are checked here against DuckDB on
CRAFTED data that hits the edge cases the bench tables may miss:

* PERCENTILE_DISC boundary (``p*n`` exactly integral, where a
  floating-point rank would round the wrong way),
* PERCENTILE_CONT integral position (no interpolation) and the
  two-product interpolation form,
* duplicate values (histogram counts > 1) straddling rank boundaries,
* several groups hashed into one task, and a single-row group.
"""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.plans.relational import (
    exact_group_percentiles,
)

SPECS = [
    ("p25", "disc", 1, 4),
    ("p50c", "cont", 1, 2),
    ("p90", "disc", 9, 10),
    ("p95c", "cont", 19, 20),
]


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return {
        r[0]: r[1:]
        for r in con.execute(
            """
            SELECT g,
                   CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY v) AS BIGINT),
                   CAST(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY v) AS DOUBLE),
                   CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY v) AS BIGINT),
                   CAST(PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY v) AS DOUBLE)
            FROM t GROUP BY g
            """
        ).fetchall()
    }


def _spark_rows(spark, rows):
    df = spark.createDataFrame(rows, "g string, v long")
    got = exact_group_percentiles(df, "g", F.col("v"), SPECS).collect()
    return {r["g"]: (r["p25"], r["p50c"], r["p90"], r["p95c"]) for r in got}


def _bits(x):
    return struct.pack("<d", x).hex() if isinstance(x, float) else x


@pytest.mark.parametrize(
    "case, rows",
    [
        # n divisible by 4, 10 and 20: every disc rank p*n integral —
        # the exact-integer boundary where smallest-CDF>=p must include
        # the boundary element, and cont positions integral (no
        # interpolation path).
        ("boundary_n20", [("a", i) for i in range(1, 21)]),
        # n = 4: floor((n-1)p) indexing would differ from the standard
        # rule at p=0.9 (3 vs 4) — pins the DISC definition itself.
        ("tiny_n4", [("a", i) for i in range(1, 5)]),
        # single-value group and single-row group
        ("degenerate", [("a", 7)] * 5 + [("b", 3)]),
        # duplicates straddling rank boundaries: value 5 owns ranks
        # 2..11 of 12 — p25/p50/p90 all land inside one histogram row
        ("heavy_ties", [("a", 1)] + [("a", 5)] * 10 + [("a", 9)]),
        # several groups (hashed into few tasks) + interpolation at
        # non-dyadic p over irregular gaps
        (
            "multi_group",
            [("g%d" % (i % 5), (i * 37) % 101 + 1000 * (i % 5)) for i in range(200)],
        ),
    ],
)
def test_finisher_matches_duckdb_bitwise(spark, case, rows):
    want = _duck(rows)
    got = _spark_rows(spark, rows)
    assert set(got) == set(want)
    for g in want:
        assert tuple(map(_bits, got[g])) == tuple(map(_bits, want[g])), (
            case,
            g,
            got[g],
            want[g],
        )


def test_finisher_matches_duckdb_randomized(spark):
    """Differential fuzz: random group sizes (including sizes that make
    p*n integral), random duplicates, vs DuckDB bit-for-bit."""
    import random

    rng = random.Random(0xC0FFEE)
    rows = []
    for gi in range(8):
        n = rng.choice([1, 2, 3, 4, 19, 20, 40, 100, 101, 400])
        vals = [rng.randrange(0, 50) * rng.choice([1, 100]) for _ in range(n)]
        rows += [("g%d" % gi, v) for v in vals]
    want = _duck(rows)
    got = _spark_rows(spark, rows)
    assert set(got) == set(want)
    for g in want:
        assert tuple(map(_bits, got[g])) == tuple(map(_bits, want[g])), (
            g,
            got[g],
            want[g],
        )


def test_null_values_dropped(spark):
    """NULL measure values are ignored, as in both engines' percentile
    semantics (n counts non-null rows only)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("a", None)], "g string, v long"
    )
    got = exact_group_percentiles(
        df, "g", F.col("v"), [("p50c", "cont", 1, 2)]
    ).collect()
    assert len(got) == 1
    assert got[0]["p50c"] == 2.0  # median of {1, 3}, nulls dropped


def test_interpolation_is_two_product_form(spark):
    """Pins the CONT interpolation to the engines' shared
    v_lo*(hi-pos) + v_hi*(pos-lo) form: at p=19/20 over crafted values
    the naive lo + (hi-lo)*frac form differs in the last ulp."""
    # n=200125 reproduced the sf0.1 divergence; shrink to a crafted
    # case: choose n, v_lo, v_hi where the two forms round differently.
    found = None
    for n in range(21, 2000):
        pos = 0.95 * (n - 1)
        lo, hi = math.floor(pos), math.ceil(pos)
        if lo == hi:
            continue
        for vlo, vhi in ((1046778, 1091292), (3, 1000003), (12345, 9876543)):
            a = vlo + (vhi - vlo) * (pos - lo)
            b = vlo * (hi - pos) + vhi * (pos - lo)
            if a != b:
                found = (n, vlo, vhi, b)
                break
        if found:
            break
    assert found, "no diverging case found (formula check vacuous)"
    n, vlo, vhi, want_b = found
    # Build a group of n rows whose ranks lo+1/hi+1 hold vlo/vhi.
    pos = 0.95 * (n - 1)
    lo = math.floor(pos)
    rows = (
        [("a", 0)] * lo + [("a", vlo), ("a", vhi)] + [("a", vhi + 7)] * (n - lo - 2)
    )
    assert len(rows) == n
    got = exact_group_percentiles(
        spark.createDataFrame(rows, "g string, v long"),
        "g",
        F.col("v"),
        [("p95c", "cont", 19, 20)],
    ).collect()[0]["p95c"]
    assert struct.pack("<d", got) == struct.pack("<d", want_b)
    # and DuckDB agrees with that form on the same rows
    duck = _duck(rows)["a"][3]
    assert struct.pack("<d", duck) == struct.pack("<d", want_b)


def test_raw_mode_identical_to_histogram_mode(spark):
    """r22: ``pre_aggregate=False`` ships raw (group, value, cnt=1)
    rows to the finisher — a degenerate histogram. Every emitted value
    must be bitwise identical to the aggregated path on data with
    heavy duplicates (where the two paths' finisher inputs differ
    most) and on the edge-case shapes above."""
    import random

    rng = random.Random(22)
    rows = [
        (g, rng.choice([1, 2, 2, 3, 5, 5, 5, 8, 1000003]))
        for g in ("a", "b", "c")
        for _ in range(rng.randint(1, 400))
    ] + [("solo", 42)]
    df = spark.createDataFrame(rows, "g string, v long")
    hist = exact_group_percentiles(
        df, "g", F.col("v"), SPECS, pre_aggregate=True
    ).collect()
    raw = exact_group_percentiles(
        df, "g", F.col("v"), SPECS, pre_aggregate=False
    ).collect()
    key = lambda r: r["g"]  # noqa: E731
    assert sorted(map(tuple, hist), key=lambda t: t[0]) == sorted(
        map(tuple, raw), key=lambda t: t[0]
    )
    for h in hist:  # CONT doubles compared bitwise, not approximately
        r = [x for x in raw if x["g"] == h["g"]][0]
        for name, kind, _, _ in SPECS:
            if kind == "cont":
                assert struct.pack("<d", h[name]) == struct.pack(
                    "<d", r[name]
                )


def test_histogram_pays_gate():
    """The raw path is gated on source bytes: small files skip the
    aggregation, large files (and missing stats — the safe cluster
    assumption) keep the value-space-bounded histogram."""
    import os

    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        HISTOGRAM_OVER_RAW_BYTES,
        histogram_pays,
    )

    assert not histogram_pays("/root/testdata/sf0.1", "lineitem")
    assert histogram_pays("/root/testdata/sf0.1", "no_such_table")
    assert os.path.getsize(
        "/root/testdata/sf0.1/lineitem.parquet"
    ) < HISTOGRAM_OVER_RAW_BYTES
