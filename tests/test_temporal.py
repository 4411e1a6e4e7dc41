"""Semantic unit tests for the temporal join operators (the catalog
entries are additionally oracle-checked in test_oracle_parity)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.operators.temporal import (
    asof_join,
    banded_range_join,
)


def _ts(minute: int, micro: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute, 0, micro)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(30))], "id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(101, "u", _ts(5)), (102, "u", _ts(20)), (103, "u", _ts(40))],
        "rid long, user_id string, ts timestamp",
    )
    got = {
        r.id: r.matched.rid if r.matched else None
        for r in asof_join(left, right).collect()
    }
    assert got == {1: 101, 2: 102}


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(9, "u", _ts(10))], "rid long, user_id string, ts timestamp"
    )
    [row] = asof_join(left, right).collect()
    assert row.matched.rid == 9


def test_asof_no_prior_match_is_null_and_groups_isolated(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "v", _ts(10))],
        "id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(9, "u", _ts(20)), (8, "w", _ts(1))],
        "rid long, user_id string, ts timestamp",
    )
    rows = {r.id: r.matched for r in asof_join(left, right).collect()}
    assert rows == {1: None, 2: None}  # 9 is later; 8 is another group


def test_range_join_band_edges_and_bucket_crossing(spark):
    # 1h band in micros; pairs: (1→2) inside same bucket, (1→3) exactly
    # at +1h (inclusive), (3→4) crossing a bucket boundary, 5 isolated.
    h = 3_600_000_000
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(us):
        return base + datetime.timedelta(microseconds=us)

    ev = spark.createDataFrame(
        [
            (1, "u", at(0)),
            (2, "u", at(1000)),
            (3, "u", at(h)),          # exactly +1h from id 1 → inclusive
            (4, "u", at(h + 100)),    # 100us after 3, adjacent bucket of 1
            (5, "u", at(10 * h)),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    res = banded_range_join(ev, ev, on="ts", by="user_id", band_micros=h)
    pairs = {
        (r.a.event_id, r.b.event_id)
        for r in res.filter(F.col("a.event_id") < F.col("b.event_id")).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}
    # (1,4) is h+100 apart → outside the band; 5 pairs with nobody.
