"""Schema-drift canary for the events table's ts column.

The sandbox's ``events.parquet`` has shipped ``ts`` as BOTH parquet
TIMESTAMP(NANOS) (surfaced as raw bigint nanos under
``spark.sql.legacy.parquet.nanosAsLong``) and native TIMESTAMP(MICROS)
across generations.  Round 4 broke every events consumer because
``table()`` assumed nanos unconditionally.  This test writes a tiny
events file in each physical encoding and asserts ``table()`` yields
``ts: timestamp`` with identical values for both — so an environment
flip is caught by CI, not by the driver.
"""
from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_redis_olap_scanner_spark.plans.catalog import table

_TS_US = [1_700_000_000_000_000, 1_700_000_123_456_789]  # microseconds


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    sf_dir = tmpdir
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"a":1}', '{"b":2}']),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("encoding", ["nanos", "micros"])
def test_events_ts_schema_adaptive(spark, tmp_path, encoding):
    if encoding == "nanos":
        ts = pa.array([v * 1000 for v in _TS_US], pa.timestamp("ns"))
    else:
        ts = pa.array(_TS_US, pa.timestamp("us"))
    sf_dir = _write_events(str(tmp_path), ts)

    df = table(spark, sf_dir, "events")
    dtype = dict(df.dtypes)["ts"]
    # Must be TIMESTAMP exactly — TIMESTAMP_NTZ (what Spark 4 infers for
    # isAdjustedToUTC=false parquet) breaks unix_micros/watermark
    # consumers, so the loader has to normalize it away.
    assert dtype == "timestamp", dtype

    got = sorted(
        r["ts"] for r in df.select("ts").collect()
    )
    want = sorted(
        datetime.datetime.fromtimestamp(v / 1e6, tz=datetime.timezone.utc).replace(
            tzinfo=None
        )
        for v in _TS_US
    )
    # Compare as epoch-µs to dodge tz-naive/aware representation drift.
    def us(dt: datetime.datetime) -> int:
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=datetime.timezone.utc)
        return int(dt.timestamp() * 1_000_000)

    assert [us(g) for g in got] == [us(w) for w in want]


def test_ntz_cast_requires_utc_session(spark, tmp_path):
    """The NTZ→TIMESTAMP normalization reinterprets wall-clock values in
    the session timezone — only value-preserving under UTC.  A non-UTC
    session must fail loudly instead of silently shifting every event
    timestamp (ADVICE r5)."""
    ts = pa.array(_TS_US, pa.timestamp("us"))  # infers TIMESTAMP_NTZ
    sf_dir = _write_events(str(tmp_path), ts)
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="UTC"):
            table(spark, sf_dir, "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def test_gapfill_span_guard_trips_on_corrupt_epoch(spark, tmp_path):
    """One corrupt timestamp (epoch zero) would silently blow the
    hourly gap-fill spine up to span+1 rows per user; the plan-time
    span guard must raise loudly instead."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import registry
    from duckdb_redis_olap_scanner_spark.plans.pipeline_ops3 import (
        GAPFILL_MAX_SPAN_HOURS,
        events_gapfill_locf,
    )

    base = 1_700_000_000_000_000
    ts = pa.array([0, base, base + 3_600_000_000], pa.timestamp("us"))
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts,
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    with pytest.raises(ValueError, match="max_span_hours"):
        events_gapfill_locf(spark, str(tmp_path))
    # healthy spans (and the real test tables) stay under the cap and
    # plan fine — the guard is an invariant, not a behavior change
    assert GAPFILL_MAX_SPAN_HOURS >= 24 * 366
    df = registry()["events_gapfill_locf"].fn(
        spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    )
    assert df.columns == ["user_id", "hour", "value_cents", "is_gap"]
    with pytest.raises(ValueError, match="positive"):
        events_gapfill_locf(spark, str(tmp_path), max_span_hours=0)


def _compare_events(spark, sf_dir: str, entry: str) -> None:
    import duckdb

    from duckdb_redis_olap_scanner_spark.plans.catalog import registry

    ents = registry()
    sdf = ents[entry].fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'events')}.parquet'"
    )
    odf = con.execute(ents[entry].oracle).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), entry
    from .test_oracle_parity import _canon_rows

    assert _canon_rows(sdf) == _canon_rows(odf), entry


def test_events_negative_values_and_singletons(spark, tmp_path):
    """Value-domain drift: negative and huge values must take the
    histogram CLAMP paths (bucket 0 below, top bucket above) on BOTH
    engines, and single-event users exercise the SCD2 open-interval
    branch — none of which the all-positive generated corpus
    reaches."""
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + i * 60_000_000 for i in range(5)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([10, 10, 20, 30, 30], pa.int64()),
            "event_type": pa.array(
                ["click", "click", "view", "click", "view"]
            ),
            "value": pa.array(
                [-12.5, 0.01, 999999.99, 4.0, -0.01], pa.float64()
            ),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    for entry in (
        "events_value_histogram",
        "events_equidepth_histogram",
        "events_scd2_intervals",
    ):
        _compare_events(spark, str(tmp_path), entry)


def test_events_empty_table(spark, tmp_path):
    tbl = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    for entry in (
        "events_value_histogram",
        "events_equidepth_histogram",
        "events_scd2_intervals",
    ):
        _compare_events(spark, str(tmp_path), entry)
