"""Sink surface: partitioned parquet writes and bucketed tables.

The reference is a read-only connector (README.md:49 — OLAP read
patterns), so sinks are pure Spark capability; these tests pin the two
write shapes that matter at 100 TB: partition pruning on read-back and
shuffle-free joins between co-bucketed tables.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.plans.catalog import table

from .conftest import SF_DIR


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    o = table(spark, SF_DIR, "orders")
    o.write.partitionBy("o_orderstatus").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == o.count()

    # A partition-key filter must prune to one directory, not scan all.
    q = back.filter(F.col("o_orderstatus") == "F")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    want = o.filter(F.col("o_orderstatus") == "F").count()
    assert q.count() == want


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key join with zero Exchange
    nodes — the co-located-join strategy for repeated 100 TB joins."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = table(spark, SF_DIR, "customer").select("c_custkey", "c_nationkey")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

    joined = spark.table("b_orders").join(
        spark.table("b_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    # Disable broadcast so the bucketed SMJ path is what gets planned.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert joined.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
