"""Physical-plan quality gates: the properties that decide whether a
query that passes at sf0.01 still works at 100 TB.

Each test asserts on the formatted explain output:

* filter pushdown  — predicates reach the parquet scan (PushedFilters),
* column pruning   — ReadSchema carries only referenced columns,
* broadcast joins  — schema-bounded dims never shuffle the fact side,
* top-k            — ORDER BY+LIMIT plans as TakeOrderedAndProject
                     (no global sort),
* codegen          — hot relational paths run inside WholeStageCodegen
                     with no Python row UDFs (BatchEvalPython).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from duckdb_redis_olap_scanner_spark.plans.catalog import registry

from .conftest import SF_DIR

ENTRIES = registry()


def plan_of(spark, name: str) -> str:
    df = ENTRIES[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert "PushedFilters:" in plan
    # All four predicates' columns are pushdown-eligible.
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    # Column pruning: the scan must not read wide columns it doesn't
    # need. (l_orderkey IS read: it's the load-time hash-partitioning
    # key from catalog._TABLE_KEYS, referenced by the repartition node.)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_partkey" not in read and "l_comment" not in read


def test_q1_pruned_scan(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    # Referenced columns (+ the load-time partition key) only — not
    # the full 16-column lineitem schema.
    for col in ("l_returnflag", "l_linestatus", "l_quantity"):
        assert col in read
    for col in ("l_partkey", "l_suppkey", "l_comment"):
        assert col not in read


def test_q5_broadcasts_dims(spark):
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    # The bounded dims arrive via BroadcastExchange, and at least the
    # region/nation/supplier side never produces a fact-sized shuffle.
    assert plan.count("BroadcastExchange") >= 3


def test_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan  # would imply sort-then-limit


def test_hot_paths_have_no_python_row_udfs(spark):
    """Relational + dedup + similarity entries must stay JVM-side:
    no row-at-a-time Python eval in any plan (Arrow mapInPandas for the
    multimodal stub and the redis UDF surface are the sanctioned
    exceptions and live in other entries)."""
    for name in (
        "q1_pricing_summary",
        "q3_shipping_priority",
        "dedup_minhash_lsh",
        "ann_cosine_topk",
        "text_token_stats",
        "text_fingerprints",
    ):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM path"


def test_q1_codegen_and_partial_agg(spark):
    """After execution (AQE finalizes stages lazily), the q1 plan must
    show whole-stage codegen spans ('*(n)') and a map-side partial
    aggregation before the shuffle — the two properties that keep a
    100 TB aggregation scan-bound instead of shuffle-bound."""
    df = ENTRIES["q1_pricing_summary"].fn(spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in final
    assert "partial_sum" in final or "partial_count" in final


def test_window_plans_single_shuffle(spark):
    """A partitioned window function shuffles exactly once on its
    partition key. (The plan also carries the load-time fan-out
    exchange on o_orderkey from catalog._TABLE_KEYS — that one is
    input layout, not window cost.)"""
    plan = plan_of(spark, "window_running_sum")
    window_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Arguments: hashpartitioning(o_custkey" in ln
    ]
    assert len(window_shuffles) == 1, plan
