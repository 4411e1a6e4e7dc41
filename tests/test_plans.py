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
    # raw_fn, not the memoized fn: once ANY earlier test has executed
    # the memoized DataFrame, AQE finalizes its plan and
    # explain("formatted") renders the adaptive final plan (different
    # exchange-line counts) — the reverse-file-order r16 sweep caught
    # test_window_plans_single_shuffle flipping on exactly this. A
    # fresh unexecuted frame always shows the submitted plan.
    e = ENTRIES[name]
    df = (e.raw_fn or e.fn)(spark, SF_DIR)
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
    # need. r21 (raw-scan loads): l_orderkey is no longer forced into
    # the scan by a load-time repartition either.
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for col in ("l_partkey", "l_comment", "l_orderkey"):
        assert col not in read


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
        "pipeline_incremental_dedup",
        "pipeline_incremental_minhash",
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
    partition key (r21 raw-scan loads: no load-time layout exchange
    precedes it)."""
    plan = plan_of(spark, "window_running_sum")
    window_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Arguments: hashpartitioning(o_custkey" in ln
    ]
    assert len(window_shuffles) == 1, plan


def test_q19_disjunction_splits_to_both_scans(spark):
    """The OR'd brand/size/quantity bands must split into single-side
    conjuncts pushed into EACH parquet scan (the classic TPC-H Q19
    optimization) — a plan that evaluates the whole disjunction only
    after the join re-reads both tables in full at 100 TB."""
    plan = plan_of(spark, "q19_discounted_revenue")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = " ".join(pushed)
    assert "l_quantity" in joined, joined  # lineitem-side residual pushed
    assert "p_brand" in joined or "p_size" in joined, joined  # part side


def test_q2_correlated_min_is_single_window_no_python(spark):
    """The correlated-MIN subquery must plan as ONE window over the
    partkey (no second aggregation-join re-scan of the part-supplier
    relation) and stay JVM-side."""
    plan = plan_of(spark, "q2_min_cost_supplier")
    window_nodes = [
        ln
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ln.strip().endswith(" Window")
    ]
    assert len(window_nodes) == 1, window_nodes
    assert "BatchEvalPython" not in plan


def test_q21_exists_shapes_are_semi_and_anti_joins(spark):
    """EXISTS → left semi, NOT EXISTS → left anti, both as hash joins
    on the order key (co-partitioned fact sides) — never a nested-loop
    or cartesian re-scan."""
    plan = plan_of(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q18_single_lineitem_scan(spark):
    """The HAVING-subquery aggregate IS the output aggregate: lineitem
    must be scanned once, not re-joined for a second aggregation."""
    plan = plan_of(spark, "q18_large_orders")
    assert plan.count("lineitem.parquet") == 1, plan


def test_multimodal_frame_sample_no_fanout_shuffle(spark):
    """The frame fan-out happens inside the Arrow batch: the ONLY
    Exchange is the load-time keyed fan_out of the documents table
    (a no-op at real scale) — the per-frame explosion itself never
    shuffles and nothing follows the Python stage."""
    plan = plan_of(spark, "multimodal_frame_sample")
    assert "MapInPandas" in plan
    exchange_nodes = [
        ln
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ln.strip().endswith(" Exchange")
    ]
    assert len(exchange_nodes) <= 1, exchange_nodes


def test_q7_q8_fact_never_shuffles_by_custkey(spark):
    """The filtered customer slice broadcasts into the fact pipeline —
    a regression here re-shuffles every surviving fact row by custkey
    (the widest possible exchange in both queries)."""
    for name in ("q7_volume_shipping", "q8_market_share"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        for ln in plan.splitlines():
            # Only planner-inserted join/agg shuffles count; the
            # load-time keyed fan_out (REPARTITION_BY_NUM) is input
            # layout, not query cost.
            if "hashpartitioning" in ln and "ENSURE_REQUIREMENTS" in ln:
                assert "o_custkey" not in ln and "c_custkey" not in ln, (
                    name,
                    ln,
                )


def test_q9_all_dims_broadcast(spark):
    """part/supplier/nation all broadcast; only the co-partitioned
    order-key join and the final aggregation move fact rows."""
    plan = plan_of(spark, "q9_product_type_profit")
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_fact_rows_cross_at_most_one_exchange(spark):
    """r21 layout contract (raw scans — catalog._TABLE_KEYS no longer
    force-repartitions the relational tables): q3/q18 collapse lineitem
    to one row per order with a MAP-SIDE partial aggregation on the
    scan tasks, so full-width fact rows cross AT MOST ONE hash
    exchange — the aggregation's own l_orderkey shuffle, which the
    order-key join can then reuse. Join strategy is the planner's
    size-estimate call (broadcast at test scale, sort-merge at volume
    — parquet file size is the estimate's ground truth); never a
    cartesian fallback."""
    for name in ("q3_shipping_priority", "q18_large_orders"):
        plan = plan_of(spark, name)
        ensure = [ln for ln in plan.splitlines() if "ENSURE_REQUIREMENTS" in ln]
        li = [ln for ln in ensure if "l_orderkey" in ln]
        assert len(li) <= 1, (name, ensure)
        assert "CartesianProduct" not in plan


def test_cluster_survivors_anti_join_is_hint_free(spark):
    """The dedup anti join must stay a LeftAnti hash/merge join whose
    strategy is the PLANNER's size-based call, not a hard-coded
    broadcast: the loser set scales with the corpus's duplicate
    fraction, so a forced broadcast would driver-OOM at 100 TB while a
    forced shuffle over-pays at test scale. Pin (a) the anti-join shape,
    (b) no nested-loop/cartesian fallback, and (c) no ResolvedHint in
    the optimized plan (nobody re-adds a hard hint upstream)."""
    import inspect

    from duckdb_redis_olap_scanner_spark.plans import pipeline_ops2

    df = ENTRIES["dedup_cluster_survivors"].fn(spark, SF_DIR)
    plan = plan_of(spark, "dedup_cluster_survivors")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized
    src = inspect.getsource(pipeline_ops2.dedup_cluster_survivors)
    assert "broadcast(" not in src


def test_session_codegen_cache_fits_catalog(spark):
    """The generated-class cache must hold the whole catalog: at the
    default 100 entries, cycling through the 19-query bench suite
    (~5 codegen stages each) evicts and recompiles ~1 s of Java per
    revisited stage — measured as a 1.3 s/pass inflation of the sf0.1
    suite. get_spark pins it above the catalog's stage count."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 500


def test_gather_sort_is_total_order_single_partition(spark):
    """gather_sort must produce the same total order as orderBy while
    planning NO range exchange (no sampling job) — one partition,
    locally sorted."""
    from pyspark.sql import functions as F

    from duckdb_redis_olap_scanner_spark.plans.catalog import gather_sort

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    g = gather_sort(df, F.desc("k"), F.asc("v"))
    assert g.rdd.getNumPartitions() == 1
    expected = df.orderBy(F.desc("k"), F.asc("v")).collect()
    assert g.collect() == expected
    plan_g = g._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan_g.lower()


def test_round7_curation_plans_are_clean(spark):
    """The seven round-7 entries: no Python row UDFs anywhere, scans
    pruned to referenced columns, and the intended operator shapes
    (single agg for the histogram, Arrow map for the projection,
    join-free narrow map for the classifier)."""
    # Histogram: one aggregation, no join, pruned events scan. The
    # r10 user_id-keyed events layout adds its key column to the scan
    # (the one-time repartition into the cached layout needs it —
    # same trade as the relational keyed loads); every OTHER unused
    # column must still prune out.
    plan = plan_of(spark, "events_value_histogram")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "event_type" in read and "value" in read
    for col in ("props", "ts", "event_id"):
        assert col not in read
    assert "Join" not in plan and "BatchEvalPython" not in plan

    # Classifier: narrow map — no join, no Python, text+doc_id scan only.
    plan = plan_of(spark, "pipeline_quality_classifier")
    assert "Join" not in plan and "BatchEvalPython" not in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "lang" not in read and "source" not in read

    # Random projection: the Arrow matmul map, no Python ROW udf, no
    # label column read.
    plan = plan_of(spark, "embedding_random_projection")
    assert "MapInArrow" in plan
    assert "BatchEvalPython" not in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "label" not in read

    # Segment dedup / bigram LM: shuffle-based, but zero Python and no
    # cartesian products.
    for name in ("pipeline_segment_dedup", "pipeline_bigram_lm"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan

    # Curriculum shards: the join back to per-doc rows must be a
    # broadcast (the distinct-margin table is bounded), never a
    # sort-merge shuffle of the corpus.
    plan = plan_of(spark, "pipeline_curriculum_shards")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_round7_window_plans_are_clean(spark):
    """The window-based round-7 entries: no joins where none belong,
    no Python, pruned scans."""
    # Token budget: one window over the natural source key, no join.
    plan = plan_of(spark, "pipeline_token_budget")
    assert "Join" not in plan and "BatchEvalPython" not in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "lang" not in read and "n_chars" not in read

    # SCD2 intervals: one window + one agg on user_id — join-free,
    # and the scan must not read props/value.
    plan = plan_of(spark, "events_scd2_intervals")
    assert "Join" not in plan and "BatchEvalPython" not in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "props" not in read and "value" not in read

    # Equi-depth histogram: the only window runs over the DISTINCT
    # cents aggregate; no cartesian product, no sort-merge join.
    plan = plan_of(spark, "events_equidepth_histogram")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan

    # Heavy hitters: rank window partitioned on source after the agg;
    # join-free.
    plan = plan_of(spark, "text_top_terms_per_source")
    assert "Join" not in plan and "BatchEvalPython" not in plan


def test_agg_width_volume_proportional(tmp_path):
    """catalog.agg_width: ~1.5 MiB of parquet per task, floor 1, and
    None once the volume saturates cpus or stats are missing — the
    caller must then keep its default fan-out (a no-op on wide scans)
    instead of coalescing a >cpus-partition cluster-scale scan into
    one giant task per core (ADVICE r13)."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        _AGG_BYTES_PER_TASK,
        agg_width,
    )

    p = tmp_path / "documents.parquet"
    p.write_bytes(b"x" * 100)  # tiny -> 1 task
    assert agg_width(str(tmp_path), "documents", 32) == 1
    p.write_bytes(b"x" * (6 * _AGG_BYTES_PER_TASK))
    assert agg_width(str(tmp_path), "documents", 32) == 6
    p.write_bytes(b"x" * (100 * _AGG_BYTES_PER_TASK))
    assert agg_width(str(tmp_path), "documents", 32) is None  # saturated
    assert agg_width(str(tmp_path), "documents", 128) == 100  # under cpus
    assert agg_width(str(tmp_path), "missing", 32) is None  # no stats


def test_dedup_exact_entry_narrows_to_volume_width(spark):
    """The dedup_exact entry's aggregation runs at agg_width tasks,
    not the session-wide cached layout (the r11 over-floor fix): the
    coalesce is visible in the plan and results are unchanged."""
    from duckdb_redis_olap_scanner_spark.operators.dedup import exact_dedup
    from duckdb_redis_olap_scanner_spark.plans.catalog import registry, table

    from .conftest import SF_DIR

    entry = registry()["dedup_exact"]
    df = entry.fn(spark, SF_DIR)
    assert "Coalesce" in df._jdf.queryExecution().executedPlan().toString()
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, exact_dedup(table(spark, SF_DIR, "documents")).collect()))
    assert got == want and got


def test_coverage_counts_script_matches_registry():
    """scripts/coverage_counts.py is the COVERAGE.md source of truth
    (the r11 hand-count drift fix): it must run, emit valid JSON, and
    agree with the live registry."""
    import json
    import os
    import subprocess
    import sys

    from duckdb_redis_olap_scanner_spark.plans.catalog import registry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "coverage_counts.py")],
        capture_output=True, text=True, timeout=120, check=True,
    )
    d = json.loads(out.stdout)
    reg = registry()
    assert d["entries_total"] == len(reg)
    assert d["entries_oracle_checked"] == sum(
        1 for e in reg.values() if e.oracle is not None
    )
    assert d["entries_total"] == (
        d["entries_oracle_checked"] + d["entries_rows_only"]
    )
    assert sum(d["gate_window_by_round"].values()) == min(50, len(reg))


def test_keyed_agg_width_volume_proportional(tmp_path):
    """catalog.keyed_agg_width: the narrow-shuffle sibling of agg_width
    (~4 MiB of proxy parquet per reducer — sum-aggs over fixed-width
    rows are reducer-dispatch-bound far longer than expression-heavy
    scan aggs), floor 1, None at saturation or missing stats."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        _KEYED_AGG_BYTES_PER_TASK,
        keyed_agg_width,
    )

    import os

    p = tmp_path / "orders.parquet"
    p.write_bytes(b"x" * 100)  # tiny -> 1 reducer
    assert keyed_agg_width(str(tmp_path), "orders", 32) == 1
    # only getsize matters — sparse-truncate instead of writing 400 MB
    os.truncate(p, 5 * _KEYED_AGG_BYTES_PER_TASK)
    assert keyed_agg_width(str(tmp_path), "orders", 32) == 5
    os.truncate(p, 100 * _KEYED_AGG_BYTES_PER_TASK)
    assert keyed_agg_width(str(tmp_path), "orders", 32) is None  # saturated
    assert keyed_agg_width(str(tmp_path), "orders", 128) == 100
    assert keyed_agg_width(str(tmp_path), "missing", 32) is None


def test_q10_volume_branch_matches_floor_branch(spark, monkeypatch):
    """q10's two physical shapes (single-wide-stage at dispatch-floor
    volume vs narrow agg-before-names at width w / full width) must
    return identical top-20 rows.  sf0.01 naturally takes the
    width==1 floor branch; force the other two via keyed_agg_width."""
    from duckdb_redis_olap_scanner_spark.plans import catalog as C

    entry = ENTRIES["q10_returned_items"]
    ref = [tuple(r) for r in entry.fn(spark, SF_DIR).collect()]
    assert ref  # non-empty at sf0.01

    for forced in (2, None):
        monkeypatch.setattr(
            C, "keyed_agg_width", lambda sf, name, cpus: forced
        )
        # raw_fn, NOT entry.fn: the registered callable memoizes the
        # built DataFrame per (session, sf_dir), so it would re-serve
        # the floor-branch plan and make every assertion below vacuous
        got_df = entry.raw_fn(spark, SF_DIR)
        got = [tuple(r) for r in got_df.collect()]
        assert got == ref, f"width={forced} diverged"
        # the volume branch keeps name strings out of the re-keying
        # exchange: the revenue agg groups on o_custkey ALONE (names
        # attach after it), and at a forced width the exchange runs
        # at exactly that many partitions
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "keys=[o_custkey" in plan, "agg must precede the names"
        # the floor branch's signature — an aggregation keyed on the
        # name columns — must be absent: names attach AFTER the agg
        assert "keys=[c_custkey" not in plan, (
            "volume branch must not aggregate on name columns"
        )
        if forced == 2:
            assert "hashpartitioning(o_custkey#" in plan
            assert ", 2), REPARTITION_BY_NUM" in plan, (
                "the re-keying exchange must run at the forced width"
            )


def test_merge_join_above_is_size_gated(tmp_path):
    """catalog.merge_join_above: no hint below the threshold (the
    planner's broadcast stays the test-scale winner), SORT_MERGE hint
    at/above it (the mid-band where the planner's pruned-size estimate
    still broadcasts a ~1.5 M-row build side whose driver-serial
    collect+build measured 1.3-1.6 s vs 0.8-1.0 s merge at the 10×
    sf1-equivalent), and a missing stats file leaves the frame
    untouched (planner's call)."""
    import os

    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        MERGE_OVER_BCAST_BYTES,
        merge_join_above,
    )

    class FakeDF:
        def __init__(self):
            self.hints = []

        def hint(self, h):
            self.hints.append(h)
            return self

    p = tmp_path / "orders.parquet"
    p.write_bytes(b"x" * 100)
    df = FakeDF()
    assert merge_join_above(df, str(tmp_path), "orders") is df
    assert df.hints == []  # below threshold: planner broadcast
    os.truncate(p, MERGE_OVER_BCAST_BYTES)
    assert merge_join_above(df, str(tmp_path), "orders") is df
    assert df.hints == ["merge"]  # at threshold: merge
    df2 = FakeDF()
    assert merge_join_above(df2, str(tmp_path), "missing") is df2
    assert df2.hints == []  # no stats: untouched


def test_preaggregated_order_joins_merge_above_gate(spark, monkeypatch):
    """q3/q10/q18 orders-side join strategy (r21): at the fixture SF
    the merge_join_above gate is off and the pruned orders projection
    broadcasts; with the gate forced on, the same entries plan a
    SortMergeJoin on the order key and return identical rows — the
    strategy flip is results-invisible by construction."""
    import duckdb_redis_olap_scanner_spark.plans.relational as rel

    for name in (
        "q3_shipping_priority",
        "q10_returned_items",
        "q18_large_orders",
    ):
        entry = ENTRIES[name]
        ref_df = entry.raw_fn(spark, SF_DIR)
        ref_plan = ref_df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in ref_plan, (
            name,
            "gate must stay off at test scale",
        )
        ref = [tuple(r) for r in ref_df.collect()]
        assert ref

        monkeypatch.setattr(
            rel, "merge_join_above", lambda df, *a, **k: df.hint("merge")
        )
        got_df = entry.raw_fn(spark, SF_DIR)
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, (name, "forced gate must merge")
        assert [tuple(r) for r in got_df.collect()] == ref, name
        monkeypatch.undo()
