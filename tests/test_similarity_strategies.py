"""The two brute-force ANN physical strategies (pure-JVM expression
scoring vs vectorized Arrow corpus scan) must be result-identical —
the strategy switch is a cost-based choice, never a semantic one."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.operators import similarity as S

from .conftest import SF_DIR_ORACLE


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, repr(r.cos_sim), r.rank)
        for r in df.collect()
    )


def test_arrow_and_jvm_topk_identical(spark):
    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    jvm = S.brute_force_topk(emb, query_max_id=5, k=10, use_arrow=False)
    arrow = S.brute_force_topk(emb, query_max_id=5, k=10, use_arrow=True)
    a, b = _rows(jvm), _rows(arrow)
    assert a == b
    assert len(a) == 50  # 5 queries × k=10


def test_default_strategy_picks_jvm_below_threshold(spark):
    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    assert emb.count() < S.ARROW_SCORER_MIN_ROWS
    df = S.brute_force_topk(emb, query_max_id=5, k=10)
    # JVM path has no MapInArrow node
    assert "MapInArrow" not in df._jdf.queryExecution().executedPlan().toString()


def test_arrow_scorer_plan_has_no_pair_shuffle(spark):
    """The Arrow path's corpus never shuffles before the scorer: the
    only Exchange in the plan is the final ~k-rows-per-query rank
    window."""
    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    df = S.brute_force_topk(emb, query_max_id=5, k=10, use_arrow=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    scorer_pos = plan.index("MapInArrow")
    below_scorer = plan[scorer_pos:]
    assert "Exchange" not in below_scorer
