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


def test_default_strategy_is_arrow(spark):
    """Default picks the Arrow scorer at every corpus size (measured
    faster even at 100 rows — see brute_force_topk docstring)."""
    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    df = S.brute_force_topk(emb, query_max_id=5, k=10)
    assert "MapInArrow" in df._jdf.queryExecution().executedPlan().toString()


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


import numpy as np
import pytest


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_strategies_identical_on_adversarial_values(spark, seed):
    """JVM and Arrow scoring must agree bit-for-bit on hostile inputs:
    negatives, magnitudes straddling the floor(x*1000) quantization
    boundary, near-duplicate vectors (tie-adjacent cosines)."""
    rng = np.random.default_rng(seed)
    n, dim = 40, 8
    vecs = rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)
    vecs[10] = vecs[3] * 0.999  # near-duplicate pair
    vecs[11] = -vecs[4]  # exact negation
    vecs[12] = rng.uniform(-0.002, 0.002, size=dim).astype(
        np.float32
    )  # quantization-boundary magnitudes
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from duckdb_redis_olap_scanner_spark.operators import similarity as S

    jvm = S.brute_force_topk(emb, query_max_id=4, k=7, use_arrow=False)
    arrow = S.brute_force_topk(emb, query_max_id=4, k=7, use_arrow=True)
    canon = lambda df: sorted(  # noqa: E731
        (r.query_id, r.neighbor_id, repr(r.cos_sim), r.rank) for r in df.collect()
    )
    assert canon(jvm) == canon(arrow)


@pytest.mark.parametrize("seed", [3, 99])
def test_arrow_pair_scorer_matches_jvm_math(spark, seed):
    """arrow_pair_cosine (the production verify path) must agree
    bit-for-bit with the JVM quantized-cosine expressions on hostile
    inputs — negatives, quantization-boundary magnitudes, near-ties."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    n, dim = 30, 64
    vecs = rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)
    vecs[5] = vecs[2] * 0.999
    vecs[6] = -vecs[3]
    vecs[7] = rng.uniform(-0.002, 0.002, size=dim).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    arrow = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in S.arrow_pair_cosine(pairs).collect()
    }
    qa = emb.select(
        F.col("vec_id").alias("vec_a"), S.qarray(F.col("embedding")).alias("va")
    ).select("vec_a", "va", S.psqnorm(F.col("va")).alias("na"))
    qb = emb.select(
        F.col("vec_id").alias("vec_b"), S.qarray(F.col("embedding")).alias("vb")
    ).select("vec_b", "vb", S.psqnorm(F.col("vb")).alias("nb"))
    jvm = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in qa.join(qb, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            S.pcosine_with_norms(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ).alias("cos_sim"),
        )
        .collect()
    }
    assert set(arrow) == set(jvm)
    for k in jvm:
        assert repr(arrow[k]) == repr(jvm[k]), (k, arrow[k], jvm[k])
