"""Contract guards on the similarity operators.

1. The per-pair vector ops (pdot/psqnorm/pcosine_with_norms) consume
   PRE-QUANTIZED array<long> (qarray output) and never quantize —
   feeding a raw array<float> of the right dimension would silently
   compute float math and produce oracle-mismatching scores.
   ``assert_quantized`` turns that silent wrongness into a TypeError,
   and the dtype itself is the tripwire (long vs double result).
2. The Arrow scorer materializes the query set on the driver;
   ``MAX_DRIVER_QUERY_ROWS`` bounds that collect so the 100 TB misuse
   path raises instead of OOMing the driver.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.operators import similarity as S


def _float_emb(spark, n=3):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") + i).cast("float") / 10.0 for i in range(S.EMB_DIM)]).alias(
            "embedding"
        ),
    )


def test_assert_quantized_accepts_qarray_output(spark):
    df = _float_emb(spark).select(
        "vec_id", S.qarray(F.col("embedding")).alias("v")
    )
    S.assert_quantized(df, "v")  # must not raise


def test_assert_quantized_rejects_raw_floats(spark):
    df = _float_emb(spark)
    with pytest.raises(TypeError, match="array<long>"):
        S.assert_quantized(df, "embedding")


def test_pdot_on_raw_floats_is_dtype_visible_and_guarded(spark):
    """Feeding pdot a raw float/double array must NOT silently produce
    scores indistinguishable from quantized ones: the quantized path is
    ``bigint`` while raw-float input surfaces as ``double`` — the dtype
    IS the tripwire — and every operator boundary converts that into a
    hard TypeError via ``assert_quantized`` before building pair
    expressions (see the module invariant)."""
    df = _float_emb(spark)
    quant = df.select(S.qarray(F.col("embedding")).alias("v")).select(
        S.pdot(F.col("v"), F.col("v")).alias("d")
    )
    assert dict(quant.dtypes)["d"] == "bigint"
    raw = df.select(
        S.pdot(F.col("embedding"), F.col("embedding")).alias("d")
    )
    assert dict(raw.dtypes)["d"] == "double"  # never masquerades as quantized
    with pytest.raises(TypeError, match="array<long>"):
        S.assert_quantized(df, "embedding")


def test_arrow_query_collect_guard(spark):
    df = _float_emb(spark, n=4)
    with pytest.raises(ValueError, match="MAX_DRIVER_QUERY_ROWS"):
        S.brute_force_topk(
            df, query_max_id=S.MAX_DRIVER_QUERY_ROWS + 1, k=2
        )


def test_lsh_bucket_plane_count_guard(spark):
    """31+ hyperplanes would wrap the int32 bucket id (weights are
    1 << plane_index); the guard fails at plan time, driver-side."""
    df = _float_emb(spark)
    too_many = [[[1] * S.EMB_DIM for _ in range(31)]]
    with pytest.raises(ValueError, match="at most 30"):
        S.arrow_lsh_buckets(df, too_many)


def test_pq_encode_plan_is_shuffle_free_and_exact_shapes(spark):
    """After the bounded training pass, PQ encoding must be a pure
    expression plan — zero shuffle exchanges — and ADC search must be
    a broadcast join with a WindowGroupLimit-bounded rank."""
    from duckdb_redis_olap_scanner_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    enc = S.pq_encode(emb)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
        == 0
    )
    n = emb.count()
    assert enc.count() == n * S.PQ_M
    codes = enc.agg({"code": "max"}).collect()[0][0]
    assert 0 <= codes < S.PQ_KS

    adc = S.pq_adc_topk(emb, query_max_id=2, k=3)
    plan2 = adc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan2
    assert "WindowGroupLimit" in plan2
    rows = adc.collect()
    assert len(rows) == 2 * 3
    for r in rows:
        assert r.neighbor_id != r.query_id and 1 <= r.rank <= 3


def test_pq_guards(spark):
    from duckdb_redis_olap_scanner_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_encode(emb, m=5)
    with pytest.raises(ValueError, match="MAX_DRIVER_QUERY_ROWS"):
        S.pq_encode(emb, ks=S.MAX_DRIVER_QUERY_ROWS + 1)
    with pytest.raises(ValueError, match="MAX_DRIVER_QUERY_ROWS"):
        S.pq_adc_topk(emb, query_max_id=S.MAX_DRIVER_QUERY_ROWS + 1)


def test_ivf_pq_plan_and_probe_containment(spark):
    """IVF-PQ: the corpus frame stays a zero-shuffle expression plan
    before the broadcast query join; every returned neighbor sits in
    one of its query's probed cells."""
    from duckdb_redis_olap_scanner_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = S.ivf_pq_topk(emb, query_max_id=2, k=3, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The only exchange is the rank window's (tiny, k*Q rows).
    assert (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
        <= 1
    )
    assert "BroadcastNestedLoopJoin" in plan
    rows = df.collect()
    assert rows and all(r.neighbor_id != r.query_id for r in rows)
    assert all(1 <= r.rank <= 3 for r in rows)


def test_ivf_pq_residual_plan_and_shapes(spark):
    """Residual IVF-PQ keeps the zero-corpus-shuffle contract (only
    the rank window's tiny exchange) and per-cell LUT selection."""
    from duckdb_redis_olap_scanner_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = S.ivf_pq_residual_topk(emb, query_max_id=2, k=3, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
        <= 1
    )
    rows = df.collect()
    assert rows and all(r.neighbor_id != r.query_id for r in rows)
    assert all(1 <= r.rank <= 3 for r in rows)
