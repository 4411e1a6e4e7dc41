"""Salted aggregation / join produce results identical to their
unsalted forms while spreading hot keys over multiple reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.operators.skew import salted_agg, salted_join
from duckdb_redis_olap_scanner_spark.plans.catalog import table

from .conftest import SF_DIR


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_agg_equals_plain_agg(spark):
    li = table(spark, SF_DIR, "lineitem").withColumn(
        "qty_cents", F.floor(F.col("l_quantity") * 100).cast("long")
    )
    got = salted_agg(
        li,
        key="l_returnflag",
        salt_from="l_orderkey",
        n_salts=16,
        sum_col="qty_cents",
        sum_alias="qty_total",
    )
    want = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty_cents").alias("qty_total"),
    )
    cols = ["l_returnflag", "n_rows", "qty_total"]
    assert _rows(got, cols) == _rows(want, cols)


def test_salted_agg_spreads_groups(spark):
    """Phase 1 must actually produce multiple (key, salt) groups per key."""
    li = table(spark, SF_DIR, "lineitem")
    phase1 = (
        li.withColumn("_salt", F.pmod(F.hash(F.col("l_orderkey")), F.lit(16)))
        .groupBy("l_returnflag", "_salt")
        .count()
    )
    per_key = phase1.groupBy("l_returnflag").count().collect()
    assert all(r["count"] == 16 for r in per_key)


def test_salted_join_equals_plain_join(spark):
    o = table(spark, SF_DIR, "orders")
    c = table(spark, SF_DIR, "customer")
    # Treat the 3 busiest customers as "hot".
    hot = [
        r.o_custkey
        for r in o.groupBy("o_custkey").count().orderBy(F.desc("count")).limit(3).collect()
    ]
    got = salted_join(
        o, c.withColumnRenamed("c_custkey", "o_custkey"),
        key="o_custkey", hot_keys=hot, salt_from="o_orderkey", n_salts=8,
    )
    want = o.join(
        c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "inner"
    )
    assert got.count() == want.count()
    cols = ["o_orderkey", "o_custkey", "c_nationkey"]
    assert _rows(got, cols) == _rows(want, cols)


def test_lsh_recall_against_ground_truth(spark):
    """Every LSH-found near-dup pair must appear in the brute-force
    ground truth (precision = 1 by construction: same verify filter),
    and recall at this threshold/plane-count must be substantial."""
    from duckdb_redis_olap_scanner_spark.operators import similarity as S

    from .conftest import SF_DIR_ORACLE

    emb = table(spark, SF_DIR_ORACLE, "embeddings")
    truth = {
        (r.vec_a, r.vec_b)
        for r in S.embedding_near_dup_pairs(emb, threshold=0.45).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in S.embedding_near_dup_lsh(emb, threshold=0.45).collect()
    }
    assert lsh <= truth  # no false positives
    if truth:
        recall = len(lsh) / len(truth)
        # 4 tables × 4 planes at cos≥0.45 → expected recall ≈ 0.55.
        assert recall >= 0.25, f"LSH recall collapsed: {recall:.2f}"


def test_cluster_pairs_components(spark):
    """Min-label propagation on a known graph: a 4-node chain (needs
    >1 round — labels travel one hop per round), a 2-node pair, and a
    self-pair singleton all collapse to their component minimum."""
    from duckdb_redis_olap_scanner_spark.operators.dedup import cluster_pairs

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (20, 21), (30, 30)],
        "doc_a long, doc_b long",
    )
    got = {(r.doc_id, r.cluster_id) for r in cluster_pairs(pairs).collect()}
    assert got == {
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20),
        (30, 30),
    }


def test_cluster_pairs_deep_chain_crosses_checkpoint(spark):
    """r22: a path component whose diameter exceeds
    _CHECKPOINT_EVERY_ROUNDS forces the fixpoint through its
    localCheckpoint lineage cut — the labels must still collapse to
    the component minimum (and the checkpointed round's result must
    keep feeding later rounds correctly)."""
    from duckdb_redis_olap_scanner_spark.operators import dedup as D

    n = D._CHECKPOINT_EVERY_ROUNDS + 4  # chain longer than the cut
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 100 + n)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in D.cluster_pairs(pairs, max_iter=2 * n).collect()
    }
    assert got == {(100 + i, 100) for i in range(n + 1)}
