"""Plan-shape and edge-case tests for the round-6 pipeline operators
(retrieval, repetition, chunking, quantization, packing, prototypes,
rolling anomaly).

Plan assertions follow tests/test_plans.py: the physical plan must be
the plan we'd want at 100 TB — broadcast scalars (never shuffled
joins against 1-row stats), TakeOrderedAndProject for top-k, narrow
maps with no shuffle beyond the small-file fan_out, a single window
pass for the rolling detector."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.operators import packing as PK
from duckdb_redis_olap_scanner_spark.operators import quantize as QZ
from duckdb_redis_olap_scanner_spark.operators import similarity as S
from duckdb_redis_olap_scanner_spark.plans.catalog import registry

from .conftest import SF_DIR

ENTRIES = registry()


def plan_of(spark, name: str) -> str:
    df = ENTRIES[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # Entries memoize their DataFrame; if another test already executed
    # it, AQE's explain carries BOTH the final and the initial plan —
    # keep only the final so operator counts aren't doubled.
    return plan.split("== Initial Plan ==")[0]


def n_shuffles(plan: str) -> int:
    return plan.count("+- Exchange") + plan.count(":- Exchange")


def test_bm25_is_topk_with_broadcast_stats(spark):
    plan = plan_of(spark, "text_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    # The 1-row corpus-stats side joins via broadcast, never a shuffle
    # join: at 100 TB the stats row is the only thing that moves.
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_vocabulary_is_topk(spark):
    plan = plan_of(spark, "text_vocabulary")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_chunk_documents_is_narrow(spark):
    """Generator explode fans out in-stage: no aggregate, no join, and
    the only exchange is the small-file fan_out repartition."""
    plan = plan_of(spark, "pipeline_chunk_documents")
    assert "Generate" in plan
    assert "HashAggregate" not in plan
    assert "Join" not in plan
    assert n_shuffles(plan) <= 1


def test_quantize_is_narrow_jvm_map(spark):
    plan = plan_of(spark, "pipeline_quantize_int8")
    assert "HashAggregate" not in plan
    assert "Join" not in plan
    assert n_shuffles(plan) <= 1
    # Pure column expressions — no Python/Arrow worker in this path.
    assert "Python" not in plan and "ArrowEval" not in plan


def _n_window_ops(plan: str) -> int:
    # Count tree nodes "Window (N)" — plan_of keeps only the final
    # plan's tree, so each operator appears exactly once there.
    import re

    return len(re.findall(r"\bWindow \(\d+\)", plan))


def test_rolling_anomaly_single_window_pass(spark):
    plan = plan_of(spark, "events_rolling_anomaly")
    assert _n_window_ops(plan) == 1
    # One exchange partitions by user_id for the window; nothing else.
    assert n_shuffles(plan) <= 1


def test_pack_sequences_single_window_pass(spark):
    plan = plan_of(spark, "pipeline_pack_sequences")
    assert _n_window_ops(plan) == 1


def test_pack_sequences_rejects_non_power_of_two(spark, tables):
    with pytest.raises(ValueError, match="power of two"):
        PK.pack_sequences(tables["documents"], seq_len=100)


def test_prototypes_guard_driver_collect(spark, tables):
    with pytest.raises(ValueError, match="MAX_DRIVER_QUERY_ROWS"):
        S.ivf_prototypes(tables["embeddings"], n_cells=1_000_000)


def test_quantize_zero_vector_yields_null_scale(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, -2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in QZ.quantize_int8(df).collect()}
    assert rows[0].scale is None and rows[0].sq_err is None
    assert rows[0].qvec is None  # not "" — no silently-wrong codes
    assert rows[1].scale == 63.5
    assert rows[1].qvec == "64,-127"


def test_chunk_windows_tile_with_overlap(spark, tables):
    """Chunk geometry: consecutive windows advance by stride, overlap
    by size-stride, and the last window covers the tail."""
    from duckdb_redis_olap_scanner_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    out = chunk_documents(tables["documents"]).filter(F.col("doc_id") == 0)
    rows = sorted(out.collect(), key=lambda r: r.chunk_idx)
    n_tok = rows[0].chunk_len if len(rows) == 1 else None
    for i, r in enumerate(rows):
        assert r.start_tok == i * CHUNK_STRIDE
        assert r.chunk_len <= CHUNK_TOKENS
    if len(rows) > 1:
        assert all(r.chunk_len == CHUNK_TOKENS for r in rows[:-1])


def test_pack_offsets_are_contiguous_per_bucket(spark, tables):
    """Within a bucket the packed stream has no gaps: offsets sorted by
    start_tok tile exactly (next start = prev start + prev n_tok)."""
    out = PK.pack_sequences(tables["documents"]).collect()
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.start_tok)
        off = 0
        for r in rows:
            assert r.start_tok == off
            off += r.n_tok


def test_bm25_scores_monotone_in_tf(spark, tables):
    """Sanity: the top-ranked doc must contain at least one query term
    (score > 0 filter) and scores are non-increasing down the list."""
    from duckdb_redis_olap_scanner_spark.operators.retrieval import bm25_topk

    rows = bm25_topk(tables["documents"]).collect()
    assert rows, "no document matched any query term?"
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_parameter_guards_reject_nonsense(spark, tables):
    from duckdb_redis_olap_scanner_spark.operators.retrieval import bm25_topk
    from duckdb_redis_olap_scanner_spark.operators.text import chunk_documents

    with pytest.raises(ValueError, match="a-z0-9_"):
        bm25_topk(tables["documents"], terms=("ok", "bad term"))
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(tables["documents"], size=8, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(tables["documents"], size=8, stride=16)
    with pytest.raises(ValueError, match="n_buckets"):
        PK.pack_sequences(tables["documents"], n_buckets=0)


def test_pack_manifest_sequences_full_except_bucket_tail(spark, tables):
    """Packing correctness at the sequence level: every sequence
    except each bucket's LAST is exactly full, and fill fractions
    never exceed 1."""
    from pyspark.sql import Window

    from duckdb_redis_olap_scanner_spark.operators.packing import (
        PACK_SEQ_LEN,
        pack_manifest,
    )

    m = pack_manifest(tables["documents"])
    w = Window.partitionBy("bucket")
    bad = (
        m.withColumn("mx", F.max("seq").over(w))
        .filter(F.col("seq") < F.col("mx"))
        .filter(F.col("n_tokens") != PACK_SEQ_LEN)
    )
    assert bad.count() == 0
    assert m.filter(F.col("fill_frac") > 1.0).count() == 0


def test_webdataset_ingest_multi_record_tar(spark):
    """A document longer than one 10240-byte tar record must produce
    a two-record archive (the block arithmetic, not just the
    single-record constant the sf0.01 corpus lands on)."""
    from duckdb_redis_olap_scanner_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "x" * 15000, "en", "web"), (2, "short", "de", "book")],
        "doc_id long, text string, lang string, source string",
    )
    rows = {r.doc_id: r for r in M.webdataset_ingest(docs).collect()}
    # doc 1: txt 15000 -> 30 data blocks; json 30B -> 1; headers 2;
    # trailer 2 -> 35 blocks = 17920B -> 2 records = 20480
    assert rows[1].tar_bytes == 20480
    assert rows[2].tar_bytes == 10240
    assert rows[1].n_members == 2
    import hashlib

    assert rows[1].txt_md5 == hashlib.md5(b"x" * 15000).hexdigest()
    assert rows[2].json_md5 == hashlib.md5(
        b'{"lang": "de", "source": "book"}'
    ).hexdigest()


def test_webdataset_shards_null_text_total_assignment(spark):
    """ADVICE r11: a NULL text must hash like the empty string —
    landing in a REAL shard whose tar holds an empty .txt member —
    not in a NULL shard_id group that crashed _pack's int(NaN).
    Pins: no lost rows, the NULL doc shares doc 2's (empty-text)
    shard, and every shard verifies its member order."""
    from duckdb_redis_olap_scanner_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [
            (1, None, "en", "web"),
            (2, "", "de", "book"),
            (3, "some text", None, None),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = M.webdataset_shards(docs, n_shards=4).collect()
    assert sum(r.n_samples for r in rows) == 3
    assert all(r.shard_id is not None for r in rows)
    assert all(r.verify_ok for r in rows)
    by_samples = {r.n_samples: r for r in rows}
    # NULL and '' canonicalize identically -> same shard, 2 samples.
    assert set(by_samples) == {1, 2}
    import hashlib

    # Their concatenated payload is empty -> md5 of b"".
    assert by_samples[2].payload_md5 == hashlib.md5(b"").hexdigest()
