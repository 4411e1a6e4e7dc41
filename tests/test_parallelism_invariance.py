"""Partition-count invariance: the classic distributed-engine bug is
output that depends on parallelism (sum order, unstable tie-breaks,
per-partition state leaking into results). Every operator here is
designed to be partitioning-invariant — integer/fixed-order math and
total-order tie-breaks — and this suite pins that by running each
operator on the SAME data repartitioned two different ways and
asserting bit-identical outputs.
"""

from __future__ import annotations

import pytest

from duckdb_redis_olap_scanner_spark.operators import packing as PK
from duckdb_redis_olap_scanner_spark.operators import quantize as QZ
from duckdb_redis_olap_scanner_spark.operators import retrieval as R
from duckdb_redis_olap_scanner_spark.operators import similarity as S
from duckdb_redis_olap_scanner_spark.operators import text as T
from duckdb_redis_olap_scanner_spark.operators.dedup import (
    duplicate_ngram_stats,
    exact_dedup,
    minhash_lsh_dedup,
    segment_dedup,
)


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def _invariant(op, src, parts_a=3, parts_b=17):
    a = _canon(op(src.repartition(parts_a)))
    b = _canon(op(src.repartition(parts_b)))
    assert a == b, "output depends on input partitioning"
    assert a, "empty output makes the invariance check vacuous"


DOC_OPS = [
    pytest.param(R.bm25_topk, id="bm25_topk"),
    pytest.param(R.vocabulary_topk, id="vocabulary_topk"),
    pytest.param(R.oov_stats, id="oov_stats"),
    pytest.param(T.with_repetition_stats, id="repetition_stats"),
    pytest.param(T.chunk_documents, id="chunk_documents"),
    pytest.param(T.with_char_diversity, id="char_diversity"),
    pytest.param(PK.pack_sequences, id="pack_sequences"),
    pytest.param(exact_dedup, id="exact_dedup"),
    pytest.param(duplicate_ngram_stats, id="duplicate_ngrams"),
    pytest.param(minhash_lsh_dedup, id="minhash_lsh_dedup"),
    pytest.param(segment_dedup, id="segment_dedup"),
    pytest.param(T.quality_classifier, id="quality_classifier"),
    pytest.param(T.bigram_familiarity, id="bigram_familiarity"),
    pytest.param(R.bpe_train_merges, id="bpe_train_merges"),
    pytest.param(R.bpe_encode_stats, id="bpe_encode_stats"),
]


@pytest.mark.parametrize("op", DOC_OPS)
def test_document_ops_partition_invariant(spark, tables, op):
    _invariant(op, tables["documents"])


EMB_OPS = [
    pytest.param(QZ.quantize_int8, id="quantize_int8"),
    pytest.param(S.ivf_prototypes, id="ivf_prototypes"),
    pytest.param(S.kmeans_refine, id="kmeans_refine"),
    pytest.param(S.brute_force_topk, id="brute_force_topk"),
    pytest.param(S.random_projection, id="random_projection"),
]


@pytest.mark.parametrize("op", EMB_OPS)
def test_embedding_ops_partition_invariant(spark, tables, op):
    _invariant(op, tables["embeddings"])


def test_r11_ops_partition_invariant(spark, tables):
    """The round-11 additions under the same two-way repartition
    protocol: the incremental dedup pair (two-input — both sides
    repartitioned differently), containment decontamination, and the
    WebDataset shard writer (whose per-shard tar bytes and ordered
    payload md5 must not depend on how rows arrived)."""
    from pyspark.sql import functions as F

    from duckdb_redis_olap_scanner_spark.operators.dedup import (
        decontaminate_containment,
        incremental_dedup,
        incremental_minhash_dedup,
    )
    from duckdb_redis_olap_scanner_spark.operators.multimodal import (
        webdataset_shards,
    )

    docs = tables["documents"]
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)

    for op in (incremental_dedup, incremental_minhash_dedup):
        a = _canon(op(hist.repartition(3), inc.repartition(5)))
        b = _canon(op(hist.repartition(17), inc.repartition(2)))
        assert a == b and a

    for op in (decontaminate_containment, webdataset_shards):
        _invariant(op, docs)
