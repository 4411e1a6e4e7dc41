"""Schema-drift canaries for the documents and embeddings tables.

The round-4 breaker was an events-ts physical-type flip between
sandbox generations; ``table()`` now adapts. These tests defend the
OTHER two driver-generated tables the pipeline operators consume
against the drifts a regeneration could plausibly introduce —
nullable text, float64 embeddings — by writing tiny parquet files in
each variant shape and asserting the Spark operators and the DuckDB
oracle still agree (the same end-to-end contract the driver gate
checks), rather than merely not crashing.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from duckdb_redis_olap_scanner_spark.plans.catalog import registry

ENTRIES = registry()


def _compare(spark, sf_dir: str, entry: str, table_name: str) -> None:
    sdf = ENTRIES[entry].fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table_name} AS SELECT * FROM "
        f"'{os.path.join(sf_dir, table_name)}.parquet'"
    )
    odf = con.execute(ENTRIES[entry].oracle).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), entry
    # Same canonicalization as the oracle-parity harness (NULL/NaN/NaT
    # unified) — a pandas dtype artifact must not read as a drift.
    from .test_oracle_parity import _canon_rows

    s, o = _canon_rows(sdf), _canon_rows(odf)
    assert s == o, f"{entry}: drifted values\n{s[:3]}\n{o[:3]}"


def test_documents_with_null_and_empty_text(spark, tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["alpha beta alpha beta gamma", None, "", "alpha beta"],
                pa.string(),
            ),
            "lang": pa.array(["en", "en", "de", "en"], pa.string()),
            "source": pa.array(["a", "a", "b", "b"], pa.string()),
            "n_chars": pa.array([27, 0, 0, 10], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    # Narrow maps + the agg/window entries most likely to mishandle a
    # NULL token array; both engines must agree row-for-row.
    for entry in (
        "text_token_stats",
        "text_repetition_stats",
        "pipeline_chunk_documents",
        "pipeline_pack_sequences",
        "text_duplicate_ngrams",
        "text_char_diversity",
        "text_pii_scrub",
        "text_vocabulary",
        "text_bm25_topk",
        "pipeline_oov_stats",
        "multimodal_decode_bmp",
        "multimodal_decode_ppm",
        "multimodal_decode_wav",
        "multimodal_decode_png",
        "multimodal_decode_wav_mulaw",
        "multimodal_resize_nearest",
        "multimodal_decode_avi",
        "pipeline_bpe_train",
        "pipeline_bpe_encode",
        "pipeline_gzip_ingest",
        "pipeline_curation_v2",
        "dedup_edit_distance",
        "multimodal_audio_resample",
        "pipeline_dataset_card",
        "pipeline_source_overlap",
        "multimodal_flip_augment",
        "pipeline_tokenize_ids",
        "text_pii_scrub_full",
        "multimodal_image_features",
        "multimodal_audio_energy",
        "pipeline_segment_dedup",
        "pipeline_quality_classifier",
        "pipeline_bigram_lm",
        "pipeline_token_budget",
        "pipeline_curriculum_shards",
        "text_top_terms_per_source",
    ):
        _compare(spark, str(tmp_path), entry, "documents")


def test_embeddings_as_float64_lists(spark, tmp_path):
    # A regeneration could ship embedding as list<double> instead of
    # list<float>; the Arrow scorers astype to float64 regardless, but
    # the declared mapInArrow output schemas and the oracle quantizer
    # must still agree end to end.
    vecs = [
        [float(((i * 31 + d * 7) % 13) - 6) / 4.0 for d in range(64)]
        for i in range(20)
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
            "label": pa.array([i % 3 for i in range(20)], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    for entry in (
        "pipeline_quantize_int8",
        "pipeline_semantic_prototypes",
        "pipeline_kmeans_refine",
        "embedding_random_projection",
    ):
        _compare(spark, str(tmp_path), entry, "embeddings")


def test_embeddings_empty_table(spark, tmp_path):
    """Zero-row embeddings: the similarity/quantization entries must
    run on both engines and agree on zero rows — in particular
    kmeans_refine's driver-side centroid reduce must return an empty
    frame, not crash on max() of an empty sequence."""
    tbl = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
            "label": pa.array([], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    for entry in (
        "pipeline_quantize_int8",
        "pipeline_semantic_prototypes",
        "pipeline_kmeans_refine",
        "embedding_random_projection",
    ):
        _compare(spark, str(tmp_path), entry, "embeddings")


def test_documents_empty_table(spark, tmp_path):
    """Zero-row corpus: every document entry must run on both engines
    and agree (typically zero rows) — no div-by-zero in corpus-stats
    scalars, no window/explode crashes on empty input."""
    tbl = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    for entry in (
        "text_token_stats",
        "text_repetition_stats",
        "pipeline_chunk_documents",
        "pipeline_pack_sequences",
        "text_duplicate_ngrams",
        "text_char_diversity",
        "text_pii_scrub",
        "text_vocabulary",
        "text_bm25_topk",
        "pipeline_oov_stats",
        "multimodal_decode_bmp",
        "multimodal_decode_ppm",
        "multimodal_decode_wav",
        "multimodal_decode_png",
        "multimodal_decode_wav_mulaw",
        "multimodal_resize_nearest",
        "multimodal_decode_avi",
        "pipeline_bpe_train",
        "pipeline_bpe_encode",
        "pipeline_gzip_ingest",
        "pipeline_curation_v2",
        "dedup_edit_distance",
        "multimodal_audio_resample",
        "pipeline_dataset_card",
        "pipeline_source_overlap",
        "multimodal_flip_augment",
        "pipeline_tokenize_ids",
        "text_pii_scrub_full",
        "multimodal_image_features",
        "multimodal_audio_energy",
        "pipeline_segment_dedup",
        "pipeline_quality_classifier",
        "pipeline_bigram_lm",
        "pipeline_token_budget",
        "pipeline_curriculum_shards",
        "text_top_terms_per_source",
    ):
        _compare(spark, str(tmp_path), entry, "documents")
