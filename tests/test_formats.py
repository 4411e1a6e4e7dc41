"""Source-format coverage beyond parquet: CSV and JSON lines round-trip
with explicit schemas (the reference's host DuckDB provides csv/json
scans; in Spark they are the same declarative readers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.plans.catalog import table

from .conftest import SF_DIR


def _orders_subset(spark):
    return (
        table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_with_schema(spark, tmp_path):
    o = _orders_subset(spark)
    path = str(tmp_path / "orders_csv")
    o.write.option("header", "true").csv(path)
    back = (
        spark.read.option("header", "true")
        .schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "price_cents long"
        )
        .csv(path)
    )
    assert _rows(back) == _rows(o)


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    o = _orders_subset(spark)
    path = str(tmp_path / "orders_json")
    o.write.json(path)
    back = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "price_cents long"
    ).json(path)
    assert _rows(back) == _rows(o)


def test_csv_schema_inference_matches_explicit(spark, tmp_path):
    """inferSchema on a clean numeric CSV agrees with the declared
    schema (sanity that the inference path is usable for exploration —
    production reads always declare schemas)."""
    o = _orders_subset(spark)
    path = str(tmp_path / "orders_csv2")
    o.write.option("header", "true").csv(path)
    inferred = (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .csv(path)
    )
    # Inference picks the narrowest integer type that fits (int here).
    assert [f.dataType.simpleString() for f in inferred.schema.fields] == [
        "int",
        "int",
        "string",
        "int",
    ]


def test_orc_roundtrip(spark, tmp_path):
    """ORC round-trip (built-in columnar alternative to parquet): same
    declarative reader surface, schema preserved without redeclaring."""
    o = _orders_subset(spark)
    path = str(tmp_path / "orders_orc")
    o.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == o.schema
    assert _rows(back) == _rows(o)


def test_orc_predicate_pushdown(spark, tmp_path):
    """Filters reach the ORC scan (PushedFilters) just as with parquet —
    format choice doesn't cost the pushdown optimization."""
    import contextlib
    import io

    o = _orders_subset(spark)
    path = str(tmp_path / "orders_orc_pd")
    o.write.orc(path)
    df = spark.read.orc(path).filter(F.col("o_orderkey") < 100)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters:" in plan and "o_orderkey" in plan
