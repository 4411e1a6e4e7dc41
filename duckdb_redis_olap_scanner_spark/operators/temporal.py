"""Temporal join operators: as-of join and banded range join.

Spark has no native ASOF JOIN (DuckDB does: reference-class engines
grew one because the naive formulation — an inequality join + argmax —
explodes quadratically). Both operators here are expressed so the
heavy step is a SINGLE equi-shuffle:

* as-of join      — union both sides, one window per `by` group
                    ordered by (on, side), `last(ignorenulls)` fills
                    each left row with the most recent right row at or
                    before it. One shuffle on `by`; no pair blow-up.
* banded range join — bucket the time axis by the band width; a row
                    can only match rows in its own or the adjacent
                    bucket, so an equi-join on (key, bucket) bounds
                    candidates, then the exact range predicate filters.
                    This is how range joins stay shuffle-bounded at
                    100 TB (DuckDB's IEJoin solves the same problem
                    single-node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
) -> DataFrame:
    """DuckDB `ASOF LEFT JOIN` semantics: for each left row, the right
    row of the same `by` group with the greatest `on` <= left.`on`
    (ties at equal `on` match). Left rows with no prior right row get a
    NULL match.

    Returns the left columns plus a `matched` struct of the right
    columns (NULL when unmatched). Plan shape: union → single shuffle
    on `by` → sort (on, side) → running last(ignorenulls). The right
    row rides as ONE struct so N right columns don't need N window
    expressions.
    """
    rstruct = F.struct(*[F.col(c) for c in right.columns]).alias("_match")
    lstruct = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    r = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        rstruct,
    ).withColumn("_lrow", F.lit(None).cast(left.select(lstruct).schema["_lrow"].dataType))
    l = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.select(rstruct).schema["_match"].dataType).alias("_match"),
        lstruct,
    )
    both = r.select("_by", "_on", "_side", "_match", "_lrow").unionByName(l)
    # Right rows sort BEFORE left rows at equal `on` (side 0 < 1), so an
    # equal-timestamp right row is visible to the left row — the ASOF
    # `>=` tie rule.
    w = (
        Window.partitionBy("_by")
        .orderBy("_on", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.withColumn(
        "matched", F.last("_match", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).select("_lrow.*", "matched")


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    band_micros: int = 3_600_000_000,
) -> DataFrame:
    """All (a, b) pairs within a `by` group where
    b.`on` ∈ [a.`on`, a.`on` + band]. The band width defines a bucket
    grid; b's bucket is either a's or the next one, so ONE equi-join on
    (by, bucket) — with the left side exploded to its two candidate
    buckets — bounds the candidate set before the exact filter. No pair
    appears twice (b has exactly one bucket).

    Returns (by, a-row struct, b-row struct, micros_apart).
    """
    amic = F.unix_micros(F.col(on))
    astruct = F.struct(*[F.col(c) for c in left.columns])
    bstruct = F.struct(*[F.col(c) for c in right.columns])
    bucket = F.floor(amic / F.lit(band_micros))
    a = left.select(
        F.col(by).alias("_by"),
        amic.alias("_amic"),
        astruct.alias("a"),
        F.explode(F.array(bucket, bucket + 1)).alias("_bucket"),
    )
    b = right.select(
        F.col(by).alias("_by"),
        F.unix_micros(F.col(on)).alias("_bmic"),
        bstruct.alias("b"),
        F.floor(F.unix_micros(F.col(on)) / F.lit(band_micros)).alias("_bucket"),
    )
    return (
        a.join(b, ["_by", "_bucket"])
        .filter(
            (F.col("_bmic") >= F.col("_amic"))
            & (F.col("_bmic") <= F.col("_amic") + F.lit(band_micros))
        )
        .select(
            F.col("_by").alias(by),
            "a",
            "b",
            (F.col("_bmic") - F.col("_amic")).alias("micros_apart"),
        )
    )
