"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure a per-row-heavy pipeline isn't bottlenecked by input file
    granularity.

    A small parquet table is one file = one split = ONE core doing all
    the downstream per-row work (hashing, shingling, vector math) while
    the rest of the cluster idles. When the scan has fewer partitions
    than the session's default parallelism, round-robin repartition up
    to it — the shuffle moves only the (small) source rows, and the
    expensive narrow work after it runs wide. At real scale the input
    already splits into >= parallelism partitions and this is a no-op,
    so it never adds a shuffle of big data.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
