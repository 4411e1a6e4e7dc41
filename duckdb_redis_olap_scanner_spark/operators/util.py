"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(
    df: DataFrame,
    min_parts: int | None = None,
    key: str | None = None,
    sort_partitions: bool = False,
    force_layout: bool = False,
) -> DataFrame:
    """Ensure a per-row-heavy pipeline isn't bottlenecked by input file
    granularity.

    A small parquet table is one file = one split = ONE core doing all
    the downstream per-row work (hashing, shingling, vector math) while
    the rest of the cluster idles. When the scan has fewer partitions
    than the session's default parallelism, repartition up to it — the
    shuffle moves only the (small) source rows, and the expensive
    narrow work after it runs wide. At real scale the input already
    splits into >= parallelism partitions and this is a no-op, so it
    never adds a shuffle of big data.

    ``key`` hash-partitions on that column instead of round-robin.
    Prefer it: round-robin repartition local-sorts every row for retry
    determinism (spark.sql.execution.sortBeforeRepartition), while
    hash partitioning is sort-free — and partitioning a table by its
    join key makes downstream equi-joins on that key shuffle-free on
    the pre-partitioned side, the same co-location bucketing buys.

    ``force_layout`` (with ``key``) repartitions unconditionally —
    for cached table LAYOUTS, where hash placement matters and the
    partition-count shortcut would wrongly accept a wide-but-unkeyed
    scan. Mid-operator callers leave it off: their fan-out is purely
    a width fix and must stay a no-op on already-wide inputs.

    ``sort_partitions`` additionally local-sorts each hash partition on
    ``key`` — the in-memory analog of a ``bucketBy().sortBy()`` table
    layout: downstream sort-merge joins on the key then sort
    already-ordered runs (near-linear) instead of doing the full sort
    per query. Only applied on the repartition path, where the one-time
    shuffle already pays the data movement; a well-partitioned
    cluster-scale scan is returned untouched, so this never adds
    read-side work at volume.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if key is not None and force_layout:
        # Layout request (the catalog's cached keyed loads): partition
        # count is NOT the point — hash placement by the join key is.
        # A scan can be plenty wide yet unkeyed (a 10x-volume file
        # splits into >= parallelism raw splits), and the
        # partition-count shortcut below would then hand every
        # downstream join a full per-query shuffle. The forced
        # repartition runs ONCE into the cached layout (the in-memory
        # analog of bucketBy-on-storage); per-query consumers join
        # exchange-free at every volume.
        out = df.repartition(target, df[key])
        if sort_partitions:
            out = out.sortWithinPartitions(key)
        return out
    if df.rdd.getNumPartitions() < target:
        if key is not None:
            out = df.repartition(target, df[key])
            if sort_partitions:
                out = out.sortWithinPartitions(key)
            return out
        return df.repartition(target)
    return df


def let_bind(fields: dict, body):
    """Evaluate-once binding for HOF expression trees.

    Referencing a Column object twice INLINES its whole expression
    tree twice, and Spark performs no common-subexpression
    elimination across lambda boundaries — an expensive subexpression
    referenced inside a per-element lambda re-evaluates PER ELEMENT
    (the wordpiece encode ran its vocab-scan aggregate once per
    continuation character before this: 28 s -> 3.7 s on a 10x
    corpus, identical hashes; operators/retrieval.py).

    ``transform`` over a one-element struct array binds the computed
    values to a lambda variable whose field reads are data loads:

        let_bind({"x": expensive_expr}, lambda s: f(s["x"], s["x"]))

    evaluates ``expensive_expr`` exactly once however many times the
    body references it.
    """
    from pyspark.sql import functions as F

    bound = F.array(F.struct(*[c.alias(n) for n, c in fields.items()]))
    return F.element_at(F.transform(bound, body), 1)
