"""Skew-mitigation utilities: salted aggregation and salted broadcast-
less joins.

AQE's skew-join split (enabled in ``engine.get_spark``) handles most
runtime skew transparently; these operators are the explicit form for
the cases AQE can't fix:

* ``salted_agg``  — two-phase aggregation for a hot grouping key: the
  map side groups on (key, salt) first, spreading one giant key over
  ``n_salts`` reducers, then a tiny second aggregation merges the salt
  partials. Works for any algebraic aggregate (sum/count/min/max).
* ``salted_join`` — fact×fact equi-join with one pathologically hot
  key set: the skewed side gets a random-ish salt derived from a
  uniform row attribute, the other side is exploded ``n_salts``× for
  the hot keys only, so the hot key's rows spread over ``n_salts``
  tasks instead of one straggler.

At 100 TB a single hot key (null-ish IDs, default values, bot users)
otherwise serializes the whole stage on one task — salting converts the
straggler into ``n_salts`` parallel tasks at the cost of an extra small
shuffle (agg) or a bounded row multiplication (join, hot keys only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df_col: Column, n_salts: int) -> Column:
    """Deterministic pseudo-salt in [0, n_salts): hash of a uniform row
    attribute (not rand() — keeps results reproducible and plans
    deterministic for tests)."""
    return F.pmod(F.hash(df_col), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    *,
    count_alias: str = "n_rows",
    sum_col: str | None = None,
    sum_alias: str = "total",
) -> DataFrame:
    """Two-phase (key, salt) → key aggregation of count and an optional
    exact-integer sum column. Phase 1 spreads each hot key over
    ``n_salts`` reducers; phase 2 merges ``n_salts`` partials per key —
    its input is tiny (distinct_keys × n_salts rows)."""
    aggs1 = [F.count(F.lit(1)).alias("_c")]
    aggs2 = [F.sum("_c").cast("long").alias(count_alias)]
    if sum_col is not None:
        aggs1.append(F.sum(sum_col).alias("_s"))
        aggs2.append(F.sum("_s").cast("long").alias(sum_alias))
    phase1 = (
        df.withColumn("_salt", _salt(F.col(salt_from), n_salts))
        .groupBy(key, "_salt")
        .agg(*aggs1)
    )
    return phase1.groupBy(key).agg(*aggs2)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: list,
    salt_from: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join on ``key`` where ``hot_keys`` on the LEFT are
    pathologically frequent: left rows get a salt (hot keys only —
    others salt 0), right rows with hot keys are replicated across all
    salts. Join key becomes (key, salt); result rows are identical to
    the plain join."""
    is_hot_l = F.col(key).isin(hot_keys)
    l_salted = left.withColumn(
        "_salt",
        F.when(is_hot_l, _salt(F.col(salt_from), n_salts)).otherwise(F.lit(0)),
    )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    is_hot_r = F.col(key).isin(hot_keys)
    r_salted = right.withColumn(
        "_salt",
        F.explode(F.when(is_hot_r, salts).otherwise(F.array(F.lit(0)))),
    )
    return l_salted.join(r_salted, [key, "_salt"], "inner").drop("_salt")
