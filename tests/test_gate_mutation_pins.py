"""Mutation-sanity pins for the oracle-parity gate (VERDICT r17 #4).

The 222-entry correctness claim rests on the canonical compare in
tests/test_oracle_parity.py (the local twin of the driver's
CORRECTNESS gate). r17 proved the CODEC audits detect corrupted
payloads; these pins prove the relational comparator itself has teeth
on each of its three paths — a seeded defect in a COPY of a plan must
make the corresponding assert fail:

* value-hash path — a ``<`` → ``<=`` comparison flip in a q6 twin
  (1,214 extra lineitem rows at sf0.01 flow into the aggregate) and a
  single off-by-one cent in one q1 cell both keep row count and schema
  identical, so ONLY the canonical-value compare can catch them;
* rows path — a dropped group;
* schema path — a renamed aggregate column;
* NULL canonicalization — NULL is '∅', never conflatable with 0 or ''.

Each pin runs the REAL oracle SQL against the mutant Spark twin
through the same canonicalization helpers the gate uses, so a future
comparator change that silently weakens any path fails here first.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.plans.catalog import registry, table
from duckdb_redis_olap_scanner_spark.plans.relational import _cents

from .conftest import SF_DIR_ORACLE
from .test_oracle_parity import _canon_rows, _duck_con

ENTRIES = registry()


def _gate_compare(sdf, odf) -> None:
    """The exact three asserts of test_oracle_hash_match, in order."""
    assert len(sdf) == len(odf), "rows"
    assert sorted(sdf.columns) == sorted(odf.columns), "schema"
    assert _canon_rows(sdf) == _canon_rows(odf), "values"


def _oracle_df(name: str):
    con = _duck_con(SF_DIR_ORACLE)
    try:
        return con.execute(ENTRIES[name].oracle).fetchdf()
    finally:
        con.close()


def _assert_fails_with(marker: str, sdf, odf) -> None:
    with pytest.raises(AssertionError) as ei:
        _gate_compare(sdf, odf)
    assert marker in str(ei.value), (
        f"expected the {marker!r} path to fire, got: {ei.value}"
    )


def test_value_path_catches_comparison_flip(spark):
    """q6 twin with l_quantity < 24 flipped to <= 24: row count (1) and
    schema are unchanged, so the seeded boundary bug is invisible to
    the first two asserts — the canonical-value compare MUST fail."""
    li = table(spark, SF_DIR_ORACLE, "lineitem")
    mutant = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") <= 24.0)  # seeded: < became <=
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .toPandas()
    )
    odf = _oracle_df("q6_forecast_revenue")
    assert len(mutant) == len(odf) == 1  # the bug is value-only
    _assert_fails_with("values", mutant, odf)
    # and the unmutated plan passes the same compare
    _gate_compare(
        ENTRIES["q6_forecast_revenue"].fn(spark, SF_DIR_ORACLE).toPandas(), odf
    )


def test_value_path_catches_one_cent(spark):
    """A single +1 cent in ONE cell of q1's 4-group result: exact
    integer-cents comparison means even the smallest representable
    error fails the gate — there is no tolerance to hide inside."""
    sdf = ENTRIES["q1_pricing_summary"].fn(spark, SF_DIR_ORACLE).toPandas()
    odf = _oracle_df("q1_pricing_summary")
    _gate_compare(sdf, odf)  # clean twin passes
    mutant = sdf.copy()
    mutant.loc[0, "sum_qty_cents"] += 1
    _assert_fails_with("values", mutant, odf)


def test_rows_path_catches_dropped_group(spark):
    """One dropped result group must fail the FIRST assert (row count)
    before any value hashing happens."""
    sdf = ENTRIES["q1_pricing_summary"].fn(spark, SF_DIR_ORACLE).toPandas()
    odf = _oracle_df("q1_pricing_summary")
    assert len(sdf) >= 2
    _assert_fails_with("rows", sdf.iloc[:-1], odf)


def test_schema_path_catches_renamed_column(spark):
    """A renamed aggregate column (the alias-mismatch failure mode the
    driver contract warns about) must fail the schema assert even when
    every value is identical."""
    sdf = ENTRIES["q1_pricing_summary"].fn(spark, SF_DIR_ORACLE).toPandas()
    odf = _oracle_df("q1_pricing_summary")
    mutant = sdf.rename(columns={"sum_qty_cents": "sum_qty"})
    _assert_fails_with("schema", mutant, odf)


def test_value_path_distinguishes_null_from_zero(spark):
    """NULL canonicalizes to '∅', never to '0' or '': a twin that
    coalesces a NULL-able cell to 0 must mismatch. Uses q1 with one
    cell NULLed on the Spark side vs the oracle's real value."""
    sdf = ENTRIES["q1_pricing_summary"].fn(spark, SF_DIR_ORACLE).toPandas()
    odf = _oracle_df("q1_pricing_summary")
    mutant = sdf.copy()
    mutant["count_order"] = mutant["count_order"].astype("object")
    mutant.loc[0, "count_order"] = None
    _assert_fails_with("values", mutant, odf)
    # sanity on the canonical cell forms themselves
    from .test_oracle_parity import _canon_cell

    assert _canon_cell(None) == "∅"
    assert _canon_cell(0) == "0"
    assert _canon_cell("") not in ("∅", "0")
