"""The local twin of the driver's correctness gate: run every catalog
query on Spark AND its oracle SQL on DuckDB over the same parquet
tables, then compare row count + order-insensitive canonical values.

Exact comparison, no tolerance — the catalog is engineered so that
every output value is bit-identical across engines (integer-cents
aggregation, polynomial hashing, quantized cosine; see plans/catalog.py).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pytest

from duckdb_redis_olap_scanner_spark.engine import TABLES
from duckdb_redis_olap_scanner_spark.plans.catalog import registry

from .conftest import SF_DIR_ORACLE

ENTRIES = registry()
ORACLE_ENTRIES = sorted(n for n, e in ENTRIES.items() if e.oracle is not None)
ROWS_ONLY_ENTRIES = sorted(n for n, e in ENTRIES.items() if e.oracle is None)


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return str(v)


def _canon_rows(df) -> list[tuple[str, ...]]:
    """Pandas DataFrame → sorted list of canonical row tuples, with
    columns ordered by name (as the driver's compare does)."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        canon = []
        for v in row:
            if v is not None and not isinstance(v, (str, bytes)):
                try:
                    if isinstance(v, float) and math.isnan(v):
                        v = None
                    elif hasattr(v, "item") and np.ndim(v) == 0:
                        if isinstance(v, np.floating) and np.isnan(v):
                            v = None
                        else:
                            v = v.item()
                except (TypeError, ValueError):
                    pass
            if v is pd_NaT:
                v = None
            canon.append(_canon_cell(v))
        out.append(tuple(canon))
    out.sort()
    return out


import pandas as pd  # noqa: E402

pd_NaT = pd.NaT


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


@pytest.mark.parametrize("name", ORACLE_ENTRIES)
def test_oracle_hash_match(name, spark):
    e = ENTRIES[name]
    sdf = e.fn(spark, SF_DIR_ORACLE).toPandas()
    con = _duck_con(SF_DIR_ORACLE)
    odf = con.execute(e.oracle).fetchdf()
    con.close()

    assert len(sdf) == len(odf), (
        f"{name}: row count mismatch spark={len(sdf)} duckdb={len(odf)}"
    )
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    srows, orows = _canon_rows(sdf), _canon_rows(odf)
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ][:5]
    assert srows == orows, f"{name}: value mismatch, first diffs: {mism}"


@pytest.mark.parametrize("name", ROWS_ONLY_ENTRIES)
def test_rows_only_entries_run(name, spark):
    e = ENTRIES[name]
    df = e.fn(spark, SF_DIR_ORACLE)
    assert df.count() >= 0  # runs and has a stable schema
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    qs, os_ = se.queries(), se.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40


# Cross-scale parity: the driver gate runs at sf0.01; re-run the
# pipeline/temporal entries (the families with empty groups, ties, and
# spine generation that can behave scale-dependently) at sf0.001 too,
# so a bug that cancels at one scale still surfaces.
from .conftest import SF_DIR as SF_DIR_SMALL  # noqa: E402

CROSS_SCALE_ENTRIES = sorted(
    n
    for n, e in ENTRIES.items()
    if e.oracle is not None
    and {"pipeline", "temporal", "dedup", "text"} & set(e.tags)
)


@pytest.mark.parametrize("name", CROSS_SCALE_ENTRIES)
def test_oracle_hash_match_small_sf(name, spark):
    e = ENTRIES[name]
    sdf = e.fn(spark, SF_DIR_SMALL).toPandas()
    con = _duck_con(SF_DIR_SMALL)
    odf = con.execute(e.oracle).fetchdf()
    con.close()
    assert len(sdf) == len(odf), (
        f"{name}@{SF_DIR_SMALL}: rows {len(sdf)} vs {len(odf)}"
    )
    assert sorted(sdf.columns) == sorted(odf.columns), name
    srows, orows = _canon_rows(sdf), _canon_rows(odf)
    assert srows == orows, f"{name}@{SF_DIR_SMALL}: value mismatch"
