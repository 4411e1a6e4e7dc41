"""From-scratch parquet footer walk (r20 capability, QUEUED entry
``parquet_footer_audit`` in plans/queued_entries_r21.py).

Pins: the thrift compact-protocol reader against real parquet-cpp
footers (every testdata table), stat-value decoding per physical
type, strict rejection (bad magic, overrunning footer length,
malformed varints), round-trip against a DIFFERENT writer config
(pyarrow with small row groups → multi-row-group aggregation), and
the driver gate's comparison (Spark vs DuckDB oracle at sf0.001).
"""

from __future__ import annotations

import glob
import os

import pytest

from duckdb_redis_olap_scanner_spark.operators import parquet_meta as P

from .conftest import SF_DIR

TABLES = sorted(
    os.path.basename(p)[:-8]
    for p in glob.glob(f"{SF_DIR}/*.parquet")
)


@pytest.mark.parametrize("table", TABLES)
def test_footer_matches_pyarrow_everywhere(table):
    """Every column chunk of every testdata table: num_values,
    null_count, min, max from the from-scratch parse must equal what
    pyarrow's independent C++ reader reports."""
    import pyarrow.parquet as pq

    path = f"{SF_DIR}/{table}.parquet"
    payload = open(path, "rb").read()
    got = P.parse_footer(payload)
    md = pq.ParquetFile(path).metadata
    assert got["num_rows"] == md.num_rows
    assert len(got["row_groups"]) == md.num_row_groups
    for ri, rg in enumerate(got["row_groups"]):
        prg = md.row_group(ri)
        assert rg["num_rows"] == prg.num_rows
        assert len(rg["columns"]) == prg.num_columns
        for ci, col in enumerate(rg["columns"]):
            pc = prg.column(ci)
            assert col["path"] == pc.path_in_schema
            assert col["type"] == pc.physical_type
            assert col["num_values"] == pc.num_values
            st = pc.statistics
            if st is None or not st.has_min_max:
                continue
            assert col["stats"] is not None, col["path"]
            assert col["stats"]["null_count"] == st.null_count
            got_min, got_max = col["stats"]["min"], col["stats"]["max"]
            # compare PHYSICAL values: pyarrow converts logical types
            # (timestamps -> datetime); min_raw/max_raw stay physical
            want_min, want_max = st.min_raw, st.max_raw
            if col["type"] == "BYTE_ARRAY" and isinstance(want_min, bytes):
                want_min = want_min.decode("utf-8")
                want_max = want_max.decode("utf-8")
            if col["type"] in ("FLOAT", "DOUBLE"):
                assert abs(got_min - want_min) < 1e-9
                assert abs(got_max - want_max) < 1e-9
            else:
                assert (got_min, got_max) == (want_min, want_max), col["path"]


def test_multi_row_group_file_aggregates(tmp_path):
    """A file written with tiny row groups (a DIFFERENT writer config
    than the testdata) must parse into several row groups whose
    aggregated stats equal the column's true extremes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"k": list(range(1000)), "s": [f"v{i:04d}" for i in range(1000)]})
    path = str(tmp_path / "multi.parquet")
    pq.write_table(t, path, row_group_size=100)
    payload = open(path, "rb").read()
    meta = P.parse_footer(payload)
    assert len(meta["row_groups"]) == 10
    stats = P.footer_column_stats(payload, ["k", "s"])
    assert stats[0] == ("k", "INT64", 10, 1000, 0, "0", "999")
    assert stats[1] == ("s", "BYTE_ARRAY", 10, 1000, 0, "v0000", "v0999")


def test_nullable_column_null_count(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"x": [1, None, 3, None, 5]})
    path = str(tmp_path / "nulls.parquet")
    pq.write_table(t, path)
    stats = P.footer_column_stats(open(path, "rb").read(), ["x"])
    assert stats == [("x", "INT64", 1, 5, 2, "1", "5")]


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="PAR1"):
        P.parse_footer(b"RIFF" + bytes(100) + b"PAR1")
    with pytest.raises(ValueError, match="PAR1"):
        P.parse_footer(b"PAR1" + bytes(100))


def test_footer_length_overrun_rejected():
    import struct

    payload = open(f"{SF_DIR}/documents.parquet", "rb").read()
    bad = bytearray(payload)
    struct.pack_into("<I", bad, len(bad) - 8, len(bad))
    with pytest.raises(ValueError, match="overruns"):
        P.parse_footer(bytes(bad))


def test_missing_stats_is_loud(tmp_path):
    """A column written WITHOUT statistics must make the audit raise,
    not silently report nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"x": [1, 2, 3]})
    path = str(tmp_path / "nostats.parquet")
    pq.write_table(t, path, write_statistics=False)
    with pytest.raises(ValueError, match="no statistics"):
        P.footer_column_stats(open(path, "rb").read(), ["x"])
    with pytest.raises(ValueError, match="not found"):
        P.footer_column_stats(
            open(f"{SF_DIR}/documents.parquet", "rb").read(), ["nope"]
        )


def test_queued_entry_matches_duckdb_oracle(spark):
    import duckdb

    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q

    sdf = Q.parquet_footer_audit(spark, SF_DIR)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    cur = con.execute(Q.PARQUET_ORACLE)
    assert [d[0] for d in cur.description] == sdf.columns
    assert srows == sorted(tuple(r) for r in cur.fetchall())
