"""Dependency-free Parquet footer walk (r20 capability stretch).

The engine's own storage format, read at the byte level: the PAR1
magic framing, the little-endian footer length, and a from-scratch
Apache Thrift COMPACT-protocol reader (varint/zigzag integers,
delta-encoded field ids, size-prefixed binaries, nested structs and
lists — the full wire grammar parquet-format's FileMetaData needs),
interpreted against parquet.thrift's field numbering: schema
elements, row groups, column chunks, column metadata, and the
writer-recorded Statistics (min/max/null_count).

Why it matters for an OLAP engine: row-group statistics ARE the
pruning machinery — `PushedFilters` work because scans trust these
bytes. The entry built on this module cross-checks the
writer-recorded stats against the data itself (the oracle recomputes
min/max/null_count from the table), so a footer mis-parse OR a
stats-corrupting writer cannot hash-match.

Scale note: a footer reader at 100 TB issues RANGE reads (the last
``footer_len + 8`` bytes of each file); the Spark-side plumbing here
feeds whole blobs through ``binaryFile`` because that source has no
range pushdown — the parse itself touches only the footer slice.

Reference parity note: the reference engine delegates parquet to host
DuckDB; this module is beyond-reference surface (format-level
auditing of the engine's own storage).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_footer",
    "footer_column_stats",
    "parquet_footer_stats",
]

# thrift compact protocol element types
_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        out = shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ValueError("malformed varint in footer")

    def zigzag(self) -> int:
        n = self.varint()
        return (n >> 1) ^ -(n & 1)

    def binary(self) -> bytes:
        n = self.varint()
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated binary in footer")
        self.pos += n
        return out

    def value(self, ctype: int):
        if ctype == _CT_TRUE:
            return True
        if ctype == _CT_FALSE:
            return False
        if ctype == _CT_BYTE:
            (v,) = struct.unpack_from("b", self.buf, self.pos)
            self.pos += 1
            return v
        if ctype in (_CT_I16, _CT_I32, _CT_I64):
            return self.zigzag()
        if ctype == _CT_DOUBLE:
            (v,) = struct.unpack_from("<d", self.buf, self.pos)
            self.pos += 8
            return v
        if ctype == _CT_BINARY:
            return self.binary()
        if ctype in (_CT_LIST, _CT_SET):
            return self.list_()
        if ctype == _CT_STRUCT:
            return self.struct_()
        raise ValueError(f"unsupported thrift compact type {ctype}")

    def list_(self) -> list:
        head = self.byte()
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = self.varint()
        if etype in (_CT_TRUE, _CT_FALSE):
            # bools in lists are one byte each: 1 = true
            return [self.byte() == 1 for _ in range(size)]
        return [self.value(etype) for _ in range(size)]

    def struct_(self) -> dict:
        out: dict[int, object] = {}
        fid = 0
        while True:
            head = self.byte()
            if head == _CT_STOP:
                return out
            delta = head >> 4
            ctype = head & 0x0F
            fid = fid + delta if delta else self.zigzag()
            out[fid] = self.value(ctype)


_PHYSICAL = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}
_CODEC = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO", 4: "BROTLI",
    5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}


def parse_footer(payload: bytes) -> dict:
    """Parse a whole parquet file's footer: verify both PAR1 magics,
    slice the footer by its recorded length, thrift-decode
    FileMetaData, and interpret the parquet.thrift field numbers.

    Returns {version, num_rows, created_by, columns: [name...],
    row_groups: [{num_rows, columns: [{path, type, codec, num_values,
    stats: {min, max, null_count} | None}]}]}. Stat values are decoded
    per physical type (INT32/INT64 little-endian two's-complement,
    DOUBLE little-endian IEEE, BYTE_ARRAY utf-8)."""
    if payload[:4] != b"PAR1" or payload[-4:] != b"PAR1":
        raise ValueError("not a parquet file (missing PAR1 magic)")
    (flen,) = struct.unpack_from("<I", payload, len(payload) - 8)
    start = len(payload) - 8 - flen
    if start < 4:
        raise ValueError(f"footer length {flen} overruns the file")
    meta = _Reader(payload, start).struct_()
    schema = meta.get(2) or []
    # leaf column names in schema order (root element carries
    # num_children and no type; leaves carry a physical type)
    leaves = [
        el[4].decode("utf-8")
        for el in schema
        if isinstance(el, dict) and 1 in el
    ]
    row_groups = []
    for rg in meta.get(4) or []:
        cols = []
        for cc in rg.get(1) or []:
            cm = cc.get(3)
            if cm is None:
                raise ValueError("column chunk without metadata")
            ptype = _PHYSICAL.get(cm[1], str(cm[1]))
            stats_raw = cm.get(12)
            stats = None
            if stats_raw is not None:
                # prefer the modern min_value/max_value (5/6) over the
                # deprecated min/max (1/2)
                raw_min = stats_raw.get(6, stats_raw.get(2))
                raw_max = stats_raw.get(5, stats_raw.get(1))
                stats = {
                    "min": _decode_stat(raw_min, ptype),
                    "max": _decode_stat(raw_max, ptype),
                    "null_count": stats_raw.get(3),
                }
            cols.append(
                {
                    "path": b".".join(cm[3]).decode("utf-8"),
                    "type": ptype,
                    "codec": _CODEC.get(cm[4], str(cm[4])),
                    "num_values": cm[5],
                    "stats": stats,
                }
            )
        row_groups.append({"num_rows": rg.get(3), "columns": cols})
    return {
        "version": meta.get(1),
        "num_rows": meta.get(3),
        "created_by": (meta.get(6) or b"").decode("utf-8"),
        "columns": leaves,
        "row_groups": row_groups,
    }


def _decode_stat(raw: bytes | None, ptype: str):
    if raw is None:
        return None
    if ptype == "INT32":
        return struct.unpack("<i", raw)[0]
    if ptype == "INT64":
        return struct.unpack("<q", raw)[0]
    if ptype == "DOUBLE":
        return struct.unpack("<d", raw)[0]
    if ptype == "FLOAT":
        return struct.unpack("<f", raw)[0]
    if ptype == "BYTE_ARRAY":
        return raw.decode("utf-8")
    return raw.hex()


def footer_column_stats(payload: bytes, columns: list) -> list:
    """Aggregate the writer-recorded per-row-group statistics of the
    requested leaf columns across the file: (col, physical type,
    n_row_groups, num_values, null_count, min, max as strings).
    Raises if a requested column lacks statistics — an auditing
    entry must not silently report nothing."""
    meta = parse_footer(payload)
    out = []
    for name in columns:
        n_rg = num_values = null_count = 0
        mins: list = []
        maxs: list = []
        ptype = None
        for rg in meta["row_groups"]:
            for col in rg["columns"]:
                if col["path"] != name:
                    continue
                if col["stats"] is None or col["stats"]["min"] is None:
                    raise ValueError(
                        f"column {name!r} has no statistics in a "
                        "row group — cannot audit"
                    )
                ptype = col["type"]
                n_rg += 1
                num_values += col["num_values"]
                null_count += col["stats"]["null_count"] or 0
                mins.append(col["stats"]["min"])
                maxs.append(col["stats"]["max"])
        if not n_rg:
            raise ValueError(f"column {name!r} not found in the footer")
        out.append(
            (
                name, ptype, n_rg, num_values, null_count,
                str(min(mins)), str(max(maxs)),
            )
        )
    return out


PARQUET_FOOTER_SCHEMA = (
    "col string, physical_type string, n_row_groups int, "
    "num_values long, null_count long, min_val string, max_val string"
)

PARQUET_AUDIT_COLUMNS = ["doc_id", "lang", "source"]


def parquet_footer_stats(
    spark, sf_dir: str, table_name: str = "documents",
    columns: list = PARQUET_AUDIT_COLUMNS,
) -> DataFrame:
    """Audit a table's parquet footers with the from-scratch parser:
    read the file(s) as binary blobs, parse each footer in an Arrow
    map, and emit the writer-recorded per-column statistics summed
    over files and row groups. Compared against the data itself (the
    entry's oracle recomputes min/max/null_count from the table), this
    pins BOTH the thrift/footer parse and the writer's statistics —
    the bytes every pruned scan trusts. Only short, non-truncatable
    columns are audited (writers may truncate long BYTE_ARRAY stats,
    which would be a false mismatch, not a parse bug)."""
    from ..engine import ship_package

    files = (
        spark.read.format("binaryFile")
        .load(sf_dir + f"/{table_name}.parquet")
        .select(F.col("content").alias("payload"))
    )

    def _run(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["col", "physical_type", "n_row_groups", "num_values",
                "null_count", "min_val", "max_val"]
        for pdf in batch_iter:
            rows = []
            for payload in pdf["payload"]:
                rows.extend(footer_column_stats(bytes(payload), columns))
            out = pd.DataFrame(rows, columns=cols)
            for c in ("num_values", "null_count"):
                out[c] = out[c].astype("int64")
            out["n_row_groups"] = out["n_row_groups"].astype("int32")
            yield out

    ship_package(spark)
    per_file = files.mapInPandas(_run, schema=PARQUET_FOOTER_SCHEMA)
    # one table may span many files: re-aggregate (min of mins is the
    # min as strings ONLY for same-width values; doc_id is numeric, so
    # compare after casting when the physical type is numeric)
    return (
        per_file.groupBy("col", "physical_type")
        .agg(
            F.sum("n_row_groups").cast("int").alias("n_row_groups"),
            F.sum("num_values").alias("num_values"),
            F.sum("null_count").alias("null_count"),
            # try_cast, not cast: both WHEN branches' aggregates are
            # evaluated for every group, so a plain cast would throw
            # on the string columns' values
            F.when(
                F.first("physical_type").isin("INT32", "INT64"),
                F.min(F.col("min_val").try_cast("long")).cast("string"),
            ).otherwise(F.min("min_val")).alias("min_val"),
            F.when(
                F.first("physical_type").isin("INT32", "INT64"),
                F.max(F.col("max_val").try_cast("long")).cast("string"),
            ).otherwise(F.max("max_val")).alias("max_val"),
        )
    )
