"""From-scratch DEFLATE/zlib inflater (r20 capability, QUEUED entry
``deflate_corpus_audit`` in plans/queued_entries_r21.py).

Pins: cross-implementation round trips against stdlib zlib (the
independent producer) over every block type — level 0 stored blocks,
fixed Huffman, dynamic Huffman — and every wrapper, a hypothesis
sweep, multi-block streams, overlapping LZ77 copies (the RLE case),
strict rejection of malformed streams, corruption fuzz, the Spark
audit stage, and the driver gate's comparison (Spark vs DuckDB
oracle at sf0.001).
"""

from __future__ import annotations

import random
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_redis_olap_scanner_spark.operators.inflate import (
    deflate_audit,
    inflate,
    inflate_zlib,
)

from .conftest import SF_DIR


def _raw(data: bytes, level: int = 6) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


_CASES = [
    b"",
    b"a",
    b"hello world " * 200,
    bytes(range(256)) * 8,
    bytes(4096),  # long zero run: overlapping distance-1 copies
    "日本語テキスト — ünïcode ".encode("utf-8") * 64,
]


@pytest.mark.parametrize("level", [0, 1, 6, 9])
@pytest.mark.parametrize("i", range(len(_CASES)))
def test_round_trip_every_level_and_wrapper(level, i):
    data = _CASES[i]
    assert inflate(_raw(data, level)) == data
    assert inflate_zlib(zlib.compress(data, level)) == data


def test_incompressible_payload_round_trips():
    rng = random.Random(31)
    data = bytes(rng.randrange(256) for _ in range(20_000))
    for level in (0, 1, 9):
        assert inflate(_raw(data, level)) == data


def test_multi_block_stream():
    """Flushing mid-stream forces multiple deflate blocks; the walk
    must continue across non-final block boundaries."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    parts = [b"first block " * 50, b"\x00" * 999, b"tail"]
    raw = b"".join(co.compress(p) + co.flush(zlib.Z_FULL_FLUSH) for p in parts)
    raw += co.flush()
    assert inflate(raw) == b"".join(parts)


@settings(max_examples=120, deadline=None)
@given(
    data=st.binary(max_size=3000),
    level=st.integers(min_value=0, max_value=9),
)
def test_hypothesis_round_trip(data, level):
    assert inflate(_raw(data, level)) == data
    assert inflate_zlib(zlib.compress(data, level)) == data


def test_stored_block_len_lie_rejected():
    raw = bytearray(_raw(b"stored please", 0))
    # stored block: 1 header byte, then LEN little-endian
    raw[1] ^= 0x01
    with pytest.raises(ValueError, match="LEN/NLEN|truncated"):
        inflate(bytes(raw))


def test_reserved_block_type_rejected():
    with pytest.raises(ValueError, match="reserved"):
        inflate(b"\x07")


def test_truncated_stream_rejected():
    raw = _raw(b"cut me off " * 30)
    with pytest.raises(ValueError, match="truncated|invalid"):
        inflate(raw[: len(raw) // 2])


def test_distance_behind_start_rejected():
    """Fixed-Huffman block whose first symbol is a length/distance
    pair: there is no prior output to copy from."""
    # bits: BFINAL=1, BTYPE=01, then literal/length code 257 (len 3,
    # 7-bit code 0000001 MSB-first) and distance code 0 (00000)
    bits = [1, 1, 0] + [0, 0, 0, 0, 0, 0, 1] + [0, 0, 0, 0, 0]
    buf = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        buf[i >> 3] |= b << (i & 7)
    with pytest.raises(ValueError, match="behind start"):
        inflate(bytes(buf))


def test_zlib_wrapper_rejections():
    good = zlib.compress(b"wrapped")
    bad = bytearray(good)
    bad[0] = (bad[0] & 0xF0) | 0x07  # method 7 != deflate
    with pytest.raises(ValueError, match="method|header check"):
        inflate_zlib(bytes(bad))
    bad = bytearray(good)
    bad[1] ^= 0x10  # breaks the %31 header check
    with pytest.raises(ValueError, match="header check"):
        inflate_zlib(bytes(bad))
    bad = bytearray(good)
    bad[-1] ^= 0x01  # Adler-32 trailer
    with pytest.raises(ValueError, match="Adler-32"):
        inflate_zlib(bytes(bad))
    with pytest.raises(ValueError, match="shorter"):
        inflate_zlib(b"\x78\x9c")


def test_oversubscribed_code_set_rejected():
    from duckdb_redis_olap_scanner_spark.operators.inflate import _Huffman

    with pytest.raises(ValueError, match="oversubscribed"):
        _Huffman([1, 1, 1])
    with pytest.raises(ValueError, match="out of range"):
        _Huffman([16])


def test_corruption_fuzz_never_silently_wrong():
    """Any single-bit flip in a compressed stream must either raise
    ValueError or produce different output — never crash with a
    foreign exception. (Raw deflate has no integrity trailer, so some
    flips legitimately decode to different bytes; the zlib wrapper's
    Adler-32 then catches those.)"""
    rng = random.Random(44)
    data = b"fuzz target: structured text with repeats " * 20
    wrapped = zlib.compress(data, 6)
    silent = 0
    for _ in range(250):
        pos = rng.randrange(2, len(wrapped) - 4)  # inside deflate body
        flip = bytearray(wrapped)
        flip[pos] ^= 1 << rng.randrange(8)
        try:
            if inflate_zlib(bytes(flip)) == data:
                silent += 1  # flip landed somewhere truly inert
        except ValueError:
            pass
    assert silent == 0


def test_spark_audit_stage(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(0, "zlib-wrapped doc " * 9), (1, "raw-deflate doc " * 30),
         (2, "gzip-member doc " * 12), (5, ""),
         (13, "level three " * 5)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in deflate_audit(docs).collect()}
    assert rows[0]["wrapper"] == "zlib"
    assert rows[1]["wrapper"] == "raw"
    assert rows[2]["wrapper"] == "gzip"
    assert rows[5]["n_raw"] == 0
    for did, text in (
        (0, "zlib-wrapped doc " * 9),
        (2, "gzip-member doc " * 12),
        (13, "level three " * 5),
    ):
        assert rows[did]["txt_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_queued_entry_matches_duckdb_oracle(spark):
    """The future landing's dry run: the queued entry's Spark query vs
    its DuckDB oracle at sf0.001 — columns, rows, values."""
    import duckdb

    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q

    sdf = Q.deflate_corpus_audit(spark, SF_DIR)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    cur = con.execute(Q.INFLATE_ORACLE)
    assert [d[0] for d in cur.description] == sdf.columns
    assert srows == sorted(tuple(r) for r in cur.fetchall())


def test_gunzip_round_trip_and_header_fields():
    """RFC 1952 members from stdlib gzip (independent writer), plus a
    hand-built header exercising FEXTRA + FCOMMENT + FHCRC — fields
    stdlib's writer never emits together."""
    import gzip
    import io

    from duckdb_redis_olap_scanner_spark.operators.inflate import gunzip

    payload = b"gzip round trip " * 80
    for level in (0, 1, 9):
        buf = io.BytesIO()
        with gzip.GzipFile(
            fileobj=buf, mode="wb", compresslevel=level, filename="doc.txt"
        ) as g:
            g.write(payload)
        assert gunzip(buf.getvalue()) == payload
    assert gunzip(gzip.compress(b"", 6)) == b""

    # hand-built: FLG = FHCRC|FEXTRA|FNAME|FCOMMENT
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(payload) + co.flush()
    header = bytearray(b"\x1f\x8b\x08" + bytes([0x02 | 0x04 | 0x08 | 0x10]))
    header += bytes(6)  # mtime, XFL, OS
    header += (4).to_bytes(2, "little") + b"xtra"      # FEXTRA
    header += b"name.bin\x00"                          # FNAME
    header += b"a comment\x00"                         # FCOMMENT
    header += (zlib.crc32(bytes(header)) & 0xFFFF).to_bytes(2, "little")
    member = (
        bytes(header) + body
        + (zlib.crc32(payload) & 0xFFFFFFFF).to_bytes(4, "little")
        + (len(payload) & 0xFFFFFFFF).to_bytes(4, "little")
    )
    assert gunzip(member) == payload
    # header CRC16 lie
    bad = bytearray(member)
    bad[len(header) - 2] ^= 0xFF
    with pytest.raises(ValueError, match="header CRC16"):
        gunzip(bytes(bad))


def test_gunzip_rejections():
    import gzip

    from duckdb_redis_olap_scanner_spark.operators.inflate import gunzip

    good = gzip.compress(b"reject tests " * 10, 6)
    with pytest.raises(ValueError, match="magic"):
        gunzip(b"PK" + good[2:])
    bad = bytearray(good)
    bad[2] = 7
    with pytest.raises(ValueError, match="method"):
        gunzip(bytes(bad))
    bad = bytearray(good)
    bad[3] |= 0x80
    with pytest.raises(ValueError, match="reserved"):
        gunzip(bytes(bad))
    bad = bytearray(good)
    bad[-6] ^= 0x01  # CRC-32 trailer
    with pytest.raises(ValueError, match="CRC-32"):
        gunzip(bytes(bad))
    bad = bytearray(good)
    bad[-1] ^= 0x01  # ISIZE trailer
    with pytest.raises(ValueError, match="ISIZE"):
        gunzip(bytes(bad))
    with pytest.raises(ValueError, match="shorter"):
        gunzip(good[:10])


def test_png_idat_inflates_identically_through_both_implementations():
    """The PNG encoder's zlib-wrapped IDAT stream decoded by the
    from-scratch inflater must equal stdlib zlib's decode — tying the
    codec family's remaining library hop to the audited path."""
    from duckdb_redis_olap_scanner_spark.operators.inflate import inflate_zlib
    from duckdb_redis_olap_scanner_spark.operators.multimodal import (
        encode_png_payload,
    )

    payload = encode_png_payload(11)
    # concatenate IDAT chunk payloads (PNG spec: one zlib stream)
    pos, idat = 8, bytearray()
    while pos < len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    assert idat
    assert inflate_zlib(bytes(idat)) == zlib.decompress(bytes(idat))
