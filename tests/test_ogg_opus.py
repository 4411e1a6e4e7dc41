"""Ogg/Opus container walk (r20 capability, QUEUED entry
``multimodal_ogg_opus_walk`` in plans/queued_entries_r21.py).

Pins: the RFC 3533 CRC (known vectors + self-consistency), page
framing and lacing round trips, continued-packet reassembly, strict
rejection (CRC corruption, sequence gaps, dangling continuations,
malformed headers), queue inertness, and the driver gate's comparison
(Spark vs DuckDB oracle at sf0.001) run locally so a future landing
is purely mechanical.
"""

from __future__ import annotations

import struct

import pytest

from duckdb_redis_olap_scanner_spark.operators import ogg as O

from .conftest import SF_DIR


def test_crc_is_the_ogg_polynomial_not_zlib():
    """CRC must be the unreflected 0x04C11DB7 with zero init/xorout —
    distinct from zlib's reflected CRC-32 on any non-trivial input."""
    import zlib

    data = b"OggS\x00\x02" + bytes(range(40))
    assert O.ogg_crc(data) != zlib.crc32(data)
    # known property: CRC of empty input is 0 for this parameterization
    assert O.ogg_crc(b"") == 0
    # bytewise check against a bit-at-a-time reference implementation
    ref = 0
    for byte in data:
        ref ^= byte << 24
        for _ in range(8):
            ref = ((ref << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if ref & 0x80000000 \
                else ((ref << 1) & 0xFFFFFFFF)
    assert O.ogg_crc(data) == ref


def closed_form_stats(d: int) -> dict:
    n_pkt = 3 + d % 5
    lens = [
        (256 + (d * 3) % 244) if p == 1 else (180 + (d + p * 37) % 300)
        for p in range(n_pkt)
    ]
    audio = b"".join(
        bytes((d * 5 + p * 17 + j * 29) % 256 for j in range(lens[p]))
        for p in range(n_pkt)
    )
    return {
        "serial": 0x5347 + d,
        "n_pages": 3 + n_pkt,
        "n_packets": n_pkt,
        "channels": 1 + d % 2,
        "pre_skip": 312 + d % 100,
        "vendor_len": len(O.OGG_VENDOR),
        "n_comments": 1,
        "audio_bytes": sum(lens),
        "audio_checksum": sum((g + 1) * b for g, b in enumerate(audio)),
        "last_granule": O.OGG_SAMPLES_PER_PACKET * n_pkt,
    }


@pytest.mark.parametrize("d", [0, 1, 2, 3, 4, 7, 11, 97, 509])
def test_roundtrip_matches_closed_form(d):
    assert O.decode_ogg_opus(O.encode_ogg_opus_payload(d)) == \
        closed_form_stats(d)


def test_split_packet_really_spans_two_pages():
    """Structural pin: the payload must contain a page whose last
    lacing value is 255 (unterminated) followed by a page with the
    continued-packet flag — the shape the decoder's reassembly is
    for."""
    payload = O.encode_ogg_opus_payload(5)
    pos, flags, last_lace = 0, [], []
    while pos < len(payload):
        n_seg = payload[pos + 26]
        lacing = payload[pos + 27 : pos + 27 + n_seg]
        flags.append(payload[pos + 5])
        last_lace.append(lacing[-1] if lacing else 0)
        pos += 27 + n_seg + sum(lacing)
    joints = [
        i for i in range(len(flags) - 1)
        if last_lace[i] == 255 and flags[i + 1] & 0x01
    ]
    assert joints, "no continuation joint found"
    # and granule of the unterminated page is -1 per RFC 3533
    pos = 0
    for i in range(joints[0]):
        n_seg = payload[pos + 26]
        pos += 27 + n_seg + sum(payload[pos + 27 : pos + 27 + n_seg])
    (granule,) = struct.unpack_from("<q", payload, pos + 6)
    assert granule == -1


def test_corrupt_page_body_trips_crc():
    payload = bytearray(O.encode_ogg_opus_payload(3))
    payload[-1] ^= 0x01  # last audio byte of the last page
    with pytest.raises(ValueError, match="CRC"):
        O.decode_ogg_opus(bytes(payload))


def test_page_removal_trips_sequence_check():
    """Dropping a whole (valid) page must fail the sequence check —
    page CRCs alone cannot see a missing page."""
    payload = O.encode_ogg_opus_payload(3)
    # find the second page's span
    n_seg0 = payload[26]
    p1 = 27 + n_seg0 + sum(payload[27 : 27 + n_seg0])
    n_seg1 = payload[p1 + 26]
    p2 = p1 + 27 + n_seg1 + sum(payload[p1 + 27 : p1 + 27 + n_seg1])
    with pytest.raises(ValueError, match="sequence"):
        O.decode_ogg_opus(payload[:p1] + payload[p2:])


def test_dangling_continuation_rejected():
    """Truncating the stream right after the unterminated page leaves
    an open packet — must raise, not silently flush."""
    payload = O.encode_ogg_opus_payload(5)
    pos, spans = 0, []
    while pos < len(payload):
        n_seg = payload[pos + 26]
        lacing = payload[pos + 27 : pos + 27 + n_seg]
        end = pos + 27 + n_seg + sum(lacing)
        spans.append((pos, end, lacing[-1] if lacing else 0))
        pos = end
    cut = next(end for _, end, ll in spans if ll == 255)
    with pytest.raises(ValueError, match="continued packet"):
        O.decode_ogg_opus(payload[:cut])


def test_not_ogg_rejected():
    with pytest.raises(ValueError, match="capture pattern"):
        O.decode_ogg_opus(b"RIFF" + bytes(60))


def test_non_opus_first_packet_rejected():
    """Replace OpusHead magic in page 0 (re-CRC'd so the container
    layer passes): the Opus layer must refuse."""
    payload = bytearray(O.encode_ogg_opus_payload(2))
    at = bytes(payload).index(b"OpusHead")
    payload[at : at + 8] = b"NotOpus!"
    # recompute page 0's CRC
    n_seg = payload[26]
    end = 27 + n_seg + sum(payload[27 : 27 + n_seg])
    page = bytearray(payload[:end])
    page[22:26] = b"\x00\x00\x00\x00"
    payload[22:26] = struct.pack("<I", O.ogg_crc(bytes(page)))
    with pytest.raises(ValueError, match="OpusHead"):
        O.decode_ogg_opus(bytes(payload))


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_roundtrip_property_any_doc_id(d):
    assert O.decode_ogg_opus(O.encode_ogg_opus_payload(d)) == \
        closed_form_stats(d)


def test_corruption_never_hangs_and_is_mostly_detected():
    """The codec-fuzz pin: deterministic truncations and bit/byte
    flips terminate promptly and are detected for most mutations."""
    import random

    ok = bad = 0
    for doc_id in (3, 7):
        payload = O.encode_ogg_opus_payload(doc_id)
        rng = random.Random(263 + doc_id)
        for _ in range(40):
            kind = rng.randrange(3)
            if kind == 0 and len(payload) > 4:
                mut = payload[: rng.randrange(4, len(payload))]
            else:
                i = rng.randrange(len(payload))
                b = bytearray(payload)
                if kind == 1:
                    b[i] ^= 1 << rng.randrange(8)
                else:
                    b[i] = rng.randrange(256)
                mut = bytes(b)
            try:
                O.decode_ogg_opus(mut)
                ok += 1
            except (ValueError, struct.error):
                bad += 1
    # the page CRC covers every byte: detection should be near-total
    assert bad > ok


def test_register_queued_is_idempotent_and_inert_until_called():
    """Importing the queued module must NOT register (the point of
    queuing); register_queued() registers exactly once. Subprocess so
    THIS process's registry stays agreed with the coverage scripts."""
    import os
    import subprocess
    import sys

    code = (
        "from duckdb_redis_olap_scanner_spark.plans import "
        "queued_entries_r21 as Q\n"
        "from duckdb_redis_olap_scanner_spark.plans.catalog import "
        "_REGISTRY, registry\n"
        "n0 = len(registry())\n"
        "names = (Q.ENTRY_NAME, Q.PQ_ENTRY_NAME, Q.MP4_ENTRY_NAME,\n"
        "         Q.PARQUET_ENTRY_NAME, Q.ZIP_ENTRY_NAME,\n"
        "         Q.INFLATE_ENTRY_NAME)\n"
        "for nm in names:\n"
        "    assert nm not in _REGISTRY, 'import had a side effect'\n"
        "Q.register_queued(); Q.register_queued()\n"
        "assert all(nm in _REGISTRY for nm in names)\n"
        "assert len(registry()) == n0 + len(names)\n"
        "e = _REGISTRY[Q.ENTRY_NAME]\n"
        "assert e.oracle == Q.ORACLE and e.tags == Q.TAGS\n"
        "p = _REGISTRY[Q.PQ_ENTRY_NAME]\n"
        "assert p.oracle == Q.PQ_ORACLE and p.tags == Q.PQ_TAGS\n"
        "v = _REGISTRY[Q.MP4_ENTRY_NAME]\n"
        "assert v.oracle == Q.MP4_ORACLE and v.tags == Q.MP4_TAGS\n"
        "f = _REGISTRY[Q.PARQUET_ENTRY_NAME]\n"
        "assert f.oracle == Q.PARQUET_ORACLE and f.tags == Q.PARQUET_TAGS\n"
        "z = _REGISTRY[Q.ZIP_ENTRY_NAME]\n"
        "assert z.oracle == Q.ZIP_ORACLE and z.tags == Q.ZIP_TAGS\n"
        "i = _REGISTRY[Q.INFLATE_ENTRY_NAME]\n"
        "assert i.oracle == Q.INFLATE_ORACLE and i.tags == Q.INFLATE_TAGS\n"
        "print('QUEUED_OK')\n"
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=root, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "QUEUED_OK" in out.stdout


def test_queued_entry_matches_duckdb_oracle(spark):
    """The future landing's dry run: the queued entry's Spark query vs
    its DuckDB oracle at sf0.001 — columns, rows, values."""
    import duckdb

    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q

    sdf = Q.multimodal_ogg_opus_walk(spark, SF_DIR)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    cur = con.execute(Q.ORACLE)
    assert [d[0] for d in cur.description] == sdf.columns
    assert srows == sorted(tuple(r) for r in cur.fetchall())


def test_decode_adds_no_shuffle(spark):
    """The container walk is a narrow chain: synthesis + decode add
    NO exchange beyond the source table's own volume-sized
    repartition (the only Exchange is table()'s REPARTITION of the
    single-file documents scan — at 100 TB the source is already
    many splits and that too disappears)."""
    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q
    from duckdb_redis_olap_scanner_spark.plans.catalog import table

    base = (
        table(spark, SF_DIR, "documents").select("doc_id")
        ._jdf.queryExecution().executedPlan().toString().count("Exchange")
    )
    full = (
        Q.multimodal_ogg_opus_walk(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString().count("Exchange")
    )
    assert full == base
