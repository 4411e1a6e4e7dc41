"""ISO-BMFF (MP4) container walk (r20 capability, QUEUED entry
``multimodal_mp4_box_walk`` in plans/queued_entries_r21.py).

Pins: box framing round trips (incl. the 64-bit largesize form and
size==0 to-end semantics), full sample extraction through
stco/stsc/stsz, cross-table consistency checks, strict rejection of
truncated/oversized/missing boxes, and the driver gate's comparison
(Spark vs DuckDB oracle at sf0.001) run locally so a future landing
is purely mechanical.
"""

from __future__ import annotations

import struct

import pytest

from duckdb_redis_olap_scanner_spark.operators import mp4 as V

from .conftest import SF_DIR


def closed_form_stats(d: int) -> dict:
    ts, n, w, h = 1000 + (d % 5) * 200, 4 + d % 6, 16 * (1 + d % 3), \
        16 * (1 + d % 2)
    lens = [50 + (d * 7 + s * 13) % 120 for s in range(n)]
    sample = b"".join(
        bytes((d * 3 + s * 11 + j * 17) % 256 for j in range(lens[s]))
        for s in range(n)
    )
    return {
        "brand": "isom",
        "timescale": ts,
        "duration": n * V.MP4_SAMPLE_DELTA,
        "handler": "vide",
        "width": w,
        "height": h,
        "n_samples": n,
        "n_chunks": 2,
        "total_sample_bytes": sum(lens),
        "sample_checksum": sum((g + 1) * b for g, b in enumerate(sample)),
    }


@pytest.mark.parametrize("d", [0, 1, 2, 3, 4, 5, 7, 11, 97, 509])
def test_roundtrip_matches_closed_form(d):
    assert V.decode_mp4(V.encode_mp4_payload(d)) == closed_form_stats(d)


def test_mdat_uses_largesize_form():
    """Structural pin: the synthesized mdat really is the 64-bit form
    (size field == 1, true size in the following 8 bytes), so every
    decode exercises the largesize branch."""
    payload = V.encode_mp4_payload(3)
    at = payload.index(b"mdat") - 4
    (size32,) = struct.unpack_from(">I", payload, at)
    assert size32 == 1
    (size64,) = struct.unpack_from(">Q", payload, at + 8)
    assert at + size64 == len(payload)


def test_stco_offsets_are_absolute_and_correct():
    """The second chunk's stco offset must equal the first plus the
    first chunk's sample bytes — and extracting at those offsets must
    reproduce mdat exactly (already enforced in decode; pinned here
    structurally)."""
    d = 7
    payload = V.encode_mp4_payload(d)
    at = payload.index(b"stco") + 4 + 4  # fourcc + version/flags
    n, o1, o2 = struct.unpack_from(">III", payload, at)
    assert n == 2
    n_samp = 4 + d % 6
    c1 = (n_samp + 1) // 2
    first_chunk = sum(
        50 + (d * 7 + s * 13) % 120 for s in range(c1)
    )
    assert o2 == o1 + first_chunk
    mdat_data = payload.index(b"mdat") + 4 + 8  # fourcc + largesize
    assert o1 == mdat_data


def test_truncated_file_rejected():
    payload = V.encode_mp4_payload(2)
    with pytest.raises(ValueError):
        V.decode_mp4(payload[: len(payload) // 2])


def test_box_overrun_rejected():
    """Inflate a child box's size past its container: must raise, not
    walk out of bounds."""
    payload = bytearray(V.encode_mp4_payload(2))
    at = bytes(payload).index(b"mvhd") - 4
    struct.pack_into(">I", payload, at, 1 << 24)
    with pytest.raises(ValueError, match="overruns"):
        V.decode_mp4(bytes(payload))


def test_missing_required_box_rejected():
    """Blank out stsz's fourcc: the walker collects it under the junk
    name and the demux refuses."""
    payload = bytearray(V.encode_mp4_payload(2))
    at = bytes(payload).index(b"stsz")
    payload[at : at + 4] = b"junk"
    with pytest.raises(ValueError, match="stsz"):
        V.decode_mp4(bytes(payload))


def test_duplicate_required_box_rejected():
    """A second occurrence of any demux-required box (a second trak's
    tkhd, a repeated ftyp) must raise instead of silently overwriting
    the first (ADVICE r20: the flattened dict misreported multi-track
    files as their last track)."""
    payload = V.encode_mp4_payload(2)
    dup = struct.pack(">I4s", 16, b"ftyp") + b"isom" + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="duplicate box"):
        V.decode_mp4(payload + dup)


def test_geometry_mismatch_rejected():
    """Patch the stsd VisualSampleEntry width: tkhd/stsd disagreement
    must be refused, not silently preferred."""
    payload = bytearray(V.encode_mp4_payload(2))
    at = bytes(payload).index(b"raw ") + 4 + 6 + 2 + 16
    w = struct.unpack_from(">H", payload, at)[0]
    struct.pack_into(">H", payload, at, w + 16)
    with pytest.raises(ValueError, match="geometry"):
        V.decode_mp4(bytes(payload))


def test_stts_span_mismatch_rejected():
    """Patch the stts delta: the decode-time span must be checked
    against the mvhd duration."""
    payload = bytearray(V.encode_mp4_payload(2))
    at = bytes(payload).index(b"stts") + 4 + 4 + 4 + 4
    struct.pack_into(">I", payload, at, V.MP4_SAMPLE_DELTA + 1)
    with pytest.raises(ValueError, match="stts"):
        V.decode_mp4(bytes(payload))


def test_corrupt_sample_byte_changes_checksum_only():
    payload = bytearray(V.encode_mp4_payload(5))
    clean = V.decode_mp4(bytes(payload))
    payload[-1] ^= 0x2A  # last mdat byte
    got = V.decode_mp4(bytes(payload))
    assert got["sample_checksum"] != clean["sample_checksum"]
    assert {k: v for k, v in got.items() if k != "sample_checksum"} == \
        {k: v for k, v in clean.items() if k != "sample_checksum"}


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_roundtrip_property_any_doc_id(d):
    assert V.decode_mp4(V.encode_mp4_payload(d)) == closed_form_stats(d)


def test_corruption_never_hangs_and_is_mostly_detected():
    import random

    ok = bad = 0
    for doc_id in (3, 7):
        payload = V.encode_mp4_payload(doc_id)
        rng = random.Random(281 + doc_id)
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
                V.decode_mp4(mut)
                ok += 1  # landed in a don't-care byte (or sample data)
            except (ValueError, struct.error, UnicodeDecodeError):
                bad += 1
    assert bad > 0 and ok > 0  # both detection and benign mutations occur


def test_queued_entry_matches_duckdb_oracle(spark):
    import duckdb

    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q

    sdf = Q.multimodal_mp4_box_walk(spark, SF_DIR)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    cur = con.execute(Q.MP4_ORACLE)
    assert [d[0] for d in cur.description] == sdf.columns
    assert srows == sorted(tuple(r) for r in cur.fetchall())


def test_decode_adds_no_shuffle(spark):
    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q
    from duckdb_redis_olap_scanner_spark.plans.catalog import table

    base = (
        table(spark, SF_DIR, "documents").select("doc_id")
        ._jdf.queryExecution().executedPlan().toString().count("Exchange")
    )
    full = (
        Q.multimodal_mp4_box_walk(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString().count("Exchange")
    )
    assert full == base
