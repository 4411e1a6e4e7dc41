"""From-scratch ZIP archive reader (r20 capability, QUEUED entry
``zip_corpus_ingest`` in plans/queued_entries_r21.py).

Pins: cross-implementation round trips (every archive is written by
stdlib ``zipfile`` — an independent writer — and read back by the
byte-level walker), central-directory-driven ordering, archive
comments, empty/deflated/stored members, strict rejection (missing
EOCD, encryption, data descriptors, foreign methods, CRC/size lies,
truncation), corruption fuzz, the Spark ingest stage, and the driver
gate's comparison (Spark vs DuckDB oracle at sf0.001).
"""

from __future__ import annotations

import io
import random
import struct
import zipfile

import pytest

from duckdb_redis_olap_scanner_spark.operators.zip_archive import (
    _comp_sizes,
    zip_ingest,
    zip_members,
)

from .conftest import SF_DIR


def _pack(members, comment=b"", methods=None):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        if comment:
            zf.comment = comment
        for i, (name, data) in enumerate(members):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = (
                methods[i] if methods else zipfile.ZIP_DEFLATED
            )
            zf.writestr(info, data)
    return buf.getvalue()


def test_round_trip_mixed_methods():
    members = [
        ("big.txt", b"the quick brown fox " * 200),
        ("tiny.json", b'{"k": 1}'),
        ("empty.bin", b""),
        ("dir/nested/name.dat", bytes(range(256)) * 4),
    ]
    arc = _pack(
        members,
        methods=[
            zipfile.ZIP_DEFLATED,
            zipfile.ZIP_STORED,
            zipfile.ZIP_DEFLATED,
            zipfile.ZIP_STORED,
        ],
    )
    assert zip_members(arc) == members
    # deflate actually compressed the repetitive member
    comp = dict(_comp_sizes(arc))
    assert comp["big.txt"] < len(members[0][1])
    assert comp["tiny.json"] == len(members[1][1])


def test_archive_comment_and_unicode_names():
    members = [("日本語/ファイル.txt", "héllo wörld".encode("utf-8"))]
    arc = _pack(members, comment=b"x" * 1000)
    assert zip_members(arc) == members


def test_many_members_follow_central_directory_order():
    rng = random.Random(7)
    members = [
        (f"m{i:03d}.bin", bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400))))
        for i in range(120)
    ]
    arc = _pack(members)
    assert zip_members(arc) == members


def test_prepended_garbage_is_rejected_not_silently_shifted():
    """Local offsets in the central directory are absolute; an archive
    with bytes prepended (a classic smuggling vector) must fail the
    local-header cross-check, not decode shifted members."""
    arc = _pack([("a.txt", b"payload")])
    with pytest.raises(
        ValueError, match="local header|central-directory signature"
    ):
        zip_members(b"JUNK" * 8 + arc)


def test_no_eocd_rejected():
    with pytest.raises(ValueError, match="end-of-central-directory"):
        zip_members(b"PK\x03\x04" + bytes(64))
    with pytest.raises(ValueError, match="end-of-central-directory"):
        _comp_sizes(bytes(100))


def test_encrypted_member_rejected():
    arc = bytearray(_pack([("s.txt", b"secret")]))
    # set bit 0 (encryption) in the central-directory flags
    at = arc.rfind(b"PK\x01\x02")
    flags = struct.unpack_from("<H", arc, at + 8)[0]
    struct.pack_into("<H", arc, at + 8, flags | 0x01)
    with pytest.raises(ValueError, match="encrypted"):
        zip_members(bytes(arc))


def test_data_descriptor_member_rejected():
    arc = bytearray(_pack([("s.txt", b"streamed")]))
    at = arc.rfind(b"PK\x01\x02")
    flags = struct.unpack_from("<H", arc, at + 8)[0]
    struct.pack_into("<H", arc, at + 8, flags | 0x08)
    with pytest.raises(ValueError, match="data descriptor"):
        zip_members(bytes(arc))


def test_foreign_method_rejected():
    arc = _pack(
        [("b.bin", b"bzip2 member " * 40)], methods=[zipfile.ZIP_BZIP2]
    )
    with pytest.raises(ValueError, match="unsupported method 12"):
        zip_members(arc)


def test_crc_and_size_lies_rejected():
    """Lies written consistently into BOTH header copies (so the
    schizophrenia check cannot catch them first) must still fail the
    recomputed CRC / size verification."""
    payload = b"check me " * 30
    arc = bytearray(_pack([("c.bin", payload)], methods=[zipfile.ZIP_STORED]))
    at = arc.rfind(b"PK\x01\x02")
    local_off = struct.unpack_from("<I", arc, at + 42)[0]
    # corrupt the recorded CRC in central (+16) and local (+14)
    bad = bytearray(arc)
    struct.pack_into("<I", bad, at + 16, 0xDEADBEEF)
    struct.pack_into("<I", bad, local_off + 14, 0xDEADBEEF)
    with pytest.raises(ValueError, match="CRC-32 mismatch"):
        zip_members(bytes(bad))
    # lie about the uncompressed size in central (+24) and local (+22)
    bad = bytearray(arc)
    struct.pack_into("<I", bad, at + 24, len(payload) + 1)
    struct.pack_into("<I", bad, local_off + 22, len(payload) + 1)
    with pytest.raises(ValueError, match="directory says"):
        zip_members(bytes(bad))


def test_schizophrenic_header_rejected():
    """Central and local copies that disagree on material metadata
    (different CRC, method, or name between the two headers) must be
    rejected, not resolved in favor of either copy."""
    arc = bytearray(_pack([("s.bin", b"two-faced " * 20)]))
    at = arc.rfind(b"PK\x01\x02")
    local_off = struct.unpack_from("<I", arc, at + 42)[0]
    bad = bytearray(arc)
    struct.pack_into("<I", bad, local_off + 14, 0)  # local CRC only
    with pytest.raises(ValueError, match="disagrees"):
        zip_members(bytes(bad))
    bad = bytearray(arc)
    bad[local_off + 30] ^= 0xFF  # local name first byte
    with pytest.raises(ValueError, match="disagrees"):
        zip_members(bytes(bad))


def test_truncated_member_data_rejected():
    """EOCD + central directory intact, member bytes missing: move the
    directory over the data region so comp_size overruns it."""
    arc = _pack([("t.bin", b"z" * 4096)], methods=[zipfile.ZIP_STORED])
    cd_at = arc.rfind(b"PK\x01\x02")
    eocd_at = arc.rfind(b"PK\x05\x06")
    cut = 2048
    trimmed = bytearray(arc[:cd_at - cut] + arc[cd_at:])
    new_eocd = eocd_at - cut
    struct.pack_into("<I", trimmed, new_eocd + 16, cd_at - cut)
    with pytest.raises(ValueError):
        zip_members(bytes(trimmed))


def test_central_directory_overrun_rejected():
    arc = bytearray(_pack([("o.txt", b"x")]))
    at = arc.rfind(b"PK\x05\x06")
    struct.pack_into("<I", arc, at + 12, len(arc))  # cd_size overruns
    with pytest.raises(ValueError, match="overruns"):
        zip_members(bytes(arc))


def test_corruption_fuzz_detection_near_total():
    """Single-byte corruption anywhere before the EOCD record must be
    overwhelmingly detected (CRC-32 over payloads, signatures and
    cross-checks over headers). Flips that land in a name field alone
    can legitimately survive, so the bar is near-total, not total."""
    rng = random.Random(20)
    arc = _pack(
        [("f1.bin", bytes(rng.randrange(256) for _ in range(600))),
         ("f2.txt", b"structured text " * 40)]
    )
    eocd_at = arc.rfind(b"PK\x05\x06")
    ok = bad = 0
    for _ in range(300):
        pos = rng.randrange(eocd_at)
        flip = bytearray(arc)
        flip[pos] ^= 1 << rng.randrange(8)
        try:
            if zip_members(bytes(flip)) == zip_members(arc):
                ok += 1
            else:
                bad += 1  # decoded differently -> also detected-as-changed
        except (ValueError, struct.error, UnicodeDecodeError, KeyError):
            bad += 1
    assert bad > ok * 10


def test_zip_ingest_spark_stage(spark):
    docs = spark.createDataFrame(
        [
            (1, "repetitive text " * 60, "en", "web"),
            (2, "", None, "books"),
            (3, "短い", "ja", None),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {r["doc_id"]: r for r in zip_ingest(docs).collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r["n_members"] == 2
    import hashlib

    assert rows[1]["txt_md5"] == hashlib.md5(
        ("repetitive text " * 60).encode()
    ).hexdigest()
    assert rows[1]["deflate_smaller"] is True
    # empty text: raw deflate emits a 2-byte empty block > 0 bytes
    assert rows[2]["deflate_smaller"] is False
    assert rows[2]["json_md5"] == hashlib.md5(
        b'{"lang": "", "source": "books"}'
    ).hexdigest()
    assert rows[3]["n_raw"] == len("短い".encode()) + len(
        '{"lang": "ja", "source": ""}'
    )


def test_queued_entry_matches_duckdb_oracle(spark):
    """The future landing's dry run: the queued entry's Spark query vs
    its DuckDB oracle at sf0.001 — columns, rows, values."""
    import duckdb

    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q

    sdf = Q.zip_corpus_ingest(spark, SF_DIR)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    cur = con.execute(Q.ZIP_ORACLE)
    assert [d[0] for d in cur.description] == sdf.columns
    assert srows == sorted(tuple(r) for r in cur.fetchall())


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_NAME = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00/\\",
        exclude_categories=("Cs", "Cc"),
    ),
    min_size=1, max_size=30,
)


@settings(max_examples=60, deadline=None)
@given(
    members=st.lists(
        st.tuples(_NAME, st.binary(max_size=500)),
        min_size=1, max_size=8, unique_by=lambda t: t[0],
    ),
    stored=st.booleans(),
    comment=st.binary(max_size=100),
)
def test_hypothesis_differential_round_trip(members, stored, comment):
    """Arbitrary member sets through the independent writer: the
    walker must recover names, order, and exact bytes — and agree
    with stdlib zipfile's reader on the same archive."""
    import io

    method = zipfile.ZIP_STORED if stored else zipfile.ZIP_DEFLATED
    arc = _pack(members, comment=comment, methods=[method] * len(members))
    got = zip_members(arc)
    assert got == members
    with zipfile.ZipFile(io.BytesIO(arc)) as zf:
        assert got == [(i.filename, zf.read(i)) for i in zf.infolist()]


def test_zip64_many_members():
    """>65535 members forces the EOCD64 record (sentinel n_entries /
    offsets in the classic EOCD) — the 100 TB shard shape. Every
    member must come back; order follows the central directory."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(70_000):
            info = zipfile.ZipInfo(f"{i:06d}", (1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_STORED
            zf.writestr(info, b"%d" % i)
    arc = buf.getvalue()
    at = arc.rfind(b"PK\x05\x06")
    assert struct.unpack_from("<H", arc, at + 10)[0] == 0xFFFF  # sentinel
    got = zip_members(arc)
    assert len(got) == 70_000
    assert got[0] == ("000000", b"0")
    assert got[69_999] == ("069999", b"69999")
    comp = _comp_sizes(arc)
    assert len(comp) == 70_000 and comp[9][0] == "000009"


def test_zip64_entry_extra_field_resolution():
    """A central entry whose sizes/offset all carry the 0xFFFFFFFF
    sentinel must resolve through its 0x0001 extra field — hand-built,
    since small archives from stdlib never emit per-entry zip64."""
    payload = b"zip64 entry payload " * 10
    arc = bytearray(_pack([("big.bin", payload)], methods=[zipfile.ZIP_STORED]))
    at = arc.rfind(b"PK\x01\x02")
    eocd_at = arc.rfind(b"PK\x05\x06")
    (comp, uncomp) = struct.unpack_from("<II", arc, at + 20)
    local_off = struct.unpack_from("<I", arc, at + 42)[0]
    name_len = struct.unpack_from("<H", arc, at + 28)[0]
    # sentinel the three fields, append a zip64 extra field
    struct.pack_into("<II", arc, at + 20, 0xFFFFFFFF, 0xFFFFFFFF)
    struct.pack_into("<I", arc, at + 42, 0xFFFFFFFF)
    extra = struct.pack("<HHQQQ", 0x0001, 24, uncomp, comp, local_off)
    struct.pack_into("<H", arc, at + 30, len(extra))  # extra_len
    insert_at = at + 46 + name_len
    rebuilt = bytes(arc[:insert_at]) + extra + bytes(arc[insert_at:])
    # fix EOCD cd_size (+len(extra)); cd_off unchanged (entry grew in place)
    rebuilt = bytearray(rebuilt)
    new_eocd = eocd_at + len(extra)
    cd_size = struct.unpack_from("<I", rebuilt, new_eocd + 12)[0]
    struct.pack_into("<I", rebuilt, new_eocd + 12, cd_size + len(extra))
    assert zip_members(bytes(rebuilt)) == [("big.bin", payload)]
    # _comp_sizes must resolve the same sentinel (ADVICE r20: it used
    # to report the raw 0xFFFFFFFF for a zip64 member)
    assert _comp_sizes(bytes(rebuilt)) == [("big.bin", comp)]
    # teeth: strip the extra field id -> sentinel with no resolution
    broken = bytearray(rebuilt)
    struct.pack_into("<H", broken, insert_at, 0x9999)
    with pytest.raises(ValueError, match="no 0x0001 extra field"):
        zip_members(bytes(broken))


def test_zip64_missing_locator_rejected():
    arc = bytearray(_pack([("x.txt", b"data")]))
    at = arc.rfind(b"PK\x05\x06")
    struct.pack_into("<H", arc, at + 10, 0xFFFF)  # lie: zip64 sentinel
    with pytest.raises(ValueError, match="no EOCD64 locator"):
        zip_members(bytes(arc))


def test_deflate_trailing_junk_inside_extent_rejected():
    """A deflate member whose stream terminates early, with junk bytes
    padding out the recorded comp_size, must be rejected even though
    the inflated size and CRC still match (ADVICE r20: the old path
    never checked decompressobj.eof/unused_data)."""
    data = b"the quick brown fox jumps over the lazy dog " * 20
    arc = bytearray(_pack([("a.txt", data)], methods=[zipfile.ZIP_DEFLATED]))
    junk = b"\xde\xad\xbe\xef"
    cd_at = arc.rfind(b"PK\x01\x02")
    eocd_at = arc.rfind(b"PK\x05\x06")
    (comp,) = struct.unpack_from("<I", arc, cd_at + 20)
    name_len = struct.unpack_from("<H", arc, cd_at + 28)[0]
    (local_off,) = struct.unpack_from("<I", arc, cd_at + 42)
    data_at = local_off + 30 + name_len  # local extra_len is 0 here
    l_extra = struct.unpack_from("<H", arc, local_off + 28)[0]
    data_at += l_extra
    # grow comp_size by len(junk) in BOTH headers, insert the junk
    # after the (complete) deflate stream, shift cd_off in the EOCD
    struct.pack_into("<I", arc, cd_at + 20, comp + len(junk))
    struct.pack_into("<I", arc, local_off + 18, comp + len(junk))
    rebuilt = bytearray(
        bytes(arc[: data_at + comp]) + junk + bytes(arc[data_at + comp :])
    )
    new_eocd = eocd_at + len(junk)
    cd_off = struct.unpack_from("<I", rebuilt, new_eocd + 16)[0]
    struct.pack_into("<I", rebuilt, new_eocd + 16, cd_off + len(junk))
    with pytest.raises(ValueError, match="does not span"):
        zip_members(bytes(rebuilt))
