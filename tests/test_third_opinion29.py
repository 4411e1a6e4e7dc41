"""Third-opinion audit, batch 29 (r20): ISO-BMFF (MP4) box walk.

The queued ``multimodal_mp4_box_walk`` entry synthesizes AND decodes
with the same module (operators/mp4.py) — a matched misreading of the
spec (largesize handling, sample-table offsets, stsc run expansion)
would cancel in the oracle gate. This audit re-derives the entry's
rows with NO product helpers: an independent recursive box parser via
``int.from_bytes`` (the product uses struct and an iterative stack),
its own table parses at independently re-derived field offsets, and
its own stco/stsc/stsz sample extraction. Closed forms restated, not
imported.

Entries audited here: multimodal_mp4_box_walk (QUEUED in
plans/queued_entries_r21.py; audited now so a future landing is
purely mechanical).
"""

from __future__ import annotations

import pytest

from duckdb_redis_olap_scanner_spark.operators import mp4 as V

from .conftest import SF_DIR

DOC_IDS = list(range(0, 24)) + [97, 101, 211, 509]
_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl"}


def ind_boxes(payload: bytes, start: int = 0, end: int | None = None) -> dict:
    """Independent ISO-BMFF walk (recursive — the audit prefers the
    naive spec transcription; the product's iterative stack is the
    robustness fix): {fourcc: payload bytes}, containers flattened."""
    out: dict[str, bytes] = {}
    end = len(payload) if end is None else end
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(payload[pos : pos + 4], "big")
        name = payload[pos + 4 : pos + 8].decode("latin-1")
        body = pos + 8
        if size == 1:
            size = int.from_bytes(payload[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        assert pos + size <= end, f"box {name} overruns"
        if name in _CONTAINERS:
            out.update(ind_boxes(payload, body, pos + size))
        else:
            out[name] = payload[body : pos + size]
        pos += size
    return out


def ind_entry_row(payload: bytes) -> tuple:
    b = ind_boxes(payload)
    brand = b["ftyp"][:4].decode("ascii")
    timescale = int.from_bytes(b["mvhd"][12:16], "big")
    duration = int.from_bytes(b["mvhd"][16:20], "big")
    handler = b["hdlr"][8:12].decode("ascii")
    tk = b["tkhd"]
    width = int.from_bytes(tk[-8:-4], "big") >> 16
    height = int.from_bytes(tk[-4:], "big") >> 16
    stsz = b["stsz"]
    fixed = int.from_bytes(stsz[4:8], "big")
    n = int.from_bytes(stsz[8:12], "big")
    sizes = (
        [fixed] * n
        if fixed
        else [
            int.from_bytes(stsz[12 + 4 * i : 16 + 4 * i], "big")
            for i in range(n)
        ]
    )
    stco = b["stco"]
    n_chunks = int.from_bytes(stco[4:8], "big")
    offs = [
        int.from_bytes(stco[8 + 4 * i : 12 + 4 * i], "big")
        for i in range(n_chunks)
    ]
    stsc = b["stsc"]
    n_sc = int.from_bytes(stsc[4:8], "big")
    runs = [
        (
            int.from_bytes(stsc[8 + 12 * i : 12 + 12 * i], "big"),
            int.from_bytes(stsc[12 + 12 * i : 16 + 12 * i], "big"),
        )
        for i in range(n_sc)
    ]
    per_chunk = []
    for i, (first, spc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk += [spc] * (last - first + 1)
    assert sum(per_chunk) == n
    data = bytearray()
    s = 0
    for ci, off in enumerate(offs):
        pos = off
        for _ in range(per_chunk[ci]):
            data += payload[pos : pos + sizes[s]]
            pos += sizes[s]
            s += 1
    ck = sum((g + 1) * x for g, x in enumerate(data))
    return (
        brand, timescale, duration, handler, width, height,
        n, n_chunks, len(data), ck,
    )


def closed_form_row(d: int) -> tuple:
    n = 4 + d % 6
    lens = [50 + (d * 7 + s * 13) % 120 for s in range(n)]
    sample = b"".join(
        bytes((d * 3 + s * 11 + j * 17) % 256 for j in range(lens[s]))
        for s in range(n)
    )
    return (
        "isom", 1000 + (d % 5) * 200, n * 40, "vide",
        16 * (1 + d % 3), 16 * (1 + d % 2), n, 2, sum(lens),
        sum((g + 1) * b for g, b in enumerate(sample)),
    )


@pytest.mark.parametrize("d", DOC_IDS)
def test_independent_walk_matches_closed_form(d):
    assert ind_entry_row(V.encode_mp4_payload(d)) == closed_form_row(d)


@pytest.mark.parametrize("d", [0, 5, 13, 211])
def test_product_decoder_agrees_with_independent(d):
    payload = V.encode_mp4_payload(d)
    st = V.decode_mp4(payload)
    assert (
        st["brand"], st["timescale"], st["duration"], st["handler"],
        st["width"], st["height"], st["n_samples"], st["n_chunks"],
        st["total_sample_bytes"], st["sample_checksum"],
    ) == ind_entry_row(payload)


def test_queued_entry_rows_match_independent_decode(spark):
    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q

    rows = {
        int(r[0]): tuple(r)[1:]
        for r in Q.multimodal_mp4_box_walk(spark, SF_DIR).collect()
    }
    assert len(rows) > 0
    for did in sorted(rows)[:16]:
        payload = V.encode_mp4_payload(did)
        assert rows[did] == ind_entry_row(payload), f"doc {did}"


def test_audit_has_teeth_sample_corruption_detected():
    """Flip one mdat byte: the independent checksum must move while
    every table-derived column stays — proof the audit extracts and
    reads the sample bytes rather than trusting stsz sums."""
    payload = bytearray(V.encode_mp4_payload(4))
    clean = ind_entry_row(bytes(payload))
    payload[-1] ^= 0x2A
    got = ind_entry_row(bytes(payload))
    assert got[9] != clean[9]
    assert got[:9] == clean[:9]


def test_audit_has_teeth_offset_tamper_detected():
    """Shift the second stco offset by one byte: the extraction reads
    shifted bytes and the checksum must move (a size-only audit would
    still match)."""
    import struct

    payload = bytearray(V.encode_mp4_payload(4))
    clean = ind_entry_row(bytes(payload))
    at = bytes(payload).index(b"stco") + 4 + 4 + 4 + 4
    (o2,) = struct.unpack_from(">I", payload, at)
    struct.pack_into(">I", payload, at, o2 + 1)
    got = ind_entry_row(bytes(payload))
    assert got[9] != clean[9]
