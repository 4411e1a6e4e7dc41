"""Third-opinion audit, batch 27 (r20): Ogg/Opus container walk.

The queued ``multimodal_ogg_opus_walk`` entry synthesizes AND decodes
with the same module (operators/ogg.py) — a matched misreading of the
spec (CRC parameterization, lacing termination rule, continued-packet
semantics, OpusTags length prefixes) would cancel in the oracle gate.
This audit re-derives the entry's rows with NO product helpers: a
bit-at-a-time CRC typed from RFC 3533's polynomial statement (the
product uses a byte-indexed table), an independent page walker and
packet assembler (own header offsets, own lacing loop), and an
independent OpusHead/OpusTags parse via int.from_bytes (the product
uses struct). Closed forms are restated here, not imported.

Entries audited here: multimodal_ogg_opus_walk (QUEUED in
plans/queued_entries_r21.py; audited now so a future landing is
purely mechanical).
"""

from __future__ import annotations

import pytest

from duckdb_redis_olap_scanner_spark.operators import ogg as O

from .conftest import SF_DIR

DOC_IDS = list(range(0, 24)) + [97, 101, 211, 509]


def ind_crc(data: bytes) -> int:
    """Bit-at-a-time CRC per RFC 3533 §6: generator 0x04C11DB7,
    'initial value and final XOR of 0', most-significant bit first."""
    r = 0
    for byte in data:
        r ^= byte << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else ((r << 1) & 0xFFFFFFFF)
    return r


def ind_walk_pages(payload: bytes) -> list:
    """Independent page walk: [(htype, granule, serial, seq,
    lacing, body)] with CRC verified per page."""
    pages = []
    pos = 0
    while pos < len(payload):
        assert payload[pos : pos + 4] == b"OggS", "capture pattern"
        assert payload[pos + 4] == 0, "stream structure version"
        htype = payload[pos + 5]
        granule = int.from_bytes(
            payload[pos + 6 : pos + 14], "little", signed=True
        )
        serial = int.from_bytes(payload[pos + 14 : pos + 18], "little")
        seq = int.from_bytes(payload[pos + 18 : pos + 22], "little")
        crc = int.from_bytes(payload[pos + 22 : pos + 26], "little")
        n_seg = payload[pos + 26]
        lacing = payload[pos + 27 : pos + 27 + n_seg]
        body_start = pos + 27 + n_seg
        body = payload[body_start : body_start + sum(lacing)]
        page = (
            payload[pos : pos + 22]
            + b"\x00\x00\x00\x00"
            + payload[pos + 26 : body_start + sum(lacing)]
        )
        assert ind_crc(page) == crc, f"CRC mismatch on page {seq}"
        pages.append((htype, granule, serial, seq, bytes(lacing), bytes(body)))
        pos = body_start + sum(lacing)
    return pages


def ind_packets(pages: list) -> list:
    """Independent packet assembly: a packet ends on a lacing value
    < 255; a page whose final lacing value is 255 continues into the
    next page (whose 0x01 flag must be set)."""
    packets = []
    partial = b""
    for htype, _g, _s, seq, lacing, body in pages:
        assert bool(htype & 0x01) == bool(partial), f"page {seq} flag"
        at = 0
        for lace in lacing:
            partial += body[at : at + lace]
            at += lace
            if lace < 255:
                packets.append(partial)
                partial = b""
    assert partial == b"", "dangling continued packet"
    return packets


def ind_entry_row(payload: bytes) -> tuple:
    pages = ind_walk_pages(payload)
    serials = {p[2] for p in pages}
    assert len(serials) == 1
    assert [p[3] for p in pages] == list(range(len(pages)))
    packets = ind_packets(pages)
    head, tags, audio_pkts = packets[0], packets[1], packets[2:]
    assert head[:8] == b"OpusHead" and head[8] == 1
    ch = head[9]
    pre_skip = int.from_bytes(head[10:12], "little")
    assert tags[:8] == b"OpusTags"
    vlen = int.from_bytes(tags[8:12], "little")
    ncom = int.from_bytes(tags[12 + vlen : 16 + vlen], "little")
    audio = b"".join(audio_pkts)
    last_granule = max(g for _h, g, _s, _q, _l, _b in pages if g >= 0)
    return (
        serials.pop(),
        len(pages),
        len(audio_pkts),
        ch,
        pre_skip,
        vlen,
        ncom,
        len(audio),
        sum((g + 1) * b for g, b in enumerate(audio)),
        last_granule,
    )


def closed_form_row(d: int) -> tuple:
    n_pkt = 3 + d % 5
    lens = [
        (256 + (d * 3) % 244) if p == 1 else (180 + (d + p * 37) % 300)
        for p in range(n_pkt)
    ]
    audio = b"".join(
        bytes((d * 5 + p * 17 + j * 29) % 256 for j in range(lens[p]))
        for p in range(n_pkt)
    )
    return (
        0x5347 + d, 3 + n_pkt, n_pkt, 1 + d % 2, 312 + d % 100,
        11, 1, sum(lens), sum((g + 1) * b for g, b in enumerate(audio)),
        960 * n_pkt,
    )


@pytest.mark.parametrize("d", DOC_IDS)
def test_independent_walk_matches_closed_form(d):
    assert ind_entry_row(O.encode_ogg_opus_payload(d)) == closed_form_row(d)


@pytest.mark.parametrize("d", [0, 5, 13, 211])
def test_product_decoder_agrees_with_independent(d):
    payload = O.encode_ogg_opus_payload(d)
    st = O.decode_ogg_opus(payload)
    assert (
        st["serial"], st["n_pages"], st["n_packets"], st["channels"],
        st["pre_skip"], st["vendor_len"], st["n_comments"],
        st["audio_bytes"], st["audio_checksum"], st["last_granule"],
    ) == ind_entry_row(payload)


def test_independent_crc_agrees_with_product_table():
    """The table-driven product CRC and the bit-at-a-time audit CRC
    must agree on arbitrary data — two implementations of the same
    spec paragraph."""
    import random

    rng = random.Random(271)
    for n in (0, 1, 7, 64, 513):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert O.ogg_crc(data) == ind_crc(data)


def test_queued_entry_rows_match_independent_decode(spark):
    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q

    rows = {
        int(r[0]): tuple(r)[1:]
        for r in Q.multimodal_ogg_opus_walk(spark, SF_DIR).collect()
    }
    assert len(rows) > 0
    for did in sorted(rows)[:16]:
        payload = O.encode_ogg_opus_payload(did)
        assert rows[did] == ind_entry_row(payload), f"doc {did}"


def test_audit_has_teeth_audio_corruption_detected():
    """Flipping a body byte must trip the audit's OWN CRC check (the
    page CRC covers the body), proving the audit verifies rather than
    trusts."""
    payload = bytearray(O.encode_ogg_opus_payload(4))
    payload[-1] ^= 0x2A
    with pytest.raises(AssertionError, match="CRC"):
        ind_walk_pages(bytes(payload))


def test_audit_has_teeth_lacing_misread_detected():
    """Re-CRC'd lacing tamper (turn the split page's 255 into 254,
    shrinking its body by one byte, CRC recomputed): the audit's flag
    consistency check must refuse — the next page still claims
    continuation."""
    payload = O.encode_ogg_opus_payload(5)
    pages = ind_walk_pages(payload)
    # rebuild pages, mutating the unterminated one
    out = bytearray()
    for htype, granule, serial, seq, lacing, body in pages:
        if lacing and lacing[-1] == 255:
            lacing = lacing[:-1] + bytes([254])
            body = body[:-1]
        hdr = (
            b"OggS\x00" + bytes([htype])
            + granule.to_bytes(8, "little", signed=True)
            + serial.to_bytes(4, "little")
            + seq.to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + bytes([len(lacing)]) + lacing
        )
        page = bytearray(hdr + body)
        page[22:26] = ind_crc(bytes(page)).to_bytes(4, "little")
        out += page
    with pytest.raises(AssertionError, match="flag"):
        ind_packets(ind_walk_pages(bytes(out)))
