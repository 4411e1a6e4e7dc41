"""Ogg container walk with Opus headers (r20 capability stretch).

A REAL RFC 3533 Ogg layer, dependency-free: page framing ('OggS'
capture pattern, version 0, header-type flags, 64-bit granule
position, stream serial, page sequence numbers, the 32-bit page CRC
over the whole page with the checksum field zeroed — forward
polynomial 0x04C11DB7, zero init, zero final XOR, unreflected — and
the segment lacing table), packet assembly across lacing values
(packets end on a lacing value < 255; a 255-terminated page continues
into the next page's 'continued packet' flag), plus the RFC 7845
Opus identification ('OpusHead': version, channel count, pre-skip,
input sample rate, output gain, mapping family) and comment
('OpusTags': vendor string + user comment vector, all
little-endian length-prefixed) header packets.

Scope note (honest bar): Opus AUDIO frames need libopus — the audio
packets here are opaque bytes whose synthesis is closed-form, so the
entry pins the CONTAINER layer (CRC verification, lacing/continuation
reassembly, granule bookkeeping, header parsing) the way the AVI
entries pin RIFF demuxing. Everything decode-side is spec-real.

Reference parity note: the reference engine (C++ DuckDB<->Redis
connector, src/redduck_extension.cpp) has no media path; this module is
part of the beyond-reference LLM-pipeline surface (multimodal shard
ingest) the build brief asks for.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ogg_crc",
    "encode_ogg_opus_payload",
    "decode_ogg_opus",
    "synthesize_ogg_streams",
    "decode_ogg_features",
]


def _crc_table() -> list:
    table = []
    for b in range(256):
        r = b << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 else (
                (r << 1) & 0xFFFFFFFF
            )
        table.append(r)
    return table


_CRC_TABLE = _crc_table()


def ogg_crc(data: bytes) -> int:
    """The Ogg page CRC (RFC 3533 §6): polynomial 0x04C11DB7, zero
    initial value, zero final XOR, no bit reflection — NOT the zlib
    CRC-32, so a library CRC cannot be substituted by accident."""
    r = 0
    for byte in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((r >> 24) & 0xFF) ^ byte]
    return r


def _page(
    serial: int,
    seq: int,
    granule: int,
    segments: list,
    first: bool = False,
    last: bool = False,
    continued: bool = False,
) -> bytes:
    """One Ogg page from pre-laced segments (each <= 255 bytes)."""
    header_type = (
        (0x01 if continued else 0)
        | (0x02 if first else 0)
        | (0x04 if last else 0)
    )
    lacing = bytes(len(s) for s in segments)
    body = b"".join(segments)
    hdr = struct.pack(
        "<4sBBqIIIB",
        b"OggS", 0, header_type, granule, serial, seq, 0, len(segments),
    )
    page = hdr + lacing + body
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _lace(packet: bytes) -> list:
    """RFC 3533 lacing: 255-byte segments, terminated by a segment
    < 255 bytes (possibly empty when len % 255 == 0)."""
    segs = [packet[i : i + 255] for i in range(0, len(packet), 255)]
    if not segs or len(segs[-1]) == 255:
        segs.append(b"")
    return segs


# Closed-form synthesis contract (all SQL-replayable):
#   channels   = 1 + doc_id % 2
#   pre_skip   = 312 + doc_id % 100
#   n_packets  = 3 + doc_id % 5          (audio packets)
#   len_p      = 180 + (doc_id + p*37) % 300   for p != 1
#   len_1      = 256 + (doc_id*3) % 244  (always > 255: packet 1 is
#                the one deliberately split across two pages, and a
#                continued packet legally requires a full 255-byte
#                lacing segment on the first page)
#   byte_j     = (doc_id*5 + p*17 + j*29) % 256
#   granule    = 960 * (audio packets completed so far)
#   comment    = "doc_id=<doc_id>"
OGG_VENDOR = b"spark-graft"
OGG_SAMPLES_PER_PACKET = 960


def _opus_audio_packet(doc_id: int, p: int) -> bytes:
    if p == 1:
        n = 256 + (doc_id * 3) % 244
    else:
        n = 180 + (doc_id + p * 37) % 300
    return bytes((doc_id * 5 + p * 17 + j * 29) % 256 for j in range(n))


def encode_ogg_opus_payload(doc_id: int) -> bytes:
    """A real Ogg Opus stream per RFC 7845 §3: page 0 = OpusHead alone
    (BOS), page 1 = OpusTags alone, then ONE audio packet per page —
    except packet 1, whose lacing is deliberately split mid-packet
    across two pages so the reader must honor the continued-packet
    flag. Every page carries a true RFC 3533 CRC."""
    ch = 1 + doc_id % 2
    pre_skip = 312 + doc_id % 100
    serial = 0x5347 + doc_id  # deterministic per stream
    head = struct.pack(
        "<8sBBHIhB", b"OpusHead", 1, ch, pre_skip, 48000, 0, 0
    )
    comment = b"doc_id=%d" % doc_id
    tags = (
        b"OpusTags"
        + struct.pack("<I", len(OGG_VENDOR)) + OGG_VENDOR
        + struct.pack("<I", 1)
        + struct.pack("<I", len(comment)) + comment
    )
    pages = [
        _page(serial, 0, 0, _lace(head), first=True),
        _page(serial, 1, 0, _lace(tags)),
    ]
    n_pkt = 3 + doc_id % 5
    seq = 2
    done = 0
    for p in range(n_pkt):
        pkt = _opus_audio_packet(doc_id, p)
        if p == 1:
            # split this packet across two pages: the first page ends
            # on a full 255-byte lacing segment (packet unterminated,
            # granule -1 since no packet completes there), the next
            # page opens with the continued-packet flag
            head_b, tail_b = pkt[:255], pkt[255:]
            pages.append(_page(serial, seq, -1, [head_b]))
            seq += 1
            done += 1
            pages.append(
                _page(
                    serial, seq,
                    done * OGG_SAMPLES_PER_PACKET, _lace(tail_b),
                    continued=True, last=(p == n_pkt - 1),
                )
            )
            seq += 1
        else:
            done += 1
            pages.append(
                _page(
                    serial, seq, done * OGG_SAMPLES_PER_PACKET,
                    _lace(pkt), last=(p == n_pkt - 1),
                )
            )
            seq += 1
    return b"".join(pages)


def decode_ogg_opus(payload: bytes) -> dict:
    """Walk a single-stream Ogg Opus payload: verify every page's CRC
    and sequence number, reassemble packets across lacing values and
    page continuations, parse OpusHead/OpusTags, and checksum the
    audio packets. Strict: bad capture pattern / version / CRC /
    sequence gap / dangling continuation / malformed headers all
    raise ValueError.

    Returns {serial, n_pages, n_packets, channels, pre_skip,
    vendor_len, n_comments, audio_bytes, audio_checksum,
    last_granule} where audio_checksum = Σ (g+1)·byte over the
    concatenated audio packets in order — a dropped, reordered, or
    continuation-mangled packet cannot hash-match."""
    import numpy as np

    pos = 0
    serial = None
    expect_seq = 0
    packets: list = []
    partial = bytearray()
    in_packet = False
    n_pages = 0
    last_granule = 0
    while pos < len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad capture pattern at {pos}")
        if pos + 27 > len(payload):
            raise ValueError("truncated page header")
        (_, version, htype, granule, ser, seq, crc, n_seg) = struct.unpack_from(
            "<4sBBqIIIB", payload, pos
        )
        if version != 0:
            raise ValueError(f"unsupported Ogg version {version}")
        lacing = payload[pos + 27 : pos + 27 + n_seg]
        if len(lacing) < n_seg:
            raise ValueError("truncated lacing table")
        body_len = sum(lacing)
        page_end = pos + 27 + n_seg + body_len
        if page_end > len(payload):
            raise ValueError("truncated page body")
        page = bytearray(payload[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"page {seq} CRC mismatch")
        if serial is None:
            serial = ser
        elif ser != serial:
            raise ValueError("multiplexed streams not supported here")
        if seq != expect_seq:
            raise ValueError(f"page sequence gap: got {seq}, want {expect_seq}")
        expect_seq += 1
        continued = bool(htype & 0x01)
        if continued != in_packet:
            raise ValueError(
                f"page {seq}: continued flag {continued} but "
                f"{'a' if in_packet else 'no'} packet was open"
            )
        body_pos = pos + 27 + n_seg
        for lace in lacing:
            partial += payload[body_pos : body_pos + lace]
            body_pos += lace
            if lace < 255:
                packets.append(bytes(partial))
                partial = bytearray()
                in_packet = False
            else:
                in_packet = True
        n_pages += 1
        if granule >= 0:
            last_granule = granule
        pos = page_end
    if in_packet:
        raise ValueError("stream ends inside a continued packet")
    if len(packets) < 2:
        raise ValueError("missing OpusHead/OpusTags packets")
    head = packets[0]
    if head[:8] != b"OpusHead" or len(head) < 19:
        raise ValueError("first packet is not a valid OpusHead")
    try:
        version, ch, pre_skip, _rate, _gain, mapping = struct.unpack_from(
            "<BBHIhB", head, 8
        )
    except struct.error as exc:  # contract error, like the RIFF walks
        raise ValueError(f"truncated OpusHead: {exc}") from exc
    if version != 1 or mapping != 0:
        raise ValueError("unsupported OpusHead version/mapping family")
    tags = packets[1]
    if tags[:8] != b"OpusTags":
        raise ValueError("second packet is not a valid OpusTags")
    try:
        (vlen,) = struct.unpack_from("<I", tags, 8)
        tpos = 12 + vlen
        (n_comments,) = struct.unpack_from("<I", tags, tpos)
        tpos += 4
        for _ in range(n_comments):
            (clen,) = struct.unpack_from("<I", tags, tpos)
            tpos += 4 + clen
    except struct.error as exc:
        raise ValueError(f"truncated OpusTags: {exc}") from exc
    if tpos > len(tags):
        raise ValueError("OpusTags comment vector overruns the packet")
    audio = b"".join(packets[2:])
    a = np.frombuffer(audio, dtype=np.uint8).astype(np.int64)
    g = np.arange(a.size, dtype=np.int64)
    return {
        "serial": int(serial),
        "n_pages": n_pages,
        "n_packets": len(packets) - 2,
        "channels": int(ch),
        "pre_skip": int(pre_skip),
        "vendor_len": int(vlen),
        "n_comments": int(n_comments),
        "audio_bytes": int(a.size),
        "audio_checksum": int(((g + 1) * a).sum()),
        "last_granule": int(last_granule),
    }


OGG_FEATURES_SCHEMA = (
    "doc_id long, serial long, n_pages int, n_packets int, "
    "channels int, pre_skip int, vendor_len int, n_comments int, "
    "audio_bytes int, audio_checksum long, last_granule long"
)


def synthesize_ogg_streams(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary): one real Ogg Opus stream per doc,
    synthesized in the workers (same shape as the AVI synthesizers;
    payloads never on the driver)."""
    from ..engine import ship_package

    def _synth(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_ogg_opus_payload(int(d))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    ship_package(docs.sparkSession)
    return docs.select("doc_id").mapInPandas(
        _synth, schema="doc_id long, payload binary"
    )


def decode_ogg_features(media: DataFrame) -> DataFrame:
    """Container walk over a binary column in one narrow Arrow map —
    CRC verification, packet reassembly, header parse and audio
    checksums all worker-side; no shuffle (at 100 TB this is the map
    over object-storage .opus blobs)."""
    from ..engine import ship_package

    cols = [
        "serial", "n_pages", "n_packets", "channels", "pre_skip",
        "vendor_len", "n_comments", "audio_bytes", "audio_checksum",
        "last_granule",
    ]

    def _run(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                st = decode_ogg_opus(bytes(payload))
                rows.append((int(did),) + tuple(st[c] for c in cols))
            out = pd.DataFrame(rows, columns=["doc_id"] + cols)
            for c in ("doc_id", "serial", "audio_checksum", "last_granule"):
                out[c] = out[c].astype("int64")
            for c in ("n_pages", "n_packets", "channels", "pre_skip",
                      "vendor_len", "n_comments", "audio_bytes"):
                out[c] = out[c].astype("int32")
            yield out

    ship_package(media.sparkSession)
    return media.select("doc_id", "payload").mapInPandas(
        _run, schema=OGG_FEATURES_SCHEMA
    )
