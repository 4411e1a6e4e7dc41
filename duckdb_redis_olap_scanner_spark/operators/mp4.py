"""ISO-BMFF (MP4) box walk (r20 capability stretch).

A REAL ISO/IEC 14496-12 container layer, dependency-free: the
size/type box framing (including the ``size == 1`` → 64-bit
``largesize`` form), nested container boxes walked with an iterative
span stack (ftyp, moov → mvhd / trak → tkhd / mdia → mdhd, hdlr,
minf → stbl), and the full sample-table machinery a real demuxer
needs — stsd (VisualSampleEntry geometry), stts (decode deltas),
stsc (sample→chunk runs), stsz (per-sample sizes), stco (chunk
offsets) — driven to completion: every sample's bytes are EXTRACTED
from mdat via stco+stsc+stsz and checksummed, so a mis-parsed table
cannot hash-match.

Scope note (honest bar, same as the AVI/Ogg entries): the samples are
opaque payloads — codec bitstream decode belongs to the codec
entries; this module pins the CONTAINER layer, which is the part an
ingest pipeline needs to shard, route, and slice media at scale.

Reference parity note: the reference engine (C++ DuckDB<->Redis
connector, src/redis_scanner.cpp) has no media path; this module is
part of the beyond-reference LLM-pipeline surface the build brief
asks for.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "encode_mp4_payload",
    "decode_mp4",
    "synthesize_mp4_streams",
    "decode_mp4_features",
]


def _box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    """One box. ``large=True`` writes the spec's 64-bit form
    (size field = 1, real size in the following largesize)."""
    if large:
        return (
            struct.pack(">I4sQ", 1, btype, 16 + len(payload)) + payload
        )
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


# Closed-form synthesis contract (all SQL-replayable):
#   timescale  = 1000 + (doc_id % 5) * 200
#   n_samples  = 4 + doc_id % 6          (fixed delta 40 -> duration)
#   width      = 16 * (1 + doc_id % 3), height = 16 * (1 + doc_id % 2)
#   size_s     = 50 + (doc_id*7 + s*13) % 120
#   byte (s,j) = (doc_id*3 + s*11 + j*17) % 256
#   chunks     = 2: first ceil(n/2) samples, then the rest
MP4_SAMPLE_DELTA = 40
MP4_BRAND = b"isom"


def _mp4_params(doc_id: int) -> tuple:
    return (
        1000 + (doc_id % 5) * 200,          # timescale
        4 + doc_id % 6,                      # n_samples
        16 * (1 + doc_id % 3),               # width
        16 * (1 + doc_id % 2),               # height
    )


def _sample_bytes(doc_id: int, s: int) -> bytes:
    n = 50 + (doc_id * 7 + s * 13) % 120
    return bytes((doc_id * 3 + s * 11 + j * 17) % 256 for j in range(n))


def encode_mp4_payload(doc_id: int) -> bytes:
    """A minimal but spec-shaped progressive MP4: ftyp, moov with one
    'vide' track whose stbl fully describes the samples (stsd with a
    real 86-byte VisualSampleEntry, one-run stts, two-chunk stsc,
    explicit stsz, absolute stco), then mdat — written in the 64-bit
    largesize form so readers must handle it. stco offsets are
    ABSOLUTE file offsets, which forces the writer to lay out moov
    before mdat and know its own sizes — exactly the property the
    decoder verifies by extracting the samples."""
    timescale, n_samples, width, height = _mp4_params(doc_id)
    duration = n_samples * MP4_SAMPLE_DELTA
    samples = [_sample_bytes(doc_id, s) for s in range(n_samples)]
    c1 = (n_samples + 1) // 2
    chunk_sizes = [sum(len(b) for b in samples[:c1]),
                   sum(len(b) for b in samples[c1:])]

    ftyp = _box(b"ftyp", MP4_BRAND + struct.pack(">I", 0) + b"isomiso2")

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)      # volume 1.0
        + b"\x00" * 10                    # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)         # unity matrix
        + b"\x00" * 24                    # pre_defined
        + struct.pack(">I", 2),           # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"synth\x00",
    )
    # 86-byte VisualSampleEntry, fourcc 'raw ' (uncompressed)
    vse = (
        struct.pack(">I4s", 86, b"raw ")
        + b"\x00" * 6 + struct.pack(">H", 1)       # data_reference_index
        + b"\x00" * 16                              # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                      # frame_count
        + b"\x00" * 32                              # compressorname
        + struct.pack(">Hh", 24, -1)                # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + vse)
    stts = _full(
        b"stts", 0, 0,
        struct.pack(">III", 1, n_samples, MP4_SAMPLE_DELTA),
    )
    stsc_entries = [(1, c1, 1)]
    if n_samples - c1:
        stsc_entries.append((2, n_samples - c1, 1))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n_samples)
        + b"".join(struct.pack(">I", len(b)) for b in samples),
    )
    # stco needs absolute offsets: compute moov size with a stco
    # placeholder of the right length, then fill.
    def _assemble(stco_payload: bytes) -> bytes:
        stco = _full(b"stco", 0, 0, stco_payload)
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    placeholder = struct.pack(">I", 2) + struct.pack(">II", 0, 0)
    moov_len = len(_assemble(placeholder))
    # mdat in the 64-bit form: 16-byte header before the payload
    mdat_data_off = len(ftyp) + moov_len + 16
    offsets = [mdat_data_off, mdat_data_off + chunk_sizes[0]]
    moov = _assemble(
        struct.pack(">I", 2) + struct.pack(">II", *offsets)
    )
    mdat = _box(b"mdat", b"".join(samples), large=True)
    return ftyp + moov + mdat


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

# Boxes the single-track demux reads exactly one of. A second
# occurrence (a second trak's tkhd, repeated stbl atoms) must raise
# instead of silently overwriting the first — the flattened dict would
# otherwise misreport a multi-track file as its LAST track.
_REQUIRED_ONCE = (
    b"ftyp", b"mvhd", b"tkhd", b"mdhd", b"hdlr",
    b"stsd", b"stts", b"stsc", b"stsz", b"stco", b"mdat",
)


def decode_mp4(payload: bytes) -> dict:
    """Walk an ISO-BMFF file and demux its (single) track: iterative
    span-stack box walk (64-bit largesize honored, truncated boxes
    raise ValueError), sample-table parse, and FULL sample extraction
    through stco+stsc+stsz — returns
    {brand, timescale, duration, handler, width, height, n_samples,
    n_chunks, total_sample_bytes, sample_checksum} with
    sample_checksum = Σ (g+1)·byte over samples concatenated in
    decode order, so wrong offsets, sizes, or chunk runs cannot
    hash-match."""
    import numpy as np

    boxes: dict[bytes, bytes] = {}
    spans = [(0, len(payload))]
    while spans:
        pos, end = spans.pop()
        while pos + 8 <= end:
            size, btype = struct.unpack_from(">I4s", payload, pos)
            data_start = pos + 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError(f"truncated largesize box at {pos}")
                (size,) = struct.unpack_from(">Q", payload, pos + 8)
                data_start = pos + 16
            elif size == 0:  # box extends to the end of the file
                size = end - pos
            if size < data_start - pos or pos + size > end:
                raise ValueError(
                    f"box {btype!r} at {pos} overruns its container"
                )
            if btype in _CONTAINERS:
                spans.append((pos + size, end))
                pos, end = data_start, pos + size
                continue
            if btype in boxes and btype in _REQUIRED_ONCE:
                raise ValueError(
                    f"duplicate box {btype!r} at {pos}: this decoder's "
                    "contract is strict single-track"
                )
            boxes[btype] = payload[data_start : pos + size]
            pos += size
    for needed in _REQUIRED_ONCE:
        if needed not in boxes:
            raise ValueError(f"missing required box {needed!r}")
    brand = boxes[b"ftyp"][:4].decode("ascii")
    mvhd = boxes[b"mvhd"]
    if mvhd[0] != 0:
        raise ValueError("only version-0 mvhd supported here")
    timescale, duration = struct.unpack_from(">II", mvhd, 12)
    tkhd = boxes[b"tkhd"]
    w_fixed, h_fixed = struct.unpack_from(">II", tkhd, len(tkhd) - 8)
    handler = boxes[b"hdlr"][8:12].decode("ascii")
    stsd = boxes[b"stsd"]
    (n_desc,) = struct.unpack_from(">I", stsd, 4)
    if n_desc != 1:
        raise ValueError(f"expected 1 sample description, got {n_desc}")
    vse_w, vse_h = struct.unpack_from(">HH", stsd, 8 + 8 + 8 + 16)
    if (vse_w, vse_h) != (w_fixed >> 16, h_fixed >> 16):
        raise ValueError(
            f"stsd geometry {vse_w}x{vse_h} disagrees with tkhd "
            f"{w_fixed >> 16}x{h_fixed >> 16}"
        )
    stts = boxes[b"stts"]
    (n_runs,) = struct.unpack_from(">I", stts, 4)
    stts_total = 0
    stts_span = 0
    for i in range(n_runs):
        cnt, delta = struct.unpack_from(">II", stts, 8 + 8 * i)
        stts_total += cnt
        stts_span += cnt * delta
    if stts_span != duration:
        raise ValueError(
            f"stts spans {stts_span} ticks, mvhd says {duration}"
        )
    stsz = boxes[b"stsz"]
    fixed_size, n_samples = struct.unpack_from(">II", stsz, 4)
    if n_samples != stts_total:
        raise ValueError(
            f"stsz has {n_samples} samples, stts times {stts_total}"
        )
    sizes = (
        [fixed_size] * n_samples
        if fixed_size
        else list(struct.unpack_from(f">{n_samples}I", stsz, 12))
    )
    stsc = boxes[b"stsc"]
    (n_sc,) = struct.unpack_from(">I", stsc, 4)
    sc = [struct.unpack_from(">III", stsc, 8 + 12 * i) for i in range(n_sc)]
    stco = boxes[b"stco"]
    (n_chunks,) = struct.unpack_from(">I", stco, 4)
    offsets = struct.unpack_from(f">{n_chunks}I", stco, 8)
    # expand stsc runs into per-chunk sample counts
    per_chunk = []
    for i, (first, spc, _sdi) in enumerate(sc):
        last = sc[i + 1][0] - 1 if i + 1 < len(sc) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != n_chunks or sum(per_chunk) != n_samples:
        raise ValueError(
            f"stsc expands to {sum(per_chunk)} samples over "
            f"{len(per_chunk)} chunks; stco/stsz say "
            f"{n_chunks}/{n_samples}"
        )
    # extract every sample through the absolute chunk offsets
    out = bytearray()
    s = 0
    for ci, off in enumerate(offsets):
        pos = off
        for _ in range(per_chunk[ci]):
            if pos + sizes[s] > len(payload):
                raise ValueError(f"sample {s} overruns the file")
            out += payload[pos : pos + sizes[s]]
            pos += sizes[s]
            s += 1
    if len(out) != len(boxes[b"mdat"]):
        raise ValueError(
            f"extracted {len(out)} sample bytes, mdat holds "
            f"{len(boxes[b'mdat'])}"
        )
    a = np.frombuffer(bytes(out), dtype=np.uint8).astype(np.int64)
    g = np.arange(a.size, dtype=np.int64)
    return {
        "brand": brand,
        "timescale": int(timescale),
        "duration": int(duration),
        "handler": handler,
        "width": int(w_fixed >> 16),
        "height": int(h_fixed >> 16),
        "n_samples": int(n_samples),
        "n_chunks": int(n_chunks),
        "total_sample_bytes": int(a.size),
        "sample_checksum": int(((g + 1) * a).sum()),
    }


MP4_FEATURES_SCHEMA = (
    "doc_id long, brand string, timescale int, duration int, "
    "handler string, width int, height int, n_samples int, "
    "n_chunks int, total_sample_bytes int, sample_checksum long"
)


def synthesize_mp4_streams(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary): one real ISO-BMFF file per doc,
    synthesized in the workers."""
    from ..engine import ship_package

    def _synth(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_mp4_payload(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    ship_package(docs.sparkSession)
    return docs.select("doc_id").mapInPandas(
        _synth, schema="doc_id long, payload binary"
    )


def decode_mp4_features(media: DataFrame) -> DataFrame:
    """Box walk + sample extraction over a binary column in one narrow
    Arrow map — no shuffle, payloads never on the driver."""
    from ..engine import ship_package

    cols = [
        "brand", "timescale", "duration", "handler", "width", "height",
        "n_samples", "n_chunks", "total_sample_bytes", "sample_checksum",
    ]

    def _run(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                st = decode_mp4(bytes(payload))
                rows.append((int(did),) + tuple(st[c] for c in cols))
            out = pd.DataFrame(rows, columns=["doc_id"] + cols)
            for c in ("doc_id", "sample_checksum"):
                out[c] = out[c].astype("int64")
            for c in ("timescale", "duration", "width", "height",
                      "n_samples", "n_chunks", "total_sample_bytes"):
                out[c] = out[c].astype("int32")
            yield out

    ship_package(media.sparkSession)
    return media.select("doc_id", "payload").mapInPandas(
        _run, schema=MP4_FEATURES_SCHEMA
    )
