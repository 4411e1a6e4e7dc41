"""From-scratch DEFLATE (RFC 1951) and zlib (RFC 1950) inflater.

The one remaining library dependence in the codec family: PNG, TIFF
(compression 8/32946) and ZIP members all inflate through stdlib
``zlib``. This module decodes the bitstream itself — LSB-first bit
reader, stored blocks, the fixed Huffman tables, dynamic tables via
the code-length alphabet (symbols 16/17/18 repeats), canonical code
construction with an oversubscription check, and LZ77
length/distance copy-back — so deflate streams can be AUDITED
against an independent producer (every test stream is written by
zlib, a second implementation).

Scale role: this is the audit path, not the production path — at
100 TB inflation stays in stdlib zlib (C speed); the from-scratch
decoder exists so stream integrity can be re-derived without
trusting the library being audited, exactly like the parquet footer
walk re-derives the statistics pyarrow reports.

Strictness (everything raises ValueError): truncated bitstreams,
stored-block LEN/NLEN mismatches, reserved block type 3,
oversubscribed Huffman code sets, invalid (unassigned) codes,
length symbols 286/287, code-length repeats with no previous code,
distances reaching behind the start of output, zlib headers with a
bad check value / unknown method / preset dictionary, and Adler-32
mismatches.

Reference parity note: the reference engine has no decompression
surface (redduck_extension.cpp delegates all I/O to host DuckDB);
this is beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

__all__ = ["inflate", "inflate_zlib", "gunzip", "deflate_audit"]

_LEN_BASE = (
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
    51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258,
)
_LEN_EXTRA = (
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4,
    4, 4, 5, 5, 5, 5, 0,
)
_DIST_BASE = (
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257,
    385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289,
    16385, 24577,
)
_DIST_EXTRA = (
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9,
    10, 10, 11, 11, 12, 12, 13, 13,
)
# RFC 1951 §3.2.7: the order in which code-length code lengths appear
_CLEN_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)


class _Bits:
    """LSB-first bit reader over a bytes object (RFC 1951 §3.1.1:
    data elements are packed starting at the least-significant bit)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # in bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated deflate stream")
        out = 0
        for i in range(n):
            p = self.pos + i
            out |= ((self.data[p >> 3] >> (p & 7)) & 1) << i
        self.pos = end
        return out

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_bytes(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        start = self.pos >> 3
        if start + n > len(self.data):
            raise ValueError("truncated deflate stream")
        self.pos += n * 8
        return self.data[start : start + n]


class _Huffman:
    """Canonical Huffman decoder built from code lengths (RFC 1951
    §3.2.2). Decoding walks the bitstream one bit at a time,
    accumulating the code MSB-first as the spec packs Huffman codes."""

    __slots__ = ("table", "max_len")

    def __init__(self, lengths):
        counts = [0] * 16
        for ln in lengths:
            if ln < 0 or ln > 15:
                raise ValueError(f"code length {ln} out of range")
            if ln:
                counts[ln] += 1
        # Kraft sum: an oversubscribed set is a malformed table
        over = sum(counts[ln] << (15 - ln) for ln in range(1, 16))
        if over > 1 << 15:
            raise ValueError("oversubscribed Huffman code set")
        next_code = [0] * 16
        code = 0
        for ln in range(1, 16):
            code = (code + counts[ln - 1]) << 1
            next_code[ln] = code
        table = {}
        for sym, ln in enumerate(lengths):
            if ln:
                table[(ln, next_code[ln])] = sym
                next_code[ln] += 1
        self.table = table
        self.max_len = max((ln for ln in lengths if ln), default=0)

    def decode(self, bits: _Bits) -> int:
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | bits.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in deflate stream")


_FIXED_LIT = _Huffman(
    [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
)
_FIXED_DIST = _Huffman([5] * 30)


def _read_dynamic_tables(bits: _Bits):
    hlit = bits.read(5) + 257
    hdist = bits.read(5) + 1
    hclen = bits.read(4) + 4
    clen_lengths = [0] * 19
    for i in range(hclen):
        clen_lengths[_CLEN_ORDER[i]] = bits.read(3)
    clen = _Huffman(clen_lengths)
    lengths = []
    while len(lengths) < hlit + hdist:
        sym = clen.decode(bits)
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise ValueError("code-length repeat with no previous code")
            lengths.extend([lengths[-1]] * (3 + bits.read(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + bits.read(3)))
        else:  # 18
            lengths.extend([0] * (11 + bits.read(7)))
    if len(lengths) != hlit + hdist:
        raise ValueError("code-length run overflows the table")
    return _Huffman(lengths[:hlit]), _Huffman(lengths[hlit:])


def inflate(data: bytes) -> bytes:
    """Decode a raw DEFLATE stream (RFC 1951) — the format inside
    zlib, gzip, ZIP method 8, and PNG IDAT."""
    bits = _Bits(data)
    out = bytearray()
    while True:
        bfinal = bits.read(1)
        btype = bits.read(2)
        if btype == 0:
            bits.align()
            ln, nln = (
                int.from_bytes(bits.read_bytes(2), "little"),
                int.from_bytes(bits.read_bytes(2), "little"),
            )
            if ln ^ nln != 0xFFFF:
                raise ValueError("stored block LEN/NLEN mismatch")
            out += bits.read_bytes(ln)
        elif btype in (1, 2):
            lit, dist = (
                (_FIXED_LIT, _FIXED_DIST)
                if btype == 1
                else _read_dynamic_tables(bits)
            )
            while True:
                sym = lit.decode(bits)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError(f"invalid length symbol {sym}")
                    length = _LEN_BASE[sym - 257] + bits.read(
                        _LEN_EXTRA[sym - 257]
                    )
                    dsym = dist.decode(bits)
                    if dsym > 29:
                        raise ValueError(f"invalid distance symbol {dsym}")
                    d = _DIST_BASE[dsym] + bits.read(_DIST_EXTRA[dsym])
                    if d > len(out):
                        raise ValueError(
                            "distance reaches behind start of output"
                        )
                    # overlapping copy is the point (run-length)
                    for _ in range(length):
                        out.append(out[-d])
        else:
            raise ValueError("reserved deflate block type 3")
        if bfinal:
            return bytes(out)


def inflate_zlib(data: bytes) -> bytes:
    """Decode a zlib-wrapped stream (RFC 1950): CMF/FLG header checks
    and trailing Adler-32 verification around :func:`inflate`."""
    if len(data) < 6:
        raise ValueError("zlib stream shorter than header + trailer")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError(f"zlib method {cmf & 0x0F} is not deflate")
    if (cmf << 8 | flg) % 31 != 0:
        raise ValueError("zlib header check failed")
    if flg & 0x20:
        raise ValueError("preset dictionary not supported")
    out = inflate(data[2:-4])
    # Adler-32, computed from scratch (mod 65521 over the output)
    a, b = 1, 0
    for byte in out:
        a = (a + byte) % 65521
        b = (b + a) % 65521
    want = int.from_bytes(data[-4:], "big")
    if (b << 16 | a) != want:
        raise ValueError("Adler-32 mismatch")
    return out


DEFLATE_AUDIT_SCHEMA = "doc_id long, n_raw int, wrapper string, txt_md5 string"


def deflate_audit(docs):
    """Deflate-stream audit over the corpus: compress each doc's text
    with stdlib zlib/gzip (the INDEPENDENT producers; compression
    level varies with doc_id so stored, fixed- and dynamic-Huffman
    blocks all appear; doc_id % 3 routes the wrapper — raw deflate,
    the RFC 1950 zlib wrapper with its Adler-32 trailer, or a full
    RFC 1952 gzip member), then decode the stream with the
    from-scratch inflater and hash the RECOVERED bytes — the oracle
    recomputes the md5 from the source column, so a mis-inflated
    byte anywhere cannot hash-match. One narrow Arrow map, no
    shuffle; streams never on the driver."""
    from collections.abc import Iterator

    import pandas as pd

    from ..engine import ship_package

    def _run(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip as _gzip
        import hashlib
        import zlib

        for pdf in batch_iter:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                raw = ("" if text is None else text).encode("utf-8")
                level = did % 10  # 0 = stored blocks .. 9 = max dynamic
                route = did % 3
                if route == 1:
                    co = zlib.compressobj(level, zlib.DEFLATED, -15)
                    got = inflate(co.compress(raw) + co.flush())
                    wrapper = "raw"
                elif route == 2:
                    got = gunzip(_gzip.compress(raw, level, mtime=0))
                    wrapper = "gzip"
                else:
                    got = inflate_zlib(zlib.compress(raw, level))
                    wrapper = "zlib"
                rows.append(
                    (did, len(got), wrapper, hashlib.md5(got).hexdigest())
                )
            out = pd.DataFrame(
                rows, columns=["doc_id", "n_raw", "wrapper", "txt_md5"]
            )
            out["doc_id"] = out["doc_id"].astype("int64")
            out["n_raw"] = out["n_raw"].astype("int32")
            yield out

    ship_package(docs.sparkSession)
    return docs.select("doc_id", "text").mapInPandas(
        _run, schema=DEFLATE_AUDIT_SCHEMA
    )


def gunzip(data: bytes) -> bytes:
    """Decode a gzip member (RFC 1952): magic/method/flag checks,
    the four optional fields (FEXTRA, FNAME, FCOMMENT, FHCRC) walked
    in spec order, :func:`inflate` on the body, then CRC-32 and
    ISIZE trailer verification — the audit path for the stdlib-gzip
    corpus-ingest hop, as :func:`inflate_zlib` is for PNG/TIFF/ZIP."""
    import zlib as _zlib  # crc32 only — the table-driven checksum

    if len(data) < 18:
        raise ValueError("gzip member shorter than header + trailer")
    if data[:2] != b"\x1f\x8b":
        raise ValueError("bad gzip magic")
    if data[2] != 8:
        raise ValueError(f"gzip method {data[2]} is not deflate")
    flg = data[3]
    if flg & 0xE0:
        raise ValueError("reserved gzip FLG bits set")
    pos = 10
    if flg & 0x04:  # FEXTRA
        (xlen,) = _unpack_le16(data, pos)
        pos += 2 + xlen
    if flg & 0x08:  # FNAME
        pos = _skip_cstr(data, pos)
    if flg & 0x10:  # FCOMMENT
        pos = _skip_cstr(data, pos)
    if flg & 0x02:  # FHCRC
        (want,) = _unpack_le16(data, pos)
        if _zlib.crc32(data[:pos]) & 0xFFFF != want:
            raise ValueError("gzip header CRC16 mismatch")
        pos += 2
    if pos > len(data) - 8:
        raise ValueError("gzip header overruns the member")
    out = inflate(data[pos:-8])
    crc = int.from_bytes(data[-8:-4], "little")
    isize = int.from_bytes(data[-4:], "little")
    if _zlib.crc32(out) & 0xFFFFFFFF != crc:
        raise ValueError("gzip CRC-32 mismatch")
    if len(out) & 0xFFFFFFFF != isize:
        raise ValueError("gzip ISIZE mismatch")
    return out


def _unpack_le16(data: bytes, pos: int):
    if pos + 2 > len(data):
        raise ValueError("truncated gzip header field")
    return (int.from_bytes(data[pos : pos + 2], "little"),)


def _skip_cstr(data: bytes, pos: int) -> int:
    end = data.find(b"\x00", pos)
    if end < 0:
        raise ValueError("unterminated gzip header string")
    return end + 1
