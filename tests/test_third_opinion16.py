"""Third-opinion audit, batch 16 (r17): the TIFF and GIF codecs —
the two remaining container formats whose strip/stream compression
(PackBits, TIFF-LZW with early change, deflate+predictor, GIF-LZW)
the batch-13 audits did not cover.

Independent decoders typed straight from the public specs (TIFF 6.0
§§8/13, Apple PackBits, GIF87a appendix): an MSB-first TIFF-LZW
reader, an LSB-first GIF-LZW reader, a PackBits expander, a full IFD
walk honoring BOTH byte orders and the left-justified inline-SHORT
rule, predictor-2 undo, strip assembly, GIF sub-block reassembly,
palette mapping and 4-pass deinterlace — all plain python loops, no
product helpers. The product encoders feed the independent decoders
(proving the synthesized corpus is made of real files); long
pseudo-random streams force the LZW width bumps and the 4094-entry
clear that the tiny contract images never reach.

Entries audited here: multimodal_decode_tiff, multimodal_decode_gif.
"""

from __future__ import annotations

import zlib

import pytest

from duckdb_redis_olap_scanner_spark.operators import gif as G
from duckdb_redis_olap_scanner_spark.operators import multimodal as M
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR

DOC_IDS = list(range(0, 32)) + [97, 101, 211, 509]


def ref_image(d: int) -> tuple[int, int, list[int]]:
    w, h = 4 + d % 13, 2 + d % 7
    return w, h, [(d * 7 + k) % 256 for k in range(w * h * 3)]


# ---------------------------------------------------------------------------
# independent PackBits expander
# ---------------------------------------------------------------------------

def ind_packbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    it = iter(range(len(data)))
    i = 0
    while i < len(data) and len(out) < expected:
        c = data[i]
        i += 1
        if c == 128:
            continue
        if c <= 127:
            out += data[i : i + c + 1]
            i += c + 1
        else:
            out += bytes([data[i]]) * (257 - c)
            i += 1
    assert len(out) == expected, (len(out), expected)
    return bytes(out)


def _prand(n: int, seed: int) -> bytes:
    """Deterministic pseudo-random bytes (no Math.random in audits):
    a xorshift-ish integer recurrence."""
    x = seed or 1
    out = bytearray()
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("seed", [1, 7, 40, 97])
def test_packbits_independent_expander(seed):
    # runs + literals: interleave repeated and varying segments
    raw = bytearray()
    for j, b in enumerate(_prand(200, seed)):
        raw += bytes([b]) * (1 + (b % 5))
    raw = bytes(raw)
    assert ind_packbits(M.packbits_encode(raw), len(raw)) == raw


# ---------------------------------------------------------------------------
# independent TIFF-LZW reader (MSB-first, early change, clear at 4094)
# ---------------------------------------------------------------------------

def ind_tiff_lzw(data: bytes, expected: int) -> bytes:
    acc = nacc = pos = 0

    def read(width: int) -> int:
        nonlocal acc, nacc, pos
        while nacc < width:
            acc = (acc << 8) | data[pos]
            pos += 1
            nacc += 8
        nacc -= width
        code = (acc >> nacc) & ((1 << width) - 1)
        return code

    out = bytearray()
    table: dict[int, bytes] = {}
    next_code, width = 258, 9
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == 256:  # clear
            table, next_code, width, prev = {}, 258, 9, None
            continue
        if code == 257:  # EOI
            break
        if code < 256:
            entry = bytes([code])
        elif code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise AssertionError(f"bad TIFF LZW code {code}")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
        prev = entry
        # TIFF early change: the decoder's table lags the encoder's
        # by one entry, so where the encoder bumps at 2^w - 1 the
        # reader must bump at 2^w - 2 (TIFF 6.0 §13 / libtiff)
        if next_code == (1 << width) - 2 and width < 12:
            width += 1
    assert len(out) == expected, (len(out), expected)
    return bytes(out)


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_tiff_lzw_independent_reader_short_and_long(seed):
    short = _prand(150, seed)
    assert ind_tiff_lzw(M.tiff_lzw_encode(short), len(short)) == short
    # 12000 near-random bytes force width bumps 9->10->11->12 and the
    # 4094-entry table clear
    long = _prand(12000, seed * 1000)
    assert ind_tiff_lzw(M.tiff_lzw_encode(long), len(long)) == long
    # and a compressible stream (few table adds per output byte)
    comp = bytes(bytearray(_prand(300, seed)) * 40)
    assert ind_tiff_lzw(M.tiff_lzw_encode(comp), len(comp)) == comp


# ---------------------------------------------------------------------------
# independent full TIFF parse (both byte orders, inline-SHORT rule,
# strip assembly, predictor-2 undo)
# ---------------------------------------------------------------------------

def ind_decode_tiff(payload: bytes):
    bo = payload[:2]
    assert bo in (b"II", b"MM")
    order = "little" if bo == b"II" else "big"

    def u16(off: int) -> int:
        return int.from_bytes(payload[off : off + 2], order)

    def u32(off: int) -> int:
        return int.from_bytes(payload[off : off + 4], order)

    assert u16(2) == 42
    ifd = u32(4)
    n_tags = u16(ifd)
    tags: dict[int, tuple[int, int, int]] = {}
    for t in range(n_tags):
        e = ifd + 2 + 12 * t
        tags[u16(e)] = (u16(e + 2), u32(e + 4), e + 8)  # type, count, slot
    def short1(tag: int, default: int) -> int:
        if tag not in tags:
            return default
        typ, count, slot = tags[tag]
        assert typ == 3 and count == 1
        # inline SHORT is LEFT-JUSTIFIED in the value slot: the first
        # two bytes under BOTH byte orders (TIFF 6.0 §2)
        return u16(slot)

    def long1(tag: int) -> int:
        typ, count, slot = tags[tag]
        assert count == 1
        return u32(slot)

    def long_array(tag: int) -> list[int]:
        typ, count, slot = tags[tag]
        if count == 1:
            return [u32(slot)]
        arr_off = u32(slot)
        return [u32(arr_off + 4 * i) for i in range(count)]

    w, h = long1(256), long1(257)
    comp = short1(259, 1)
    predictor = short1(317, 1)
    rps = long1(278)
    offs = long_array(273)
    cnts = long_array(279)
    assert len(offs) == len(cnts)
    flat = bytearray()
    for si, (o, c) in enumerate(zip(offs, cnts)):
        rows_here = min(rps, h - si * rps)
        expected = rows_here * w * 3
        strip = payload[o : o + c]
        if comp == 1:
            raw = bytes(strip)
        elif comp == 32773:
            raw = ind_packbits(strip, expected)
        elif comp == 5:
            raw = ind_tiff_lzw(strip, expected)
        elif comp == 8:
            raw = zlib.decompress(strip)
        else:
            raise AssertionError(f"unexpected compression {comp}")
        assert len(raw) == expected
        if predictor == 2:
            und = bytearray(raw)
            for y in range(rows_here):
                base = y * w * 3
                for i in range(3, w * 3):
                    und[base + i] = (und[base + i] + und[base + i - 3]) & 0xFF
            raw = bytes(und)
        flat += raw
    return w, h, len(offs), bo.decode(), comp, list(flat)


@pytest.mark.parametrize("d", DOC_IDS)
def test_tiff_independent_parser_reads_product_files(d):
    w, h, v = ref_image(d)
    iw, ih, n_strips, bo, comp, flat = ind_decode_tiff(
        M.encode_tiff_payload(d)
    )
    assert (iw, ih, flat) == (w, h, v)
    # synthesis rules read back from the stream
    rps = 1 + d % 3
    assert n_strips == -(-h // rps)
    assert bo == ("II" if d % 2 == 0 else "MM")
    want_comp = {2: 32773, 3: 32773, 4: 5, 5: 5, 6: 8, 7: 8}.get(d % 8, 1)
    assert comp == want_comp


# ---------------------------------------------------------------------------
# independent GIF decoder (LSB-first LZW, sub-blocks, palette,
# 4-pass deinterlace)
# ---------------------------------------------------------------------------

def ind_gif_lzw(data: bytes, mcs: int, n_expected: int) -> list[int]:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    acc = nacc = pos = 0

    def read(width: int) -> int:
        nonlocal acc, nacc, pos
        while nacc < width:
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        return code

    out: list[int] = []
    table: dict[int, tuple[int, ...]] = {}
    next_code, width = eoi + 1, mcs + 1
    prev: tuple[int, ...] | None = None
    while len(out) < n_expected:
        code = read(width)
        if code == clear:
            table, next_code, width, prev = {}, eoi + 1, mcs + 1, None
            continue
        if code == eoi:
            break
        if code < clear:
            entry = (code,)
        elif code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise AssertionError(f"bad GIF LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    assert len(out) >= n_expected
    return out[:n_expected]


def ind_decode_gif(payload: bytes):
    assert payload[:6] in (b"GIF87a", b"GIF89a")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    assert packed & 0x80
    table_n = 2 << (packed & 0x07)
    pos = 13
    palette = [
        tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(table_n)
    ]
    pos += table_n * 3
    while payload[pos] == 0x21:  # extensions
        pos += 2
        while payload[pos]:
            pos += 1 + payload[pos]
        pos += 1
    assert payload[pos] == 0x2C
    iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
    ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
    interlaced = bool(payload[pos + 9] & 0x40)
    assert (iw, ih) == (w, h)
    pos += 10
    mcs = payload[pos]
    pos += 1
    stream = bytearray()
    while payload[pos]:
        n = payload[pos]
        stream += payload[pos + 1 : pos + 1 + n]
        pos += 1 + n
    indices = ind_gif_lzw(bytes(stream), mcs, w * h)
    if interlaced:
        order = []
        for y0, dy in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(y0, h, dy))
        deint = [0] * (w * h)
        for src_row, y in enumerate(order):
            deint[y * w : (y + 1) * w] = indices[
                src_row * w : (src_row + 1) * w
            ]
        indices = deint
    flat: list[int] = []
    for idx in indices:
        flat.extend(palette[idx])
    return w, h, table_n, interlaced, flat


@pytest.mark.parametrize("d", DOC_IDS)
def test_gif_independent_decoder_reads_product_files(d):
    w, h, v = ref_image(d)
    iw, ih, table_n, interlaced, flat = ind_decode_gif(
        G.encode_gif_payload(d)
    )
    assert (iw, ih, flat) == (w, h, v)
    assert interlaced == (d % 2 == 0)
    # table_n is the next power of two >= distinct contract colors
    n_colors = len({tuple(v[3 * i : 3 * i + 3]) for i in range(w * h)})
    assert table_n == 1 << max(1, (n_colors - 1).bit_length())


def test_gif_lzw_width_bumps_on_large_image():
    """The contract images are too small to bump the LZW code width;
    a 64x64 image over a 256-color palette forces 9->10->11 bit codes
    through the independent reader."""
    import numpy as np

    k = np.arange(64 * 64, dtype=np.int64)
    px = np.stack(
        [(k * 7) % 256, (k * 13) % 256, (k // 256) % 256], axis=1
    ).astype(np.uint8)
    # cap distinct colors at 256: quantize the triple to its first
    # byte's value class
    px[:, 1] = px[:, 0]
    px[:, 2] = 255 - px[:, 0]
    px = px.reshape(64, 64, 3)
    payload = G.gif_from_array(px, interlace=False)
    w, h, _tn, _il, flat = ind_decode_gif(payload)
    assert (w, h) == (64, 64)
    assert flat == px.reshape(-1).tolist()


# ---------------------------------------------------------------------------
# end-to-end: the two entries' Spark rows from the independent parsers
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401

    return catalog.registry()


def _weighted(xs: list[int]) -> int:
    return sum((i + 1) * x for i, x in enumerate(xs))


def test_entry_tiff_rows_match_independent_parse(reg, spark):
    rows = {
        int(r[0]): tuple(r)
        for r in reg["multimodal_decode_tiff"].fn(spark, SF_DIR).collect()
    }
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:24]:
        w, h, n_strips, bo, comp, flat = ind_decode_tiff(
            M.encode_tiff_payload(did)
        )
        assert row == (
            did, w, h, n_strips, bo, comp,
            sum(flat[0::3]), sum(flat[1::3]), sum(flat[2::3]),
            _weighted(flat),
        ), f"tiff doc {did}"


def test_entry_gif_rows_match_independent_parse(reg, spark):
    rows = {
        int(r[0]): tuple(r)
        for r in reg["multimodal_decode_gif"].fn(spark, SF_DIR).collect()
    }
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:24]:
        w, h, table_n, interlaced, flat = ind_decode_gif(
            G.encode_gif_payload(did)
        )
        assert row == (
            did, w, h, table_n, interlaced,
            sum(flat[0::3]), sum(flat[1::3]), sum(flat[2::3]),
            _weighted(flat),
        ), f"gif doc {did}"


@pytest.mark.parametrize("d", [0, 5, 26])
def test_audit_has_teeth_corruption_is_detected(d):
    """Sanity of the audit itself: corrupting strip/stream data must
    change the independent decode or make it raise — these parsers
    really read the compressed bytes."""
    w, h, v = ref_image(d)
    # TIFF: flip the FIRST byte of the first strip (the last payload
    # byte can be LZW EOI/pad bits a correct reader never consumes) —
    # locate it through tag 273, honoring the byte order
    p = bytearray(M.encode_tiff_payload(d))
    order = "little" if p[:2] == b"II" else "big"

    def u(off, n):
        return int.from_bytes(p[off : off + n], order)

    ifd = u(4, 4)
    first_strip = None
    for t in range(u(ifd, 2)):
        e = ifd + 2 + 12 * t
        if u(e, 2) == 273:
            slot = u(e + 8, 4)
            first_strip = slot if u(e + 4, 4) == 1 else u(slot, 4)
    p[first_strip] ^= 0xFF
    try:
        flat = ind_decode_tiff(bytes(p))[5]
        detected = flat != v
    except Exception:
        detected = True
    assert detected
    # GIF: flip a byte inside the first LZW sub-block (after the
    # image descriptor + min-code-size byte)
    p = bytearray(G.encode_gif_payload(d))
    desc = bytes(p).index(b"\x2c")
    p[desc + 12] ^= 0xFF  # descriptor(10) + mcs(1) + block len(1)
    try:
        flat = ind_decode_gif(bytes(p))[4]
        detected = flat != v
    except (AssertionError, IndexError, KeyError):
        detected = True
    assert detected
