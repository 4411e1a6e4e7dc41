"""Dependency-free GIF encode + decode (GIF87a/89a, LZW).

Beyond-reference multimodal operator (the reference engine at
/root/reference has no media surface): GIF completes the everyday
image family alongside BMP/PPM/PNG/WebP/JPEG. Implemented from the
public GIF87a/89a specification:

* container: header, logical screen descriptor, global color table,
  image descriptor (with the 4-pass interlace flag), trailer; 0x21
  extension blocks are sub-block-skipped (89a graphic control etc.)
* LZW image data: variable-width codes 3..12 bits packed LSB-first
  into 255-byte-max sub-blocks, clear + end-of-information codes,
  dictionary growth with the standard width-bump rule (width++ when
  the next free code reaches 2^width), and the KwKwK self-reference
  case
* interlace: the 4-pass row order (8/8, 8/8+4, 4/4+2, 2/2+1)

Synthesis contract: the shared :func:`.multimodal._image_pixels`
closed form (every pixel distinct, so the palette is the image in
first-appearance order — n_colors = w*h is itself closed-form);
every second doc is interlaced. The oracle is the BMP-style pixel
statistics plus n_colors and the interlace flag read back from the
stream.
"""

from __future__ import annotations

import struct

MAX_CODE_WIDTH = 12


class _LsbWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc |= (value & ((1 << nbits) - 1)) << self._n
        self._n += nbits
        while self._n >= 8:
            self.buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self._n:
            out.append(self._acc & 0xFF)
        return bytes(out)


class _LsbReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, nbits: int) -> int:
        out = 0
        for i in range(nbits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            out |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return out


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """LZW-compress palette indices with min code size ``mcs``:
    leading clear code, dictionary of index strings, width bumps when
    the next free code reaches 2^width (cap 12: the dictionary then
    freezes until a clear — we simply keep emitting), trailing EOI."""
    clear = 1 << mcs
    eoi = clear + 1
    bw = _LsbWriter()
    width = mcs + 1
    table: dict[tuple[int, ...], int] = {
        (i,): i for i in range(1 << mcs)
    }
    next_code = eoi + 1
    bw.write(clear, width)
    run: tuple[int, ...] = ()
    for idx in indices:
        cand = run + (idx,)
        if cand in table:
            run = cand
            continue
        bw.write(table[run], width)
        if next_code < (1 << MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
            # One add LATER than the decoder's bump test: the reader's
            # dictionary lags this one by exactly one entry (it adds
            # the pair for code t only while reading code t+1), so the
            # width in effect when it READS the next code corresponds
            # to next_code - 1 here.
            if next_code - 1 == (1 << width) and width < MAX_CODE_WIDTH:
                width += 1
        run = (idx,)
    if run:
        bw.write(table[run], width)
    bw.write(eoi, width)
    return bw.getvalue()


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> list[int]:
    """Inverse of :func:`_lzw_encode`, incl. the KwKwK case; stops at
    EOI or once ``n_expected`` indices are recovered."""
    clear = 1 << mcs
    eoi = clear + 1
    br = _LsbReader(data)
    out: list[int] = []

    def reset() -> tuple[dict[int, tuple[int, ...]], int, int]:
        return (
            {i: (i,) for i in range(1 << mcs)},
            eoi + 1,
            mcs + 1,
        )

    table, next_code, width = reset()
    prev: tuple[int, ...] | None = None
    while len(out) < n_expected:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"invalid GIF LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code < (1 << MAX_CODE_WIDTH):
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError(
            f"GIF LZW stream ended after {len(out)} of "
            f"{n_expected} pixels"
        )
    return out[:n_expected]


INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _interlace_rows(h: int) -> list[int]:
    rows: list[int] = []
    for y0, dy in INTERLACE_PASSES:
        rows.extend(range(y0, h, dy))
    return rows


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_payload(doc_id: int) -> bytes:
    """A real GIF file for the shared image synthesis contract: global
    color table in first-appearance order (every contract pixel is
    distinct, so the palette is the image), LZW-compressed indices,
    and — every second doc — 4-pass interlacing."""
    from .multimodal import _image_pixels

    return gif_from_array(_image_pixels(doc_id), interlace=doc_id % 2 == 0)


def gif_from_array(px, interlace: bool = False) -> bytes:
    """Encode a top-down RGB uint8 array (h, w, 3) with <= 256
    distinct colors as a GIF87a file."""
    h, w, _ = px.shape
    palette: list[tuple[int, int, int]] = []
    index_of: dict[tuple[int, int, int], int] = {}
    indices: list[int] = []
    for row in px:
        for p in row:
            key = (int(p[0]), int(p[1]), int(p[2]))
            if key not in index_of:
                index_of[key] = len(palette)
                palette.append(key)
            indices.append(index_of[key])
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, got {len(palette)}")
    size_bits = max(1, (len(palette) - 1).bit_length())
    table_n = 1 << size_bits
    mcs = max(2, size_bits)
    if interlace:
        order = _interlace_rows(h)
        indices = [
            indices[y * w + x] for y in order for x in range(w)
        ]
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    out += bytes(3) * (table_n - len(palette))
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(mcs)
    out += _sub_blocks(_lzw_encode(indices, mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes):
    """Parse a GIF into (top-down RGB uint8 array (h, w, 3), n_colors,
    interlaced) — dependency-free. Walks the container (skipping 89a
    extension blocks), decompresses the LZW stream across sub-block
    boundaries, maps indices through the color table, and undoes the
    4-pass interlace."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not packed & 0x80:
        raise ValueError("GIF without a global color table")
    table_n = 2 << (packed & 0x07)
    table = payload[pos : pos + table_n * 3]
    if len(table) < table_n * 3:
        raise ValueError("GIF color table truncated")
    pos += table_n * 3
    while True:
        if pos >= len(payload):
            raise ValueError("GIF missing image descriptor")
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:
            break
        elif block == 0x3B:
            raise ValueError("GIF trailer before any image")
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
    pos += 10
    if (left, top, iw, ih) != (0, 0, w, h):
        raise ValueError("sub-rectangle GIF frames unsupported")
    if ipacked & 0x80:
        raise ValueError("local color tables unsupported")
    interlaced = bool(ipacked & 0x40)
    mcs = payload[pos]
    pos += 1
    if not 2 <= mcs <= 11:
        raise ValueError(f"invalid LZW min code size {mcs}")
    lzw = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-blocks truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        lzw += payload[pos : pos + n]
        pos += n
    indices = _lzw_decode(bytes(lzw), mcs, w * h)
    if max(indices) * 3 + 2 >= len(table):
        raise ValueError("GIF index outside the color table")
    flat = np.frombuffer(table, dtype=np.uint8)[: table_n * 3].reshape(
        table_n, 3
    )
    arr = flat[np.asarray(indices, dtype=np.int64)].reshape(h, w, 3)
    if interlaced:
        out = np.zeros_like(arr)
        out[_interlace_rows(h)] = arr
        arr = out
    n_colors = len({tuple(c) for c in flat[: table_n].tolist()})
    return arr.copy(), table_n, interlaced
