"""Dependency-free WebP-lossless (VP8L) encode + decode.

Beyond-reference multimodal operator (the reference engine at
/root/reference has no media surface): WebP was the last image format
on the codec-library-gated list after round 9's baseline/4:2:0 JPEG.
This module implements the LOSSLESS VP8L bitstream — the container
(RIFF/WEBP/VP8L), the LSB-first bit packing, canonical prefix codes
transmitted through the DEFLATE-style code-length code (symbols
16/17/18, the 19-entry reorder table), the subtract-green transform,
and the color cache — from the public WebP lossless bitstream
specification.

Scope (honest gates, same policy as :mod:`.jpeg` / :mod:`.flac`):

* The encoder emits literal + color-cache + LZ77 backward-reference
  streams with the subtract-green transform signalled and real
  per-channel canonical Huffman codes (simple 1/2-symbol codes where
  the alphabet allows, full code-length-coded codes otherwise). The
  matcher is greedy single-candidate (most recent occurrence,
  extended forward, overlap allowed) — every real-encoder wire
  feature of the lossless literal plane is exercised: length and
  distance prefix codes with extra bits, the 120-entry 2D
  distance-offset map, direct scan-order distances past it.
* The decoder handles everything that plane can contain — simple and
  normal prefix codes, all five per-group codes, any color-cache
  size, LZ77 backward references (both mapped and direct distances,
  overlapping copies, cache insertion of copied pixels), and the
  subtract-green transform — and raises ``NotImplementedError``
  loudly for predictor/color/palette transforms and Huffman images
  (spatially varying meta codes), which this encoder never produces
  and which would need the spec's full predictor tables.

Synthesis contract: a vertically TILED variant of the shared
:func:`.multimodal._image_pixels` closed form (rows repeat with
period ``tile = 1 + doc_id % 11``), so real-encoder-style backward
references arise naturally (row y >= tile copies row y - tile at
scan distance tile·width) while the DuckDB oracle stays a pure
closed-form image-statistics SQL (payload size omitted — it is
compression-dependent).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# LSB-first bit I/O (VP8L packs like DEFLATE: first bit = LSB of byte 0)
# ---------------------------------------------------------------------------


class _LsbBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc |= (value & ((1 << nbits) - 1)) << self._nbits
        self._nbits += nbits
        while self._nbits >= 8:
            self.buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes go MSB-first into the LSB-first stream."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self._nbits:
            out.append(self._acc & 0xFF)
        return bytes(out)


class _LsbBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        out = 0
        for i in range(nbits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            out |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return out


# ---------------------------------------------------------------------------
# Canonical prefix codes (DEFLATE-style: codes assigned by (length,
# symbol) order; decoder matches MSB-first accumulated bits)
# ---------------------------------------------------------------------------

CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                     13, 14, 15]
MAX_CODE_LENGTH = 15


def _package_merge(freqs: dict[int, int], cap: int) -> dict[int, int]:
    """Optimal length-limited code lengths (package-merge / coin
    collector): symbol length = number of the cheapest 2(n-1)
    first-level items it appears in across the cap merge levels."""
    syms = sorted(freqs)
    n = len(syms)
    if (1 << cap) < n:
        raise ValueError(f"alphabet of {n} cannot fit in {cap}-bit codes")
    # items are (weight, {sym: count}); level 0 = one item per symbol
    packages: list[tuple[int, dict[int, int]]] = sorted(
        ((freqs[s], {s: 1}) for s in syms), key=lambda t: t[0]
    )
    for _ in range(cap - 1):
        merged = []
        for i in range(0, len(packages) - 1, 2):
            wa, ca = packages[i]
            wb, cb = packages[i + 1]
            comb = dict(ca)
            for s, c in cb.items():
                comb[s] = comb.get(s, 0) + c
            merged.append((wa + wb, comb))
        packages = sorted(
            merged + [(freqs[s], {s: 1}) for s in syms],
            key=lambda t: t[0],
        )
    depth = {s: 0 for s in syms}
    for _w, counts in packages[: 2 * (n - 1)]:
        for s, c in counts.items():
            depth[s] += c
    return depth


def huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code length per symbol from frequencies (heap Huffman). If the
    unconstrained tree exceeds the format's 15-bit cap (possible for
    arbitrary caller-supplied images with skewed, Fibonacci-like
    frequencies), fall back to optimal length-limited package-merge
    instead of emitting an undecodable stream (round-9 ADVICE: this
    was an assert, stripped under ``python -O``)."""
    import heapq

    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(freqs[s], [s]) for s in syms]
    depth = {s: 0 for s in syms}
    heapq.heapify(heap)
    while len(heap) > 1:
        fa, sa = heapq.heappop(heap)
        fb, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, sa + sb))
    if max(depth.values()) > MAX_CODE_LENGTH:
        return _package_merge(
            {s: freqs[s] for s in syms}, MAX_CODE_LENGTH
        )
    return depth


def canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical: sorted by (length, symbol)."""
    code = 0
    prev_len = 0
    out = {}
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


class _PrefixDecoder:
    def __init__(self, lengths: dict[int, int]) -> None:
        self.by_code = {
            (ln, code): sym
            for sym, (code, ln) in canonical_codes(lengths).items()
        }
        self.max_len = max((ln for ln in lengths.values()), default=0)
        # single-symbol degenerate code: spec says zero bits are read
        self.only = next(iter(lengths)) if len(lengths) == 1 else None

    def read(self, br: _LsbBitReader) -> int:
        if self.only is not None:
            return self.only
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.by_code.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _write_code_lengths(bw: _LsbBitWriter, lengths: dict[int, int],
                        alphabet_size: int) -> None:
    """Emit a 'normal' code: code-length-code + RLE-coded lengths."""
    lens = [lengths.get(s, 0) for s in range(alphabet_size)]
    # RLE per DEFLATE/VP8L: 16 = repeat prev 3-6, 17 = zeros 3-10,
    # 18 = zeros 11-138
    tokens: list[tuple[int, int]] = []  # (symbol, extra)
    i = 0
    while i < len(lens):
        v = lens[i]
        run = 1
        while i + run < len(lens) and lens[i + run] == v:
            run += 1
        if v == 0:
            r = run
            while r >= 11:
                take = min(r, 138)
                tokens.append((18, take - 11))
                r -= take
            while r >= 3:
                take = min(r, 10)
                tokens.append((17, take - 3))
                r -= take
            tokens.extend([(0, 0)] * r)
        else:
            tokens.append((v, 0))
            r = run - 1
            while r >= 3:
                take = min(r, 6)
                tokens.append((16, take - 3))
                r -= take
            tokens.extend([(v, 0)] * r)
        i += run
    clc_freq: dict[int, int] = {}
    for sym, _ in tokens:
        clc_freq[sym] = clc_freq.get(sym, 0) + 1
    clc_len = huffman_lengths(clc_freq)
    if len(clc_len) == 1:
        # a 1-symbol code-length code cannot round-trip through the
        # canonical tables (codes need >= 1 bit on the wire here), so
        # pad with an unused symbol of equal length
        pad = next(s for s in CODE_LENGTH_ORDER if s not in clc_len)
        clc_len = {next(iter(clc_len)): 1, pad: 1}
    # num_code_lengths: enough of the reorder table to cover used syms
    used = max(
        (idx for idx, s in enumerate(CODE_LENGTH_ORDER)
         if clc_len.get(s, 0) > 0),
        default=0,
    ) + 1
    num_cl = max(used, 4)
    bw.write(num_cl - 4, 4)
    for idx in range(num_cl):
        bw.write(clc_len.get(CODE_LENGTH_ORDER[idx], 0), 3)
    bw.write(0, 1)  # no explicit max_symbol
    codes = canonical_codes(clc_len)
    for sym, extra in tokens:
        c, ln = codes[sym]
        bw.write_code(c, ln)
        if sym == 16:
            bw.write(extra, 2)
        elif sym == 17:
            bw.write(extra, 3)
        elif sym == 18:
            bw.write(extra, 7)


def _read_code_lengths(br: _LsbBitReader,
                       alphabet_size: int) -> dict[int, int]:
    num_cl = br.read(4) + 4
    clc_len = {}
    for idx in range(num_cl):
        ln = br.read(3)
        if ln:
            clc_len[CODE_LENGTH_ORDER[idx]] = ln
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    dec = _PrefixDecoder(clc_len)
    lens: dict[int, int] = {}
    sym = 0
    prev = 8
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = dec.read(br)
        if s < 16:
            if s:
                lens[sym] = s
                prev = s
            sym += 1
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lens[sym] = prev
                    sym += 1
        elif s == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return lens


def _write_prefix_code(bw: _LsbBitWriter, lengths: dict[int, int],
                       alphabet_size: int) -> None:
    syms = sorted(lengths)
    if 1 <= len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple code
        bw.write(len(syms) - 1, 1)
        first = syms[0]
        if first <= 1:
            bw.write(0, 1)  # first symbol in 1 bit
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)  # normal code
    _write_code_lengths(bw, lengths, alphabet_size)


def _read_prefix_code(br: _LsbBitReader, alphabet_size: int) -> _PrefixDecoder:
    if br.read(1):  # simple
        n = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = {first: 1}
        if n == 2:
            lengths[br.read(8)] = 1
        else:
            return _PrefixDecoder({first: 1})
        return _PrefixDecoder(lengths)
    return _PrefixDecoder(_read_code_lengths(br, alphabet_size))


# ---------------------------------------------------------------------------
# Color cache
# ---------------------------------------------------------------------------

_CACHE_MULT = 0x1E35A7BD


def _cache_index(argb: int, cache_bits: int) -> int:
    return ((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# ---------------------------------------------------------------------------
# LZ77 backward references: the spec's prefix-coded lengths/distances
# and the 120-entry 2D distance-offset map
# ---------------------------------------------------------------------------

# The spec's close-neighborhood map: distance codes 1..120 name pixels
# at these (dx, dy) scan offsets (dy rows up, dx columns left-negative
# /right-positive); codes > 120 are scan-order distances minus 120.
DIST_MAP: list[tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
assert len(DIST_MAP) == 120
_DIST_CODE_BY_OFFSET = {off: idx + 1 for idx, off in enumerate(DIST_MAP)}

MAX_LZ77_LENGTH = 4096  # largest value the 24 length prefix codes carry
MIN_MATCH = 3


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (>=1) → (prefix_code, n_extra_bits, extra_value), the
    spec's LZ77 prefix coding shared by lengths and distance codes."""
    if value < 1:
        raise ValueError(f"LZ77 prefix values start at 1, got {value}")
    if value <= 4:
        return value - 1, 0, 0
    p = 4
    while True:
        eb = (p - 2) >> 1
        off = (2 + (p & 1)) << eb
        if off + 1 <= value <= off + (1 << eb):
            return p, eb, value - off - 1
        p += 1


def _prefix_value(prefix_code: int, br: _LsbBitReader) -> int:
    """Inverse of :func:`_prefix_encode`: read the extra bits and
    reassemble the value."""
    if prefix_code < 4:
        return prefix_code + 1
    eb = (prefix_code - 2) >> 1
    off = (2 + (prefix_code & 1)) << eb
    return off + br.read(eb) + 1


def _dist_to_code(dist: int, width: int) -> int:
    """Scan-order distance → distance code (close neighbors through
    the 120-entry map, everything else dist + 120)."""
    dy, dx = divmod(dist, width)
    if dx > 8:
        dx -= width
        dy += 1
    code = _DIST_CODE_BY_OFFSET.get((dx, dy))
    if code is not None:
        return code
    return dist + 120


def _code_to_dist(code: int, width: int) -> int:
    """Distance code → scan-order distance (spec: mapped distances
    clamp to a minimum of 1)."""
    if code < 1:
        raise ValueError(f"invalid VP8L distance code {code}")
    if code > 120:
        return code - 120
    dx, dy = DIST_MAP[code - 1]
    dist = dy * width + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40


def encode_webp_payload(doc_id: int) -> bytes:
    """A real lossless WebP file for the TILED image synthesis
    contract (:func:`.multimodal._image_pixels_tiled`): RIFF/WEBP
    container, VP8L chunk with the subtract-green transform, a
    doc-varied color cache, LZ77 backward references for the repeated
    tile rows, and canonical per-channel prefix codes (full
    code-length-coded codes for the multi-symbol channels, simple
    codes where the alphabet allows)."""
    from .multimodal import _image_pixels_tiled

    return encode_vp8l(_image_pixels_tiled(doc_id), 1 + doc_id % 6)


def encode_vp8l(px, cache_bits: int) -> bytes:
    """Encode a top-down RGB uint8 array as a lossless WebP (see
    :func:`encode_webp_payload` for the emitted feature set).

    Backward references: a greedy single-candidate LZ77 matcher over
    the (subtract-green-transformed) ARGB sequence — most recent
    occurrence of the current pixel value, extended forward (overlap
    allowed, length capped at the format's 4096), emitted when it
    reaches ``MIN_MATCH``. Distances go through the spec's 120-entry
    2D offset map when the (dx, dy) is a close neighbor, else as
    direct scan-order codes. The color cache tracks every emitted
    pixel — including pixels covered by a copy — exactly as the
    decoder inserts them."""
    h, w, _ = px.shape
    cache_size = 1 << cache_bits
    green_alpha_size = 256 + NUM_LENGTH_CODES + cache_size

    # subtract-green on the encoder side; pixels as packed ARGB ints
    pixels: list[int] = []
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            pixels.append(
                (255 << 24)
                | (((r - g) & 0xFF) << 16)
                | (g << 8)
                | ((b - g) & 0xFF)
            )

    # token stream: greedy LZ77 > cache hit > literal, with the cache
    # state machine tracking every pixel position
    n = len(pixels)
    cache = [None] * cache_size
    last_pos: dict[int, int] = {}  # argb -> most recent position
    tokens: list[tuple[str, tuple]] = []
    i = 0
    while i < n:
        argb = pixels[i]
        prev = last_pos.get(argb)
        length = 0
        if prev is not None:
            dist = i - prev
            limit = min(n - i, MAX_LZ77_LENGTH)
            while length < limit and pixels[i + length] == pixels[
                i + length - dist
            ]:
                length += 1
        if length >= MIN_MATCH:
            tokens.append(("copy", (length, dist)))
            for j in range(i, i + length):
                cache[_cache_index(pixels[j], cache_bits)] = pixels[j]
                last_pos[pixels[j]] = j
            i += length
            continue
        idx = _cache_index(argb, cache_bits)
        if cache[idx] == argb:
            tokens.append(("cache", (idx,)))
        else:
            tokens.append(
                ("lit", ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                         (argb >> 8) & 0xFF, argb & 0xFF))
            )
        cache[idx] = argb
        last_pos[argb] = i
        i += 1

    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    for kind, v in tokens:
        if kind == "cache":
            s = 256 + NUM_LENGTH_CODES + v[0]
            gfreq[s] = gfreq.get(s, 0) + 1
        elif kind == "copy":
            length, dist = v
            lp, _, _ = _prefix_encode(length)
            gfreq[256 + lp] = gfreq.get(256 + lp, 0) + 1
            dp, _, _ = _prefix_encode(_dist_to_code(dist, w))
            dfreq[dp] = dfreq.get(dp, 0) + 1
        else:
            a, r, g, b = v
            gfreq[g] = gfreq.get(g, 0) + 1
            rfreq[r] = rfreq.get(r, 0) + 1
            bfreq[b] = bfreq.get(b, 0) + 1
            afreq[a] = afreq.get(a, 0) + 1
    if not dfreq:
        dfreq = {0: 1}  # unused distance tree still needs a code

    bw = _LsbBitWriter()
    bw.write(0x2F, 8)  # VP8L signature
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract-green (no payload)
    bw.write(0, 1)  # no more transforms
    bw.write(1, 1)  # color cache used
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no Huffman image (single meta code group)
    glen = huffman_lengths(gfreq)
    rlen = huffman_lengths(rfreq)
    blen = huffman_lengths(bfreq)
    alen = huffman_lengths(afreq)
    dlen = huffman_lengths(dfreq)
    _write_prefix_code(bw, glen, green_alpha_size)
    _write_prefix_code(bw, rlen, 256)
    _write_prefix_code(bw, blen, 256)
    _write_prefix_code(bw, alen, 256)
    _write_prefix_code(bw, dlen, NUM_DISTANCE_CODES)
    def emit_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
        # a 1-symbol code consumes ZERO bits on the wire (the decoder
        # knows the symbol from the code definition alone)
        if len(lengths) == 1:
            return {next(iter(lengths)): (0, 0)}
        return canonical_codes(lengths)

    gcodes = emit_codes(glen)
    rcodes = emit_codes(rlen)
    bcodes = emit_codes(blen)
    acodes = emit_codes(alen)
    dcodes = emit_codes(dlen)
    for kind, v in tokens:
        if kind == "cache":
            c, ln = gcodes[256 + NUM_LENGTH_CODES + v[0]]
            bw.write_code(c, ln)
        elif kind == "copy":
            length, dist = v
            lp, leb, lex = _prefix_encode(length)
            c, ln = gcodes[256 + lp]
            bw.write_code(c, ln)
            if leb:
                bw.write(lex, leb)
            dp, deb, dex = _prefix_encode(_dist_to_code(dist, w))
            c, ln = dcodes[dp]
            bw.write_code(c, ln)
            if deb:
                bw.write(dex, deb)
        else:
            a, r, g, b = v
            c, ln = gcodes[g]
            bw.write_code(c, ln)
            c, ln = rcodes[r]
            bw.write_code(c, ln)
            c, ln = bcodes[b]
            bw.write_code(c, ln)
            c, ln = acodes[a]
            bw.write_code(c, ln)

    body = bw.getvalue()
    vp8l = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        vp8l += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_webp(payload: bytes):
    """Parse a lossless WebP (VP8L) into (top-down RGB uint8 array
    (h, w, 3), cache_bits-as-read-from-the-stream) — dependency-free.
    Supports the literal/color-cache plane with simple and normal
    (code-length-coded) prefix codes and the subtract-green transform;
    raises loudly on LZ77 backward references, other transforms,
    Huffman images, and lossy VP8 chunks (see module docstring)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP: missing RIFF/WEBP header")
    pos = 12
    body = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if fourcc == b"VP8L":
            body = payload[pos + 8 : pos + 8 + size]
            break
        if fourcc in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy/extended WebP requires a codec library; only "
                "lossless VP8L decodes natively (vp8l.decode_webp)"
            )
        pos += 8 + size + (size & 1)
    if body is None:
        raise ValueError("WebP missing VP8L chunk")
    br = _LsbBitReader(body)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    subtract_green = False
    while br.read(1):
        ttype = br.read(2)
        if ttype == 2:
            subtract_green = True
        else:
            raise NotImplementedError(
                f"VP8L transform {ttype} (predictor/color/palette) not "
                "implemented — this decoder covers the subtract-green "
                "literal plane (vp8l module docstring)"
            )
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache size {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    if br.read(1):
        raise NotImplementedError(
            "VP8L Huffman images (spatial meta codes) not implemented"
        )
    green_alpha_size = 256 + NUM_LENGTH_CODES + cache_size
    gdec = _read_prefix_code(br, green_alpha_size)
    rdec = _read_prefix_code(br, 256)
    bdec = _read_prefix_code(br, 256)
    adec = _read_prefix_code(br, 256)
    ddec = _read_prefix_code(br, NUM_DISTANCE_CODES)

    cache = [0] * cache_size
    n = w * h
    argbs = [0] * n  # transformed-domain history (LZ77 copies source it)
    i = 0
    while i < n:
        s = gdec.read(br)
        if s < 256:
            g = s
            r = rdec.read(br)
            b = bdec.read(br)
            a = adec.read(br)
            argb = (a << 24) | (r << 16) | (g << 8) | b
        elif s < 256 + NUM_LENGTH_CODES:
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(ddec.read(br), br)
            dist = _code_to_dist(dcode, w)
            if dist > i:
                raise ValueError(
                    f"VP8L backward reference before image start "
                    f"(dist={dist} at pixel {i})"
                )
            if i + length > n:
                raise ValueError(
                    f"VP8L backward reference overruns image "
                    f"(len={length} at pixel {i} of {n})"
                )
            for _ in range(length):  # overlap-safe pixelwise copy
                argb = argbs[i - dist]
                argbs[i] = argb
                if cache_size:
                    cache[_cache_index(argb, cache_bits)] = argb
                i += 1
            continue
        else:
            if not cache_size:
                raise ValueError("cache symbol without a color cache")
            argb = cache[s - 256 - NUM_LENGTH_CODES]
        if cache_size:
            cache[_cache_index(argb, cache_bits)] = argb
        argbs[i] = argb
        i += 1

    out = np.zeros((h, w, 3), dtype=np.uint8)
    for i, argb in enumerate(argbs):
        a = (argb >> 24) & 0xFF
        r = (argb >> 16) & 0xFF
        g = (argb >> 8) & 0xFF
        b = argb & 0xFF
        if subtract_green:
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
        if a != 255:
            raise ValueError("non-opaque VP8L pixel outside RGB contract")
        out[i // w, i % w] = (r, g, b)
    return out, cache_bits
