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

Scope — as of round 10 this module covers the FULL VP8L feature set
(no remaining format gates; only lossy VP8 stays codec-library-gated):

* The encoder emits literal + color-cache + LZ77 backward-reference
  streams with real per-channel canonical Huffman codes (simple
  1/2-symbol codes where the alphabet allows, full code-length-coded
  codes otherwise; greedy single-candidate matcher, overlap allowed),
  plus all four transforms — subtract-green, PREDICTOR (any of the 14
  modes, constant per image), COLOR (constant per-channel elements),
  and COLOR-INDEXING with pixel bundling — and optional HUFFMAN
  IMAGES (spatially varying meta prefix-code groups).
* The decoder handles everything a spec-conformant lossless stream
  can contain: simple and normal prefix codes, any color-cache size,
  LZ77 (mapped and direct distances, overlapping copies, cache
  insertion of copied pixels), meta prefix codes with per-pixel group
  selection, and all four transforms applied in reverse read order —
  including the spec's border rules for prediction and delta-coded
  palettes. Malformed streams raise clean ValueErrors.

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
    container, a doc-varied color cache, LZ77 backward references for
    the repeated tile rows, and canonical per-channel prefix codes.
    The WIRE FORMAT rotates across docs through the full VP8L feature
    set — every variant decodes to the identical pixels (lossless),
    so the shared closed-form oracle certifies all of them:

    * ``doc_id % 5 == 0`` — subtract-green only (the r9 baseline)
    * ``1`` — subtract-green + PREDICTOR transform (mode doc_id % 14,
      block bits 2 + doc_id % 3)
    * ``2`` — COLOR transform (doc-varied per-channel elements)
    * ``3`` — COLOR-INDEXING (palette) with pixel bundling (the tiled
      images have ≤ tile·width ≤ 176 distinct colors, so bundling
      width varies with the tile period)
    * ``4`` — subtract-green + a HUFFMAN IMAGE (meta prefix codes,
      2 + doc_id % 2 groups)
    """
    from .multimodal import _image_pixels_tiled

    px = _image_pixels_tiled(doc_id)
    cache_bits = 1 + doc_id % 6
    variant = doc_id % 5
    if variant == 0:
        return encode_vp8l(px, cache_bits)
    if variant == 1:
        return encode_vp8l(
            px, cache_bits,
            transforms=("subtract_green",
                        ("predictor", 2 + doc_id % 3, doc_id % 14)),
        )
    if variant == 2:
        return encode_vp8l(
            px, cache_bits,
            transforms=(
                ("color", 2 + doc_id % 3,
                 (doc_id % 256, (doc_id * 3) % 256, (doc_id * 7) % 256)),
            ),
        )
    if variant == 3:
        return encode_vp8l(px, cache_bits, transforms=("palette",))
    return encode_vp8l(
        px, cache_bits, transforms=("subtract_green",),
        meta_spec=(2, 2 + doc_id % 2),
    )

# ---------------------------------------------------------------------------
# Image-data layer (tokenizer + writer/reader), shared by the main ARGB
# image, entropy (meta prefix) images, and transform sub-images
# ---------------------------------------------------------------------------


def _tokenize(pixels: list[int], cache_bits: int) -> list[tuple]:
    """Greedy LZ77 > color-cache > literal token stream over packed
    ARGB ints. Each token is (kind, payload, start_pos): single-
    candidate matcher (most recent occurrence of the current pixel,
    extended forward, overlap allowed, 4096 cap), with the cache state
    machine tracking every pixel position exactly as the decoder
    inserts them."""
    n = len(pixels)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    last_pos: dict[int, int] = {}
    tokens: list[tuple] = []
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
            tokens.append(("copy", (length, dist), i))
            for j in range(i, i + length):
                if cache_size:
                    cache[_cache_index(pixels[j], cache_bits)] = pixels[j]
                last_pos[pixels[j]] = j
            i += length
            continue
        if cache_size:
            idx = _cache_index(argb, cache_bits)
            if cache[idx] == argb:
                tokens.append(("cache", (idx,), i))
            else:
                tokens.append(
                    ("lit", ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                             (argb >> 8) & 0xFF, argb & 0xFF), i)
                )
            cache[idx] = argb
        else:
            tokens.append(
                ("lit", ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                         (argb >> 8) & 0xFF, argb & 0xFF), i)
            )
        last_pos[argb] = i
        i += 1
    return tokens


def _emit_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    # a 1-symbol code consumes ZERO bits on the wire (the decoder
    # knows the symbol from the code definition alone)
    if len(lengths) == 1:
        return {next(iter(lengths)): (0, 0)}
    return canonical_codes(lengths)


def _write_image_data(
    bw: _LsbBitWriter,
    pixels: list[int],
    w: int,
    cache_bits: int,
    is_argb: bool,
    meta_spec: tuple[int, int] | None = None,
) -> None:
    """Serialize one VP8L image-data stream: optional color cache,
    optional meta prefix (Huffman) image — ARGB role only, group of
    block (bx, by) = (bx + by) % n_groups — then per-group canonical
    prefix codes and the token stream. The prefix group of a token is
    selected by its START pixel's block, matching the decoder's
    per-pixel group selection."""
    h = (len(pixels) + w - 1) // w
    tokens = _tokenize(pixels, cache_bits)
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    n_groups = 1
    group_of_pos = None
    if is_argb:
        if meta_spec is not None:
            prefix_bits, n_groups = meta_spec
            bw.write(1, 1)
            bw.write(prefix_bits - 2, 3)
            mw = (w + (1 << prefix_bits) - 1) >> prefix_bits
            mh = (h + (1 << prefix_bits) - 1) >> prefix_bits
            block_groups = [
                (bx + by) % n_groups
                for by in range(mh)
                for bx in range(mw)
            ]
            # The decoder derives the group count from the meta image
            # (max index + 1), so only write code groups that actually
            # appear — a tiny image may have fewer blocks than
            # requested groups.
            n_groups = max(block_groups) + 1
            meta_pixels = [
                (0xFF << 24) | ((g & 0xFFFF) << 8) for g in block_groups
            ]
            _write_image_data(bw, meta_pixels, mw, 0, False)

            def group_of_pos(pos: int) -> int:
                bx = (pos % w) >> prefix_bits
                by = (pos // w) >> prefix_bits
                return (bx + by) % n_groups
        else:
            bw.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha_size = 256 + NUM_LENGTH_CODES + cache_size

    # Per-group frequency tables.
    freqs = [
        {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}}
        for _ in range(n_groups)
    ]

    def bump(d: dict, s: int) -> None:
        d[s] = d.get(s, 0) + 1

    for kind, v, pos in tokens:
        f = freqs[group_of_pos(pos) if group_of_pos else 0]
        if kind == "cache":
            bump(f["g"], 256 + NUM_LENGTH_CODES + v[0])
        elif kind == "copy":
            length, dist = v
            lp, _, _ = _prefix_encode(length)
            bump(f["g"], 256 + lp)
            dp, _, _ = _prefix_encode(_dist_to_code(dist, w))
            bump(f["d"], dp)
        else:
            a, r, g, b = v
            bump(f["g"], g)
            bump(f["r"], r)
            bump(f["b"], b)
            bump(f["a"], a)
    # Every tree must carry at least one symbol on the wire.
    for f in freqs:
        for key in ("g", "r", "b", "a", "d"):
            if not f[key]:
                f[key] = {0: 1}

    group_codes = []
    for f in freqs:
        lens = {k: huffman_lengths(f[k]) for k in ("g", "r", "b", "a", "d")}
        _write_prefix_code(bw, lens["g"], green_alpha_size)
        _write_prefix_code(bw, lens["r"], 256)
        _write_prefix_code(bw, lens["b"], 256)
        _write_prefix_code(bw, lens["a"], 256)
        _write_prefix_code(bw, lens["d"], NUM_DISTANCE_CODES)
        group_codes.append({k: _emit_codes(lens[k]) for k in lens})

    for kind, v, pos in tokens:
        codes = group_codes[group_of_pos(pos) if group_of_pos else 0]
        if kind == "cache":
            c, ln = codes["g"][256 + NUM_LENGTH_CODES + v[0]]
            bw.write_code(c, ln)
        elif kind == "copy":
            length, dist = v
            lp, leb, lex = _prefix_encode(length)
            c, ln = codes["g"][256 + lp]
            bw.write_code(c, ln)
            if leb:
                bw.write(lex, leb)
            dp, deb, dex = _prefix_encode(_dist_to_code(dist, w))
            c, ln = codes["d"][dp]
            bw.write_code(c, ln)
            if deb:
                bw.write(dex, deb)
        else:
            a, r, g, b = v
            for chan, sym in (("g", g), ("r", r), ("b", b), ("a", a)):
                c, ln = codes[chan][sym]
                bw.write_code(c, ln)


def _read_image_data(
    br: _LsbBitReader, w: int, h: int, is_argb: bool
) -> tuple[list[int], int]:
    """Decode one VP8L image-data stream (the inverse of
    :func:`_write_image_data`): optional color cache, optional meta
    prefix image (ARGB role only — group index = (red << 8) | green of
    the entropy image's block pixel), per-group prefix codes, and the
    literal / LZ77 / cache pixel loop. Returns (packed ARGB ints in
    scan order — still in the TRANSFORMED domain, caller applies
    inverse transforms — and the stream's cache_bits)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache size {cache_bits}")
    meta = None
    n_groups = 1
    if is_argb and br.read(1):
        prefix_bits = br.read(3) + 2
        mw = (w + (1 << prefix_bits) - 1) >> prefix_bits
        mh = (h + (1 << prefix_bits) - 1) >> prefix_bits
        meta_px, _ = _read_image_data(br, mw, mh, False)
        group_idx = [
            (((p >> 16) & 0xFF) << 8) | ((p >> 8) & 0xFF) for p in meta_px
        ]
        n_groups = max(group_idx) + 1
        meta = (prefix_bits, mw, group_idx)
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha_size = 256 + NUM_LENGTH_CODES + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha_size),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, NUM_DISTANCE_CODES),
            )
        )
    cache = [0] * cache_size
    n = w * h
    argbs = [0] * n  # transformed-domain history (LZ77 copies source it)
    i = 0
    while i < n:
        if meta is not None:
            prefix_bits, mw, group_idx = meta
            gi = group_idx[
                ((i // w) >> prefix_bits) * mw + ((i % w) >> prefix_bits)
            ]
            gdec, rdec, bdec, adec, ddec = groups[gi]
        else:
            gdec, rdec, bdec, adec, ddec = groups[0]
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
    return argbs, cache_bits


# ---------------------------------------------------------------------------
# Transforms: subtract-green, predictor, color, color-indexing (palette)
# ---------------------------------------------------------------------------


def _split(argb: int) -> tuple[int, int, int, int]:
    return (
        (argb >> 24) & 0xFF,
        (argb >> 16) & 0xFF,
        (argb >> 8) & 0xFF,
        argb & 0xFF,
    )


def _join(a: int, r: int, g: int, b: int) -> int:
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (
        b & 0xFF
    )


def _int8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: both bytes as signed int8, product
    arithmetic-shifted right 5 (Python >> is floor = C arithmetic
    shift)."""
    return (_int8(t) * _int8(c & 0xFF)) >> 5


def _avg2(p: int, q: int) -> int:
    """Per-channel (p + q) // 2 on packed ARGB."""
    return _join(
        *(((x + y) >> 1) for x, y in zip(_split(p), _split(q)))
    )


def _predict(mode: int, left: int, top: int, topleft: int,
             topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:  # Select
        ls, ts, tls = _split(left), _split(top), _split(topleft)
        p = [lc + tc - tlc for lc, tc, tlc in zip(ls, ts, tls)]
        p_left = sum(abs(pc - lc) for pc, lc in zip(p, ls))
        p_top = sum(abs(pc - tc) for pc, tc in zip(p, ts))
        return left if p_left < p_top else top
    if mode == 12:  # ClampAddSubtractFull
        return _join(
            *(
                max(0, min(255, lc + tc - tlc))
                for lc, tc, tlc in zip(
                    _split(left), _split(top), _split(topleft)
                )
            )
        )
    if mode == 13:  # ClampAddSubtractHalf
        av = _split(_avg2(left, top))
        tls = _split(topleft)
        out = []
        for ac, tlc in zip(av, tls):
            d = ac - tlc
            half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
            out.append(max(0, min(255, ac + half)))
        return _join(*out)
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _predictor_mode_at(sub: list[int], size_bits: int, tw: int,
                       x: int, y: int) -> int:
    m = sub[(y >> size_bits) * tw + (x >> size_bits)]
    return (m >> 8) & 0xFF


def _predictor_context(recon: list[int], w: int, x: int, y: int,
                       i: int) -> tuple[int, int, int, int, int | None]:
    """(left, top, topleft, topright, forced_mode) with the spec's
    border rules: (0,0) predicts black, top row forces L, left column
    forces T; TR on the rightmost column is the LEFTMOST pixel of the
    row above."""
    if x == 0 and y == 0:
        return 0, 0, 0, 0, 0
    if y == 0:
        return recon[i - 1], 0, 0, 0, 1
    if x == 0:
        return 0, recon[i - w], 0, 0, 2
    left = recon[i - 1]
    top = recon[i - w]
    topleft = recon[i - w - 1]
    topright = recon[i - w + 1] if x + 1 < w else recon[i - w - x]
    return left, top, topleft, topright, None


def _apply_predictor_forward(pixels: list[int], w: int, sub: list[int],
                             size_bits: int, tw: int) -> list[int]:
    out = []
    for i, px in enumerate(pixels):
        x, y = i % w, i // w
        left, top, topleft, topright, forced = _predictor_context(
            pixels, w, x, y, i
        )
        mode = forced if forced is not None else _predictor_mode_at(
            sub, size_bits, tw, x, y
        )
        pred = _predict(mode, left, top, topleft, topright)
        out.append(
            _join(*((pc - qc) & 0xFF
                    for pc, qc in zip(_split(px), _split(pred))))
        )
    return out


def _apply_predictor_inverse(res: list[int], w: int, sub: list[int],
                             size_bits: int, tw: int) -> list[int]:
    recon: list[int] = [0] * len(res)
    for i, rv in enumerate(res):
        x, y = i % w, i // w
        left, top, topleft, topright, forced = _predictor_context(
            recon, w, x, y, i
        )
        mode = forced if forced is not None else _predictor_mode_at(
            sub, size_bits, tw, x, y
        )
        pred = _predict(mode, left, top, topleft, topright)
        recon[i] = _join(
            *((rc + pc) & 0xFF for rc, pc in zip(_split(rv), _split(pred)))
        )
    return recon


def _color_elems_at(sub: list[int], size_bits: int, tw: int,
                    x: int, y: int) -> tuple[int, int, int]:
    e = sub[(y >> size_bits) * tw + (x >> size_bits)]
    return e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF  # gtr, gtb, rtb


def _apply_color_forward(pixels: list[int], w: int, sub: list[int],
                         size_bits: int, tw: int) -> list[int]:
    out = []
    for i, px in enumerate(pixels):
        a, r, g, b = _split(px)
        gtr, gtb, rtb = _color_elems_at(sub, size_bits, tw, i % w, i // w)
        nr = (r - _ct_delta(gtr, g)) & 0xFF
        nb = (b - _ct_delta(gtb, g) - _ct_delta(rtb, r)) & 0xFF
        out.append(_join(a, nr, g, nb))
    return out


def _apply_color_inverse(pixels: list[int], w: int, sub: list[int],
                         size_bits: int, tw: int) -> list[int]:
    out = []
    for i, px in enumerate(pixels):
        a, r, g, b = _split(px)
        gtr, gtb, rtb = _color_elems_at(sub, size_bits, tw, i % w, i // w)
        nr = (r + _ct_delta(gtr, g)) & 0xFF
        nb = (b + _ct_delta(gtb, g) + _ct_delta(rtb, nr)) & 0xFF
        out.append(_join(a, nr, g, nb))
    return out


def _palette_width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _pack_palette_indices(indices: list[int], w: int,
                          width_bits: int) -> tuple[list[int], int]:
    """Bundle per-row indices into green-channel packed pixels
    (low-order bits = leftmost pixel of the bundle, rows padded
    independently); returns (packed ARGB pixels, packed width)."""
    per = 1 << width_bits
    bits = 8 >> width_bits
    pw = (w + per - 1) // per
    h = len(indices) // w
    out = []
    for y in range(h):
        row = indices[y * w : (y + 1) * w]
        for bx in range(pw):
            green = 0
            for j in range(per):
                x = bx * per + j
                if x < w:
                    green |= row[x] << (j * bits)
            out.append((0xFF << 24) | (green << 8))
    return out, pw


def _apply_palette_inverse(pixels: list[int], packed_w: int, full_w: int,
                           width_bits: int, palette: list[int]) -> list[int]:
    per = 1 << width_bits
    bits = 8 >> width_bits
    mask = (1 << bits) - 1
    h = len(pixels) // packed_w
    out = []
    for y in range(h):
        for x in range(full_w):
            packed = pixels[y * packed_w + (x // per)]
            idx = ((packed >> 8) >> ((x % per) * bits)) & mask
            if idx >= len(palette):
                raise ValueError(
                    f"VP8L palette index {idx} out of range "
                    f"({len(palette)} colors)"
                )
            out.append(palette[idx])
    return out


def _subtract_green_forward(pixels: list[int]) -> list[int]:
    out = []
    for px in pixels:
        a, r, g, b = _split(px)
        out.append(_join(a, (r - g) & 0xFF, g, (b - g) & 0xFF))
    return out


def _subtract_green_inverse(pixels: list[int]) -> list[int]:
    out = []
    for px in pixels:
        a, r, g, b = _split(px)
        out.append(_join(a, (r + g) & 0xFF, g, (b + g) & 0xFF))
    return out


def _sub_dims(w: int, h: int, size_bits: int) -> tuple[int, int]:
    return (
        (w + (1 << size_bits) - 1) >> size_bits,
        (h + (1 << size_bits) - 1) >> size_bits,
    )


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_vp8l(
    px,
    cache_bits: int,
    transforms: tuple = ("subtract_green",),
    meta_spec: tuple[int, int] | None = None,
) -> bytes:
    """Encode a top-down RGB uint8 array as a lossless WebP.

    ``transforms`` applies in the listed (stream) order, each at most
    once, per the spec's reverse-order inverse application:

    * ``"subtract_green"``
    * ``("predictor", size_bits, mode)`` — one predictor mode for all
      blocks (the transform sub-image is a constant entropy image)
    * ``("color", size_bits, (gtr, gtb, rtb))`` — one color-transform
      element for all blocks
    * ``"palette"`` — color indexing with delta-coded palette and
      pixel bundling (≤16 colors pack 2/4/8 indices per green byte);
      requires ≤256 distinct colors and shrinks the coded width

    ``meta_spec=(prefix_bits, n_groups)`` emits a Huffman image (meta
    prefix codes): block (bx, by) uses prefix-code group
    (bx + by) % n_groups. See :func:`encode_webp_payload` for the
    synthesis-contract feature set.
    """
    h, w, _ = px.shape
    pixels = [
        (0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for row in px
        for r, g, b in row
    ]
    bw = _LsbBitWriter()
    bw.write(0x2F, 8)  # VP8L signature
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    cur_w = w
    seen = set()
    for t in transforms:
        name = t if isinstance(t, str) else t[0]
        if name in seen:
            raise ValueError(f"transform {name!r} may appear only once")
        seen.add(name)
        bw.write(1, 1)  # transform present
        if name == "subtract_green":
            bw.write(2, 2)
            pixels = _subtract_green_forward(pixels)
        elif name == "predictor":
            _, size_bits, mode = t
            if not 2 <= size_bits <= 9 or not 0 <= mode <= 13:
                raise ValueError(f"bad predictor spec {t}")
            bw.write(0, 2)
            bw.write(size_bits - 2, 3)
            tw, th = _sub_dims(cur_w, h, size_bits)
            sub = [(0xFF << 24) | (mode << 8)] * (tw * th)
            _write_image_data(bw, sub, tw, 0, False)
            pixels = _apply_predictor_forward(
                pixels, cur_w, sub, size_bits, tw
            )
        elif name == "color":
            _, size_bits, (gtr, gtb, rtb) = t
            if not 2 <= size_bits <= 9:
                raise ValueError(f"bad color-transform spec {t}")
            bw.write(1, 2)
            bw.write(size_bits - 2, 3)
            tw, th = _sub_dims(cur_w, h, size_bits)
            elem = (0xFF << 24) | ((rtb & 0xFF) << 16) | (
                (gtb & 0xFF) << 8
            ) | (gtr & 0xFF)
            sub = [elem] * (tw * th)
            _write_image_data(bw, sub, tw, 0, False)
            pixels = _apply_color_forward(pixels, cur_w, sub, size_bits, tw)
        elif name == "palette":
            palette: list[int] = []
            index_of: dict[int, int] = {}
            for p in pixels:
                if p not in index_of:
                    index_of[p] = len(palette)
                    palette.append(p)
            if len(palette) > 256:
                raise ValueError(
                    f"palette transform needs <=256 colors, got "
                    f"{len(palette)}"
                )
            bw.write(3, 2)
            bw.write(len(palette) - 1, 8)
            # Palette entries are DELTA-coded against the previous
            # entry, per channel mod 256 (first entry vs 0).
            deltas = []
            prev = 0
            for p in palette:
                deltas.append(
                    _join(*((pc - qc) & 0xFF
                            for pc, qc in zip(_split(p), _split(prev))))
                )
                prev = p
            _write_image_data(bw, deltas, len(palette), 0, False)
            width_bits = _palette_width_bits(len(palette))
            indices = [index_of[p] for p in pixels]
            pixels, cur_w = _pack_palette_indices(
                indices, cur_w, width_bits
            )
        else:
            raise ValueError(f"unknown transform {t!r}")
    bw.write(0, 1)  # no more transforms

    _write_image_data(bw, pixels, cur_w, cache_bits, True, meta_spec)

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
    (h, w, 3), cache_bits of the main image stream) — dependency-free
    and covering the FULL VP8L feature set: simple and normal
    (code-length-coded) prefix codes, color cache, LZ77 backward
    references (2D-mapped and direct distances, overlapping copies),
    Huffman images (spatially varying meta prefix codes), and all
    four transforms (subtract-green, predictor, color,
    color-indexing with pixel bundling), applied in reverse read
    order per the spec. Lossy VP8 chunks raise the codec-library
    gate; malformed streams raise ValueError."""
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

    # Transforms, read in stream order; each may appear at most once.
    # Color-indexing shrinks the effective width for everything read
    # after it (including other transforms' sub-images).
    transforms: list[tuple] = []
    seen_types = set()
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen_types:
            raise ValueError(f"VP8L transform {ttype} repeated")
        seen_types.add(ttype)
        if ttype == 2:
            transforms.append(("subtract_green",))
        elif ttype in (0, 1):
            size_bits = br.read(3) + 2
            tw, th = _sub_dims(cur_w, h, size_bits)
            sub, _ = _read_image_data(br, tw, th, False)
            transforms.append(
                ("predictor" if ttype == 0 else "color", size_bits, tw, sub)
            )
        else:  # color indexing
            n_colors = br.read(8) + 1
            deltas, _ = _read_image_data(br, n_colors, 1, False)
            palette = []
            prev = 0
            for d in deltas:
                cur = _join(
                    *((dc + pc) & 0xFF
                      for dc, pc in zip(_split(d), _split(prev)))
                )
                palette.append(cur)
                prev = cur
            width_bits = _palette_width_bits(n_colors)
            full_w = cur_w
            cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits
            transforms.append(("palette", width_bits, full_w, palette))

    argbs, cache_bits = _read_image_data(br, cur_w, h, True)

    for t in reversed(transforms):
        if t[0] == "subtract_green":
            argbs = _subtract_green_inverse(argbs)
        elif t[0] == "predictor":
            _, size_bits, tw, sub = t
            argbs = _apply_predictor_inverse(argbs, cur_w, sub, size_bits, tw)
        elif t[0] == "color":
            _, size_bits, tw, sub = t
            argbs = _apply_color_inverse(argbs, cur_w, sub, size_bits, tw)
        else:  # palette
            _, width_bits, full_w, palette = t
            argbs = _apply_palette_inverse(
                argbs, cur_w, full_w, width_bits, palette
            )
            cur_w = full_w
    if cur_w != w or len(argbs) != w * h:
        raise ValueError("VP8L transform chain left a mismatched width")

    out = np.zeros((h, w, 3), dtype=np.uint8)
    for i, argb in enumerate(argbs):
        a, r, g, b = _split(argb)
        if a != 255:
            raise ValueError("non-opaque VP8L pixel outside RGB contract")
        out[i // w, i % w] = (r, g, b)
    return out, cache_bits
