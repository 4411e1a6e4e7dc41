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

* The encoder emits literal + color-cache streams with the
  subtract-green transform signalled and real per-channel canonical
  Huffman codes (simple 1/2-symbol codes where the alphabet allows,
  full code-length-coded codes otherwise). No LZ77 backward
  references are emitted.
* The decoder handles everything the spec's literal/cache plane can
  contain — simple and normal prefix codes, all five per-group codes,
  any color-cache size, the subtract-green transform — and raises
  ``NotImplementedError`` loudly for LZ77 backward references,
  predictor/color/palette transforms, and Huffman images (spatially
  varying meta codes), none of which this encoder produces and all of
  which would need the spec's full tables.

Synthesis contract: the shared :func:`.multimodal._image_pixels`
closed form (same as BMP/PPM/PNG), so the DuckDB oracle is the
existing closed-form image-statistics SQL with the VP8L payload-size
expression omitted (payload size is compression-dependent).
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
# Encoder
# ---------------------------------------------------------------------------

NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40


def encode_webp_payload(doc_id: int) -> bytes:
    """A real lossless WebP file for the shared image synthesis
    contract: RIFF/WEBP container, VP8L chunk with the subtract-green
    transform, a doc-varied color cache, and canonical per-channel
    prefix codes (full code-length-coded codes for the multi-symbol
    channels, simple codes for alpha/distance)."""
    from .multimodal import _image_pixels

    return encode_vp8l(_image_pixels(doc_id), 1 + doc_id % 6)


def encode_vp8l(px, cache_bits: int) -> bytes:
    """Encode a top-down RGB uint8 array as a lossless WebP (see
    :func:`encode_webp_payload` for the emitted feature set)."""
    h, w, _ = px.shape
    cache_size = 1 << cache_bits
    green_alpha_size = 256 + NUM_LENGTH_CODES + cache_size

    # subtract-green on the encoder side
    pixels = []
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            pixels.append((255, (r - g) & 0xFF, g, (b - g) & 0xFF))

    # token stream with the cache state machine
    cache = [None] * cache_size
    tokens: list[tuple[str, tuple[int, int, int, int] | int]] = []
    for a, r, g, b in pixels:
        argb = (a << 24) | (r << 16) | (g << 8) | b
        idx = _cache_index(argb, cache_bits)
        if cache[idx] == argb:
            tokens.append(("cache", idx))
        else:
            tokens.append(("lit", (a, r, g, b)))
        cache[idx] = argb

    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    for kind, v in tokens:
        if kind == "cache":
            s = 256 + NUM_LENGTH_CODES + v
            gfreq[s] = gfreq.get(s, 0) + 1
        else:
            a, r, g, b = v
            gfreq[g] = gfreq.get(g, 0) + 1
            rfreq[r] = rfreq.get(r, 0) + 1
            bfreq[b] = bfreq.get(b, 0) + 1
            afreq[a] = afreq.get(a, 0) + 1

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
    _write_prefix_code(bw, glen, green_alpha_size)
    _write_prefix_code(bw, rlen, 256)
    _write_prefix_code(bw, blen, 256)
    _write_prefix_code(bw, alen, 256)
    _write_prefix_code(bw, {0: 1}, NUM_DISTANCE_CODES)  # unused distances
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
    for kind, v in tokens:
        if kind == "cache":
            c, ln = gcodes[256 + NUM_LENGTH_CODES + v]
            bw.write_code(c, ln)
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
    _read_prefix_code(br, NUM_DISTANCE_CODES)  # distances (unused here)

    cache = [0] * cache_size
    out = np.zeros((h, w, 3), dtype=np.uint8)
    n = w * h
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
            raise NotImplementedError(
                "VP8L LZ77 backward references not implemented — the "
                "short-distance map decode is gated (vp8l module "
                "docstring)"
            )
        else:
            if not cache_size:
                raise ValueError("cache symbol without a color cache")
            argb = cache[s - 256 - NUM_LENGTH_CODES]
        if cache_size:
            cache[_cache_index(argb, cache_bits)] = argb
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
        i += 1
    return out, cache_bits
