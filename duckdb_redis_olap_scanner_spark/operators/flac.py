"""Dependency-free FLAC (RFC 9639) encode + decode.

Beyond-reference multimodal operator (the reference engine at
/root/reference has no media surface): closes the "compressed audio
needs a codec library" gap the same way :mod:`.jpeg` closed the image
one — a real, spec-driven implementation of the container in
numpy/stdlib, exercised through the same synthesize → decode
``mapInPandas`` plumbing as the WAV/ADPCM entries.

Synthesis contract (mirrors the WAV closed form so the DuckDB oracle
stays a pure SQL expression):

* ``n_channels = 1 + doc_id % 2``
* ``sample_rate = 8000 + (doc_id % 3) * 4000``
* ``bits = 16``
* ``n_frames = 24 + doc_id % 41`` (inter-channel frames)
* interleaved sample ``i``: ``s_i = ((doc_id*11 + i*97) % 65536) - 32768``

The encoder writes genuine FLAC streams — STREAMINFO metadata block,
fixed-blocksize frames of 16 samples (short last frame), UTF-8-coded
frame numbers, CRC-8 header / CRC-16 frame checksums — and cycles
through the subframe types and stereo decorrelation modes so the
decoder's whole surface is exercised per document:

* frame 0: VERBATIM subframes;
* ``(frame + ch) % 7 == 3``: LPC order 2 (doc-varied quantized
  coefficients, arithmetic-shift prediction);
* otherwise FIXED order ``(frame + ch) % 5`` (0..4);
* stereo channel assignment cycles independent / left-side /
  right-side / mid-side by frame index, with the side channel coded
  at ``bits + 1`` as the spec requires;
* residuals are Rice-coded (method 0, partition orders 0/1, per-
  partition parameter search) with the 0b1111 raw-escape taken
  whenever it is smaller.

The decoder is NOT specialized to this encoder: it walks arbitrary
metadata blocks, supports both blocking strategies, the full
blocksize / sample-rate / sample-size code tables, CONSTANT /
VERBATIM / FIXED 0-4 / LPC 1-32 subframes, wasted bits, Rice methods
0 and 1 with any partition order and escapes, verifies both CRCs,
and undoes all three decorrelation modes.
"""

from __future__ import annotations

import struct

FLAC_BLOCKSIZE = 16
FLAC_BITS = 16


def _flac_params(doc_id: int) -> tuple[int, int, int]:
    return 1 + doc_id % 2, 8000 + (doc_id % 3) * 4000, 24 + doc_id % 41


def _flac_samples(doc_id: int):
    """Interleaved int16 samples per the synthesis contract."""
    import numpy as np

    ch, _sr, n = _flac_params(doc_id)
    i = np.arange(n * ch, dtype=np.int64)
    return (((doc_id * 11 + i * 97) % 65536) - 32768).astype(np.int16)


# ---------------------------------------------------------------------------
# CRCs (RFC 9639 §9.1.4 / §9.3: CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both initialized to 0)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) ^ _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, as everywhere in FLAC)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # q zero bits then a one bit (libFLAC write_unary_unsigned)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0  # bits consumed of data[bytepos]

    def read(self, nbits: int) -> int:
        out = 0
        while nbits > 0:
            if self.bytepos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bitpos
            take = min(avail, nbits)
            byte = self.data[self.bytepos]
            out = (out << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            nbits -= take
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _utf8_number(n: int) -> bytes:
    """The UTF-8-style coded number of RFC 9639 §9.1.5 (extended to 36
    bits; values < 0x80 are one byte)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    # an nbytes-long sequence carries 5*nbytes + 1 payload bits
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    out.append(lead_mask | n)
    return bytes(reversed(out))


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    probe = b0
    while probe & 0x80:
        nbytes += 1
        probe = (probe << 1) & 0xFF
    if nbytes < 2 or nbytes > 7:
        raise ValueError(f"invalid UTF-8 coded number lead byte {b0:#x}")
    val = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 coded number continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


# ---------------------------------------------------------------------------
# Rice residual coding (RFC 9639 §9.2.7)
# ---------------------------------------------------------------------------


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _rice_cost(res, k: int) -> int:
    total = 0
    for r in res:
        total += (_zigzag(int(r)) >> k) + 1 + k
    return total


def _write_rice_partition(bw: _BitWriter, res) -> None:
    """One partition: pick the cheapest 4-bit Rice parameter, or the
    raw escape (param 0b1111, 5-bit width) when that is smaller."""
    best_k, best_cost = 0, None
    for k in range(15):
        c = _rice_cost(res, k)
        if best_cost is None or c < best_cost:
            best_k, best_cost = k, c
    width = max((_signed_bits(int(r)) for r in res), default=1)
    raw_cost = 5 + width * len(res)
    if raw_cost < best_cost:
        bw.write(0b1111, 4)
        bw.write(width, 5)
        for r in res:
            bw.write_signed(int(r), width)
        return
    bw.write(best_k, 4)
    for r in res:
        u = _zigzag(int(r))
        bw.write_unary(u >> best_k)
        bw.write(u & ((1 << best_k) - 1), best_k)


def _signed_bits(v: int) -> int:
    """Smallest two's-complement width holding v (>=1)."""
    n = 1
    while not (-(1 << (n - 1)) <= v < (1 << (n - 1))):
        n += 1
    return n


def _write_residual(bw: _BitWriter, res, blocksize: int, order: int,
                    part_order: int) -> None:
    bw.write(0b00, 2)  # method 0: 4-bit Rice parameters
    bw.write(part_order, 4)
    nparts = 1 << part_order
    psize = blocksize >> part_order
    pos = 0
    for p in range(nparts):
        cnt = psize - order if p == 0 else psize
        _write_rice_partition(bw, res[pos : pos + cnt])
        pos += cnt


def _read_residual(br: _BitReader, blocksize: int, order: int):
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("partition count does not divide blocksize")
    psize = blocksize >> part_order
    res = []
    for p in range(nparts):
        cnt = psize - order if p == 0 else psize
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        k = br.read(plen)
        if k == escape:
            width = br.read(5)
            for _ in range(cnt):
                res.append(br.read_signed(width) if width else 0)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                res.append((u >> 1) ^ -(u & 1))
    return res


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _lpc_coeffs(doc_id: int) -> tuple[list[int], int]:
    """Doc-varied quantized LPC coefficients (precision 12, shift 9)."""
    return [900 + doc_id % 64, -(380 + doc_id % 32)], 9


def _encode_subframe(bw: _BitWriter, s, bps: int, doc_id: int,
                     frame_idx: int, ch_idx: int) -> None:
    n = len(s)
    if frame_idx == 0:
        bw.write(0, 1)
        bw.write(0b000001, 6)  # VERBATIM
        bw.write(0, 1)  # no wasted bits
        for v in s:
            bw.write_signed(int(v), bps)
        return
    if (frame_idx + ch_idx) % 7 == 3 and n > 2:
        coeffs, shift = _lpc_coeffs(doc_id)
        order = len(coeffs)
        bw.write(0, 1)
        bw.write(0b100000 | (order - 1), 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write_signed(int(v), bps)
        bw.write(12 - 1, 4)  # coefficient precision
        bw.write_signed(shift, 5)
        for c in coeffs:
            bw.write_signed(c, 12)
        res = []
        for i in range(order, n):
            pred = sum(c * int(s[i - 1 - j]) for j, c in enumerate(coeffs))
            res.append(int(s[i]) - (pred >> shift))
        part_order = 1 if n % 2 == 0 and (n >> 1) > order else 0
        _write_residual(bw, res, n, order, part_order)
        return
    order = (frame_idx + ch_idx) % 5
    if order >= n:
        order = 0
    coeffs = _FIXED_COEFFS[order]
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)
    bw.write(0, 1)
    for v in s[:order]:
        bw.write_signed(int(v), bps)
    res = []
    for i in range(order, n):
        pred = sum(c * int(s[i - 1 - j]) for j, c in enumerate(coeffs))
        res.append(int(s[i]) - pred)
    part_order = 1 if n % 2 == 0 and (n >> 1) > order else 0
    _write_residual(bw, res, n, order, part_order)


def encode_flac_payload(doc_id: int) -> bytes:
    """A real FLAC stream for the synthesis contract (see module
    docstring): fLaC marker, STREAMINFO, fixed-blocksize frames."""
    import numpy as np

    ch, sr, n = _flac_params(doc_id)
    inter = _flac_samples(doc_id).astype(np.int64)
    chans = [inter[c::ch] for c in range(ch)]

    # STREAMINFO (34 bytes), marked as the last metadata block
    si = _BitWriter()
    si.write(FLAC_BLOCKSIZE, 16)
    si.write(FLAC_BLOCKSIZE, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sr, 20)
    si.write(ch - 1, 3)
    si.write(FLAC_BITS - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)
    out = bytearray(b"fLaC")
    out += struct.pack(">I", (1 << 31) | (0 << 24) | 34)[0:4]
    out += si.getvalue()

    frame_idx = 0
    pos = 0
    while pos < n:
        bs = min(FLAC_BLOCKSIZE, n - pos)
        blocks = [c[pos : pos + bs] for c in chans]
        if ch == 2:
            assign = (0b0001, 0b1000, 0b1001, 0b1010)[frame_idx % 4]
        else:
            assign = 0b0000
        left, right = (blocks + [None])[0], (blocks + [None, None])[1]
        if assign == 0b1000:  # left/side
            subs = [(left, FLAC_BITS), (left - right, FLAC_BITS + 1)]
        elif assign == 0b1001:  # right/side
            subs = [(left - right, FLAC_BITS + 1), (right, FLAC_BITS)]
        elif assign == 0b1010:  # mid/side
            subs = [((left + right) >> 1, FLAC_BITS),
                    (left - right, FLAC_BITS + 1)]
        else:
            subs = [(b, FLAC_BITS) for b in blocks]

        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed-blocksize stream
        bw.write(0b0110, 4)  # blocksize: 8-bit value-1 at end of header
        bw.write(0b0000, 4)  # sample rate: from STREAMINFO
        bw.write(assign, 4)
        bw.write(0b100, 3)  # 16 bits per sample
        bw.write(0, 1)  # reserved
        for b in _utf8_number(frame_idx):
            bw.write(b, 8)
        bw.write(bs - 1, 8)
        header = bw.getvalue()
        bw.write(crc8(header), 8)
        for ci, (sub, bps) in enumerate(subs):
            _encode_subframe(bw, sub, bps, doc_id, frame_idx, ci)
        bw.align()
        frame = bw.getvalue()
        out += frame
        out += struct.pack(">H", crc16(frame))
        pos += bs
        frame_idx += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_BLOCKSIZE_TABLE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048,
    0b1100: 4096, 0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}

_SAMPLE_RATE_TABLE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}

_SAMPLE_SIZE_TABLE = {
    0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32,
}


def _decode_subframe(br: _BitReader, bs: int, bps: int):
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0b000000:  # CONSTANT
        v = br.read_signed(bps)
        out = [v] * bs
    elif stype == 0b000001:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(bs)]
    elif 0b001000 <= stype <= 0b001100:  # FIXED 0..4
        order = stype & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, bs, order)
        coeffs = _FIXED_COEFFS[order]
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coeffs))
            out.append(pred + r)
    elif stype & 0b100000:  # LPC
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC coefficient precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift is reserved")
        coeffs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coeffs))
            out.append((pred >> shift) + r)
    else:
        raise ValueError(f"reserved subframe type {stype:#08b}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes):
    """Parse a FLAC stream into (n_channels, sample_rate, bits,
    samples[int interleaved numpy array]) — dependency-free. See the
    module docstring for the supported surface (which is the full
    RFC 9639 frame layer, not just what :func:`encode_flac_payload`
    emits)."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: missing fLaC marker")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = struct.unpack_from(">I", payload, pos)[0]
        last, btype, blen = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        pos += 4
        if btype == 0:
            streaminfo = payload[pos : pos + blen]
        pos += blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC stream missing STREAMINFO")
    sbr = _BitReader(streaminfo)
    sbr.read(16)  # min blocksize
    sbr.read(16)  # max blocksize
    sbr.read(24)
    sbr.read(24)
    sr = sbr.read(20)
    ch = sbr.read(3) + 1
    bps = sbr.read(5) + 1
    total = sbr.read(36)

    chans = [[] for _ in range(ch)]
    got = 0
    # total == 0 means UNKNOWN (RFC 9639 streaming encoders): decode
    # frames until the payload is exhausted instead of stopping early.
    unknown_total = total == 0
    while (got < total) if not unknown_total else (pos < len(payload)):
        frame_start = pos
        br = _BitReader(payload, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {pos}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy (number semantics only)
        bs_code = br.read(4)
        sr_code = br.read(4)
        assign = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0b0000:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        else:
            bs = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 0b0000:
            fsr = sr
        elif sr_code == 0b1100:
            fsr = br.read(8) * 1000
        elif sr_code == 0b1101:
            fsr = br.read(16)
        elif sr_code == 0b1110:
            fsr = br.read(16) * 10
        elif sr_code == 0b1111:
            raise ValueError("invalid sample-rate code")
        else:
            fsr = _SAMPLE_RATE_TABLE[sr_code]
        if fsr != sr:
            raise ValueError("frame sample rate differs from STREAMINFO")
        if ss_code == 0:
            fbps = bps
        else:
            fbps = _SAMPLE_SIZE_TABLE.get(ss_code)
            if fbps is None:
                raise ValueError(f"reserved sample-size code {ss_code:#05b}")
        header_len = br.bytepos - frame_start
        if crc8(payload[frame_start : frame_start + header_len]) != br.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        if assign <= 0b0111:
            nsub = assign + 1
            if nsub != ch:
                raise ValueError("channel count differs from STREAMINFO")
            subs = [_decode_subframe(br, bs, fbps) for _ in range(nsub)]
            decoded = subs
        elif assign in (0b1000, 0b1001, 0b1010):
            if ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            side_first = assign == 0b1001
            b0 = _decode_subframe(br, bs, fbps + (1 if side_first else 0))
            b1 = _decode_subframe(br, bs, fbps + (0 if side_first else 1))
            if assign == 0b1000:  # left/side
                left, side = b0, b1
                decoded = [left, [l - s for l, s in zip(left, side)]]
            elif assign == 0b1001:  # right/side
                side, right = b0, b1
                decoded = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid, side = b0, b1
                left, right = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)  # recover l+r exactly
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                decoded = [left, right]
        else:
            raise ValueError(f"reserved channel assignment {assign:#06b}")
        br.align()
        fcrc = struct.unpack_from(">H", payload, br.bytepos)[0]
        if crc16(payload[frame_start : br.bytepos]) != fcrc:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.bytepos + 2
        for c in range(ch):
            chans[c].extend(decoded[c])
        got += bs

    if not unknown_total and got != total:
        raise ValueError(f"decoded {got} samples, STREAMINFO says {total}")
    total = got
    inter = np.empty(total * ch, dtype=np.int64)
    for c in range(ch):
        inter[c::ch] = chans[c]
    return ch, sr, bps, inter
