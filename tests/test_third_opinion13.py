"""Third-opinion audit, batch 13 (r17): multimodal codecs — the
VERDICT r16 priority ("the entries whose only independent check is the
shared oracle-SQL shape").

The codec entries' oracle gate has a structural blind spot: the
closed-form SQL verifies that the DECODED array equals the synthesis
contract, but the product both ENCODES and DECODES the container, so
a matched pair of spec misreadings (encoder writes top-down rows,
decoder doesn't flip; both agree the bytes mean X when the spec says
Y) cancels out and hash-matches. These audits break the symmetry with
INDEPENDENT codec halves written directly from the public format
specs (plain bytes/int loops — no numpy reshape tricks, no product
helpers):

* independent ENCODER -> product decoder: proves the product decoder
  reads real spec-conformant files, including layout variants the
  product encoder never emits (top-down negative-height BMPs,
  reordered WAV chunks, filter-0 single-IDAT PNGs);
* product encoder -> independent DECODER: proves the product's
  synthesized corpus is made of real files, not private dialects;
* independent expansion formulas for G.711 mu-law/A-law (the
  (2m+33)-form vs the product's bias-0x84 shift form) and an
  independently-typed IMA ADPCM state machine;
* end-to-end: every audited entry's Spark output rows re-derived per
  doc from the independent decoders.

Entries audited here: multimodal_decode_bmp, multimodal_decode_ppm,
multimodal_decode_wav, multimodal_decode_wav_mulaw,
multimodal_decode_wav_alaw, multimodal_decode_wav_pcm24,
multimodal_decode_wav_adpcm, multimodal_decode_wav_adpcm_stereo,
multimodal_decode_png, multimodal_decode_avi.
"""

from __future__ import annotations

import zlib

import pytest

from duckdb_redis_olap_scanner_spark.operators import multimodal as M
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR

# doc ids spanning all synthesis branches: w 4..16 (mod 13), h 2..8
# (mod 7), 1/2 channels, 1..3 ADPCM blocks with partial tails, both
# PNG interlace modes (doc_id % 3), 2..5 AVI frames.
DOC_IDS = list(range(0, 40)) + [97, 101, 211, 509]


# ---------------------------------------------------------------------------
# closed forms re-stated independently (plain list comprehensions)
# ---------------------------------------------------------------------------

def ref_image(d: int) -> tuple[int, int, list[int]]:
    w, h = 4 + d % 13, 2 + d % 7
    return w, h, [(d * 7 + k) % 256 for k in range(w * h * 3)]


def ref_audio_params(d: int) -> tuple[int, int, int]:
    return 1 + d % 2, 8000 + (d % 3) * 4000, 16 + d % 17


def ref_pcm16(d: int) -> list[int]:
    ch, _sr, f = ref_audio_params(d)
    return [((d * 11 + i * 97) % 65536) - 32768 for i in range(f * ch)]


def ref_video(d: int) -> tuple[int, int, int, list[int]]:
    w, h = 4 + d % 13, 2 + d % 7
    nf = 2 + d % 4
    px = [
        (d * 7 + f * 131 + k) % 256
        for f in range(nf)
        for k in range(w * h * 3)
    ]
    return w, h, nf, px


# ---------------------------------------------------------------------------
# independent BMP codec (BITMAPFILEHEADER/BITMAPINFOHEADER spec)
# ---------------------------------------------------------------------------

def ind_encode_bmp(d: int, top_down: bool = False) -> bytes:
    w, h, v = ref_image(d)
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            base = (y * w + x) * 3
            row += bytes((v[base + 2], v[base + 1], v[base]))  # BGR
        row += b"\x00" * (stride - w * 3)
        rows.append(bytes(row))
    body = b"".join(rows if top_down else rows[::-1])
    h_raw = -h if top_down else h
    file_hdr = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00" * 4
        + (54).to_bytes(4, "little")
    )
    info_hdr = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h_raw.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return file_hdr + info_hdr + body


def ind_decode_bmp(payload: bytes) -> tuple[int, int, list[int]]:
    assert payload[:2] == b"BM"
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    assert int.from_bytes(payload[28:30], "little") == 24
    assert int.from_bytes(payload[30:34], "little") == 0
    h = abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    ys = range(h) if h_raw < 0 else range(h - 1, -1, -1)
    out: list[int] = []
    for y in ys:
        row = payload[off + y * stride : off + y * stride + w * 3]
        for x in range(w):
            out += [row[x * 3 + 2], row[x * 3 + 1], row[x * 3]]
    return w, h, out


@pytest.mark.parametrize("d", DOC_IDS)
def test_bmp_product_decoder_reads_independent_files(d):
    w, h, v = ref_image(d)
    for top_down in (False, True):
        px = M.decode_bmp(ind_encode_bmp(d, top_down=top_down))
        assert px.shape == (h, w, 3)
        assert px.reshape(-1).tolist() == v


@pytest.mark.parametrize("d", DOC_IDS)
def test_bmp_independent_decoder_reads_product_files(d):
    w, h, v = ref_image(d)
    iw, ih, got = ind_decode_bmp(M.encode_bmp_payload(d))
    assert (iw, ih, got) == (w, h, v)


# ---------------------------------------------------------------------------
# independent PPM codec (netpbm P6 spec)
# ---------------------------------------------------------------------------

def ind_encode_ppm(d: int) -> bytes:
    """Spec-legal header the product encoder never emits: comments on
    their own lines between every token, tab/extra whitespace
    separators."""
    w, h, v = ref_image(d)
    header = (
        b"P6\n# independent encoder\n# second comment\n"
        + str(w).encode() + b"\t \n" + str(h).encode() + b"\n255\n"
    )
    return header + bytes(v)


def ind_decode_ppm(payload: bytes) -> tuple[int, int, list[int]]:
    assert payload[:2] == b"P6"
    toks: list[int] = []
    pos = 2
    while len(toks) < 3:
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.index(b"\n", pos)
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while not payload[end : end + 1].isspace():
                end += 1
            toks.append(int(payload[pos:end]))
            pos = end
    pos += 1  # the single whitespace after maxval
    w, h, maxval = toks
    assert maxval == 255
    return w, h, list(payload[pos : pos + w * h * 3])


@pytest.mark.parametrize("d", DOC_IDS)
def test_ppm_product_decoder_reads_independent_files(d):
    w, h, v = ref_image(d)
    px = M.decode_ppm(ind_encode_ppm(d))
    assert px.shape == (h, w, 3)
    assert px.reshape(-1).tolist() == v


@pytest.mark.parametrize("d", DOC_IDS)
def test_ppm_independent_decoder_reads_product_files(d):
    assert ind_decode_ppm(M.encode_ppm_payload(d)) == ref_image(d)


# ---------------------------------------------------------------------------
# independent WAV/RIFF codec (PCM16), plus the PCM24 byte widening
# ---------------------------------------------------------------------------

def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WAVE"
    for cid, data in chunks:
        body += cid + len(data).to_bytes(4, "little") + data
        if len(data) & 1:
            body += b"\x00"
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def ind_encode_wav(d: int) -> bytes:
    """Chunk layout the product encoder never emits: a leading odd
    JUNK chunk and a fact chunk before data."""
    ch, sr, f = ref_audio_params(d)
    data = b"".join(
        (s & 0xFFFF).to_bytes(2, "little") for s in ref_pcm16(d)
    )
    fmt = (
        (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + sr.to_bytes(4, "little")
        + (sr * ch * 2).to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    return _riff([
        (b"JUNK", b"oddpad!"),        # 7 bytes: exercises even-padding
        (b"fmt ", fmt),
        (b"fact", (f).to_bytes(4, "little")),
        (b"data", data),
    ])


def ind_decode_wav(payload: bytes):
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)
    assert fmt is not None and data is not None
    audio_format = int.from_bytes(fmt[0:2], "little")
    ch = int.from_bytes(fmt[2:4], "little")
    sr = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    assert (audio_format, bits) == (1, 16)
    samples = [
        int.from_bytes(data[i : i + 2], "little", signed=True)
        for i in range(0, len(data), 2)
    ]
    return ch, sr, samples


@pytest.mark.parametrize("d", DOC_IDS)
def test_wav_product_decoder_reads_independent_files(d):
    ch, sr, f = ref_audio_params(d)
    got_ch, got_sr, got_bits, samples = M.decode_wav(ind_encode_wav(d))
    assert (got_ch, got_sr, got_bits) == (ch, sr, 16)
    assert samples.tolist() == ref_pcm16(d)


@pytest.mark.parametrize("d", DOC_IDS)
def test_wav_independent_decoder_reads_product_files(d):
    ch, sr, _f = ref_audio_params(d)
    got_ch, got_sr, samples = ind_decode_wav(M.encode_wav_payload(d))
    assert (got_ch, got_sr) == (ch, sr)
    assert samples == ref_pcm16(d)


@pytest.mark.parametrize("d", DOC_IDS)
def test_pcm24_independent_byte_widening(d):
    """3-byte little-endian two's complement via int.from_bytes — no
    shifts, no masks — over the product payload's data chunk."""
    ch, _sr, f = ref_audio_params(d)
    payload = M.encode_wav_pcm24_payload(d)
    pos = 12
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    got = [
        int.from_bytes(data[i : i + 3], "little", signed=True)
        for i in range(0, len(data), 3)
    ]
    want = [
        ((d * 29 + i * 5999471) % 16777216) - 8388608
        for i in range(f * ch)
    ]
    assert got == want
    # and the product decoder's shift-based widening agrees
    _, _, bits, samples = M.decode_wav(payload)
    assert bits == 24 and samples.tolist() == want


# ---------------------------------------------------------------------------
# independent G.711 expansions: the (2m+33)*2^seg textbook form vs the
# product's bias-0x84 / 0x108 shift forms — equal only if both read
# the spec right.
# ---------------------------------------------------------------------------

def ind_mulaw(b: int) -> int:
    u = ~b & 0xFF
    seg, mant = (u >> 4) & 0x7, u & 0xF
    mag = 4 * ((2 * mant + 33) * (1 << seg) - 33)
    return -mag if u & 0x80 else mag


def ind_alaw(b: int) -> int:
    a = b ^ 0x55
    seg, mant = (a >> 4) & 0x7, a & 0xF
    if seg == 0:
        mag = (2 * mant + 1) << 3
    else:
        mag = (2 * mant + 33) << (seg + 2)
    return mag if a & 0x80 else -mag


def test_mulaw_expansion_all_256_codes():
    import numpy as np

    enc = np.arange(256, dtype=np.uint8)
    assert M.mulaw_expand(enc).tolist() == [ind_mulaw(b) for b in range(256)]
    # landmark values from the G.711 tables
    assert ind_mulaw(0xFF) == 0 and ind_mulaw(0x7F) == 0
    assert ind_mulaw(0x00) == -32124 and ind_mulaw(0x80) == 32124


def test_alaw_expansion_all_256_codes():
    import numpy as np

    enc = np.arange(256, dtype=np.uint8)
    assert M.alaw_expand(enc).tolist() == [ind_alaw(b) for b in range(256)]
    assert ind_alaw(0x55) == -8 and ind_alaw(0xD5) == 8
    assert ind_alaw(0x2A) == -32256 and ind_alaw(0xAA) == 32256


@pytest.mark.parametrize("d", DOC_IDS[:12])
def test_g711_payloads_roundtrip_independent_tables(d):
    """Product decode_wav over the product G.711 payloads must equal
    the independent table applied to the closed-form byte stream."""
    ch, sr, f = ref_audio_params(d)
    n = f * ch
    _, _, bits, samples = M.decode_wav(M.encode_wav_mulaw_payload(d))
    assert bits == 8
    want = [ind_mulaw((d * 13 + i * 31) % 256) for i in range(n)]
    assert samples.tolist() == want
    _, _, bits, samples = M.decode_wav(M.encode_wav_alaw_payload(d))
    assert bits == 8
    want = [ind_alaw((d * 19 + i * 23) % 256) for i in range(n)]
    assert samples.tolist() == want


# ---------------------------------------------------------------------------
# independent IMA ADPCM decoder (step table + update rule typed from
# the IMA/DVI spec; full payload parse including fmt ext + fact)
# ---------------------------------------------------------------------------

IND_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IND_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ind_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    step = IND_STEPS[idx]
    diff = step >> 3
    for bit, sh in ((1, 2), (2, 1)):
        if nib & bit:
            diff += step >> sh
    if nib & 4:
        diff += step
    pred += -diff if nib & 8 else diff
    pred = min(32767, max(-32768, pred))
    idx = min(88, max(0, idx + IND_ADJ[nib & 7]))
    return pred, idx


def _ind_wav_chunks(payload: bytes) -> dict[bytes, bytes]:
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    out: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        out[cid] = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    return out


def ind_decode_adpcm_mono(payload: bytes) -> list[int]:
    ch_map = _ind_wav_chunks(payload)
    fmt, data = ch_map[b"fmt "], ch_map[b"data"]
    assert int.from_bytes(fmt[0:2], "little") == 17  # IMA ADPCM
    assert int.from_bytes(fmt[2:4], "little") == 1
    spb = int.from_bytes(fmt[18:20], "little")
    n = int.from_bytes(ch_map[b"fact"][:4], "little")
    out: list[int] = []
    pos = 0
    while len(out) < n:
        pred = int.from_bytes(data[pos : pos + 2], "little", signed=True)
        idx = data[pos + 2]
        out.append(pred)
        k = min(spb - 1, n - len(out))
        for j in range(k):
            byte = data[pos + 4 + j // 2]
            nib = byte & 0xF if j % 2 == 0 else byte >> 4
            pred, idx = _ind_step(pred, idx, nib)
            out.append(pred)
        pos += 4 + (k + 1) // 2
    return out


def ind_decode_adpcm_stereo(payload: bytes) -> list[int]:
    """Interleaved L0,R0,L1,R1,... from the standard stereo layout:
    per block one header per channel, then alternating 4-byte (8
    nibble) groups per channel."""
    ch_map = _ind_wav_chunks(payload)
    fmt, data = ch_map[b"fmt "], ch_map[b"data"]
    assert int.from_bytes(fmt[0:2], "little") == 17
    assert int.from_bytes(fmt[2:4], "little") == 2
    spb = int.from_bytes(fmt[18:20], "little")
    n = int.from_bytes(ch_map[b"fact"][:4], "little")  # frames/channel
    chans: list[list[int]] = [[], []]
    pos = 0
    while len(chans[0]) < n:
        state = []
        for c in (0, 1):
            pred = int.from_bytes(
                data[pos + 4 * c : pos + 4 * c + 2], "little", signed=True
            )
            idx = data[pos + 4 * c + 2]
            chans[c].append(pred)
            state.append((pred, idx))
        pos += 8
        k = min(spb - 1, n - len(chans[0]))
        for g in range((k + 7) // 8):
            for c in (0, 1):
                pred, idx = state[c]
                for j in range(min(8, k - g * 8)):
                    byte = data[pos + j // 2]
                    nib = byte & 0xF if j % 2 == 0 else byte >> 4
                    pred, idx = _ind_step(pred, idx, nib)
                    chans[c].append(pred)
                state[c] = (pred, idx)
                pos += 4
    return [s for pair in zip(chans[0], chans[1]) for s in pair]


@pytest.mark.parametrize("d", DOC_IDS)
def test_adpcm_mono_independent_decoder_matches_product(d):
    payload = M.encode_wav_adpcm_payload(d)
    _, _, bits, samples = M.decode_wav(payload)
    assert bits == 4
    assert samples.tolist() == ind_decode_adpcm_mono(payload)


@pytest.mark.parametrize("d", DOC_IDS)
def test_adpcm_stereo_independent_decoder_matches_product(d):
    payload = M.encode_wav_adpcm_stereo_payload(d)
    _, _, bits, samples = M.decode_wav(payload)
    assert bits == 4
    assert samples.tolist() == ind_decode_adpcm_stereo(payload)


# ---------------------------------------------------------------------------
# independent PNG decoder (chunk walk, zlib, all five unfilters,
# Adam7 reassembly — typed from the PNG spec, plain byte lists)
# ---------------------------------------------------------------------------

_IND_ADAM7 = [
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
]


def _ind_unfilter(stream: bytes, w: int, h: int, offset: int):
    """Unfilter h scanlines of w pixels (RGB8) starting at byte
    ``offset`` of the decompressed stream; returns (rows, new_offset)
    where rows is a list of per-row RGB byte lists."""
    bpp, rb = 3, w * 3
    rows: list[list[int]] = []
    prior = [0] * rb
    pos = offset
    for _y in range(h):
        ftype = stream[pos]
        line = list(stream[pos + 1 : pos + 1 + rb])
        pos += 1 + rb
        cur = [0] * rb
        for i in range(rb):
            a = cur[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            x = line[i]
            if ftype == 0:
                r = x
            elif ftype == 1:
                r = x + a
            elif ftype == 2:
                r = x + b
            elif ftype == 3:
                r = x + (a + b) // 2
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r = x + pr
            else:
                raise AssertionError(f"bad filter {ftype}")
            cur[i] = r & 0xFF
        rows.append(cur)
        prior = cur
    return rows, pos


def ind_decode_png(payload: bytes):
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    ihdr = None
    while pos < len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        crc = int.from_bytes(payload[pos + 8 + size : pos + 12 + size], "big")
        assert crc == zlib.crc32(ctype + data) & 0xFFFFFFFF
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        pos += 12 + size
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, interlace = ihdr[8], ihdr[9], ihdr[12]
    assert (depth, color) == (8, 2)  # 8-bit truecolor
    stream = zlib.decompress(idat)
    flat = [0] * (w * h * 3)
    if interlace == 0:
        rows, pos2 = _ind_unfilter(stream, w, h, 0)
        for y in range(h):
            flat[y * w * 3 : (y + 1) * w * 3] = rows[y]
    else:
        pos2 = 0
        for x0, dx, y0, dy in _IND_ADAM7:
            pw = max(0, (w - x0 + dx - 1) // dx)
            ph = max(0, (h - y0 + dy - 1) // dy)
            if pw == 0 or ph == 0:
                continue
            rows, pos2 = _ind_unfilter(stream, pw, ph, pos2)
            for i in range(ph):
                for j in range(pw):
                    base = ((y0 + i * dy) * w + (x0 + j * dx)) * 3
                    flat[base : base + 3] = rows[i][j * 3 : j * 3 + 3]
        assert pos2 == len(stream)
    return w, h, flat, len(stream)


def ind_encode_png(d: int) -> bytes:
    """Filter-0-only, single-IDAT, non-interlaced — a spec-legal shape
    the product encoder never emits (it cycles filters and splits
    IDAT)."""
    w, h, v = ref_image(d)
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += bytes(v[y * w * 3 : (y + 1) * w * 3])

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes((8, 2, 0, 0, 0))
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("d", DOC_IDS)
def test_png_independent_decoder_reads_product_files(d):
    """Covers both interlace modes (doc_id % 3 == 0 is Adam7)."""
    w, h, v = ref_image(d)
    iw, ih, flat, _n_raw = ind_decode_png(M.encode_png_payload(d))
    assert (iw, ih, flat) == (w, h, v)


@pytest.mark.parametrize("d", DOC_IDS[:12])
def test_png_product_decoder_reads_independent_files(d):
    w, h, v = ref_image(d)
    px, n_raw = M.decode_png(ind_encode_png(d))
    assert px.shape == (h, w, 3)
    assert px.reshape(-1).tolist() == v
    assert n_raw == h * (1 + 3 * w)


# ---------------------------------------------------------------------------
# independent AVI parser (RIFF/LIST walk + DIB frames)
# ---------------------------------------------------------------------------

def ind_decode_avi(payload: bytes):
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    frames: list[bytes] = []
    dims: list[int] = []

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)
            elif cid == b"avih":
                dims.extend(
                    int.from_bytes(payload[body + 4 * i : body + 4 * i + 4],
                                   "little")
                    for i in (8, 9, 4)  # width, height, total frames
                )
            elif cid == b"00db":
                frames.append(payload[body : body + size])
            pos = body + size + (size & 1)

    walk(12, len(payload))
    w, h, nf = dims
    assert len(frames) == nf
    stride = (w * 3 + 3) // 4 * 4
    flat: list[int] = []
    for body in frames:
        for y in range(h - 1, -1, -1):  # bottom-up DIB rows
            row = body[y * stride : y * stride + w * 3]
            for x in range(w):
                flat += [row[x * 3 + 2], row[x * 3 + 1], row[x * 3]]
    return w, h, nf, flat


@pytest.mark.parametrize("d", DOC_IDS)
def test_avi_independent_parser_reads_product_files(d):
    assert ind_decode_avi(M.encode_avi_payload(d)) == ref_video(d)


# ---------------------------------------------------------------------------
# end-to-end: the Spark entries' output rows re-derived per doc from
# the INDEPENDENT decoders over the product payload bytes
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401

    return catalog.registry()


def _weighted(flat: list[int]) -> int:
    return sum((i + 1) * v for i, v in enumerate(flat))


def _entry_rows(reg, spark, name: str) -> dict[int, tuple]:
    df = reg[name].fn(spark, SF_DIR)
    return {int(r[0]): tuple(r) for r in df.collect()}


def test_entry_bmp_ppm_rows_match_independent_decode(reg, spark):
    for name, enc, dec in (
        ("multimodal_decode_bmp", M.encode_bmp_payload, ind_decode_bmp),
        ("multimodal_decode_ppm", M.encode_ppm_payload, ind_decode_ppm),
    ):
        rows = _entry_rows(reg, spark, name)
        assert len(rows) > 0
        for did, row in sorted(rows.items())[:20]:
            payload = enc(did)
            w, h, flat = dec(payload)
            want = (
                did, w, h, len(payload),
                sum(flat[0::3]), sum(flat[1::3]), sum(flat[2::3]),
                _weighted(flat),
            )
            assert row == want, f"{name} doc {did}"


def test_entry_wav_rows_match_independent_decode(reg, spark):
    rows = _entry_rows(reg, spark, "multimodal_decode_wav")
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:20]:
        ch, sr, f = ref_audio_params(did)
        _gc, _gs, samples = ind_decode_wav(M.encode_wav_payload(did))
        want = (
            did, ch, sr, 16, f,
            sum(samples[0::ch]),
            sum(samples[1::ch]) if ch > 1 else 0,
            _weighted(samples),
        )
        assert row == want, f"wav doc {did}"


@pytest.mark.parametrize(
    "name,decoder,payload_fn,bits",
    [
        ("multimodal_decode_wav_mulaw",
         lambda p: [ind_mulaw(b) for b in _ind_wav_chunks(p)[b"data"]],
         M.encode_wav_mulaw_payload, 8),
        ("multimodal_decode_wav_alaw",
         lambda p: [ind_alaw(b) for b in _ind_wav_chunks(p)[b"data"]],
         M.encode_wav_alaw_payload, 8),
        ("multimodal_decode_wav_adpcm", ind_decode_adpcm_mono,
         M.encode_wav_adpcm_payload, 4),
        ("multimodal_decode_wav_adpcm_stereo", ind_decode_adpcm_stereo,
         M.encode_wav_adpcm_stereo_payload, 4),
    ],
)
def test_entry_coded_audio_rows_match_independent_decode(
    reg, spark, name, decoder, payload_fn, bits
):
    rows = _entry_rows(reg, spark, name)
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:12]:
        samples = decoder(payload_fn(did))
        ch = row[1]
        want_tail = (
            len(samples) // ch,
            sum(samples[0::ch]),
            sum(samples[1::ch]) if ch > 1 else 0,
            _weighted(samples),
        )
        assert row[3] == bits and row[4:] == want_tail, f"{name} doc {did}"


def test_entry_pcm24_rows_match_independent_decode(reg, spark):
    rows = _entry_rows(reg, spark, "multimodal_decode_wav_pcm24")
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:12]:
        data = _ind_wav_chunks(M.encode_wav_pcm24_payload(did))[b"data"]
        samples = [
            int.from_bytes(data[i : i + 3], "little", signed=True)
            for i in range(0, len(data), 3)
        ]
        ch = row[1]
        assert row[3] == 24
        assert row[4:] == (
            len(samples) // ch,
            sum(samples[0::ch]),
            sum(samples[1::ch]) if ch > 1 else 0,
            _weighted(samples),
        ), f"pcm24 doc {did}"


def test_entry_png_rows_match_independent_decode(reg, spark):
    rows = _entry_rows(reg, spark, "multimodal_decode_png")
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:20]:
        w, h, flat, n_raw = ind_decode_png(M.encode_png_payload(did))
        assert row == (
            did, w, h, n_raw,
            sum(flat[0::3]), sum(flat[1::3]), sum(flat[2::3]),
            _weighted(flat),
        ), f"png doc {did}"


def test_entry_avi_rows_match_independent_decode(reg, spark):
    rows = _entry_rows(reg, spark, "multimodal_decode_avi")
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:20]:
        w, h, nf, flat = ind_decode_avi(M.encode_avi_payload(did))
        frame_sz = w * h * 3
        sampled = [
            v
            for f in range(0, nf, 2)
            for v in flat[f * frame_sz : (f + 1) * frame_sz]
        ]
        assert row == (
            did, w, h, nf, (nf + 1) // 2,
            sum(flat), sum(sampled), _weighted(flat),
        ), f"avi doc {did}"


@pytest.mark.parametrize("d", [0, 7, 25])
def test_audit_has_teeth_corruption_is_detected(d):
    """Sanity of the audit itself: flipping a payload byte in the
    DATA region must change the independent decode (or make it raise)
    — proving these tests actually read the bytes rather than
    vacuously agreeing with the closed form."""
    w, h, v = ref_image(d)
    # BMP: corrupt the first pixel byte at the data offset
    p = bytearray(M.encode_bmp_payload(d))
    off = int.from_bytes(p[10:14], "little")
    p[off] ^= 0xFF  # first data byte = a pixel byte (bottom row)
    assert ind_decode_bmp(bytes(p))[2] != v
    # PPM: corrupt the last pixel byte
    p = bytearray(M.encode_ppm_payload(d))
    p[-1] ^= 0xFF
    assert ind_decode_ppm(bytes(p))[2] != v
    # WAV: corrupt the last data byte (int16 stream, even length)
    p = bytearray(M.encode_wav_payload(d))
    p[-1] ^= 0xFF
    _c, _s, samples = ind_decode_wav(bytes(p))
    assert samples != ref_pcm16(d)
    # PNG: corrupt an IDAT byte — the CRC walk must refuse
    p = bytearray(M.encode_png_payload(d))
    idat = bytes(p).index(b"IDAT")
    p[idat + 6] ^= 0xFF
    with pytest.raises(AssertionError):
        ind_decode_png(bytes(p))
    # AVI: corrupt the first byte of the last frame's DIB data (the
    # payload's final bytes can be row/chunk PADDING a correct parser
    # ignores — the first data byte never is)
    p = bytearray(M.encode_avi_payload(d))
    p[bytes(p).rindex(b"00db") + 8] ^= 0xFF
    assert ind_decode_avi(bytes(p))[3] != ref_video(d)[3]
