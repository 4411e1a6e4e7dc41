"""External-encoder interop vectors for the hand-rolled codecs.

The codec family is otherwise validated against self-synthesized
streams (closed-form oracles + corruption fuzz) — these tests close
the "decodes its own synthesis" caveat by checking against INDEPENDENT
public implementations available in this environment:

- CPython's ``audioop`` (Sun-derived G.711 and IMA/DVI ADPCM code) for
  the mu-law / A-law expansion tables and the ADPCM step machine;
- the stdlib ``wave`` writer for RIFF/WAVE framing of PCM16/PCM24;
- payloads *encoded by audioop* wrapped in format-7/6 WAV containers,
  decoded end-to-end by our ``decode_wav``.

PNG's deflate layer (stdlib zlib) and WebDataset's tar read-back
(stdlib tarfile) are already external by construction; PNG and GIF
additionally decode widely-published public 1x1 literals produced by
external encoders (see the image-container section below).

Round 12 adds three more external families:

- FLAC: the complete 57-byte example stream from the FLAC
  specification (RFC 9639, appendix decoding examples). This vector
  is SELF-AUTHENTICATING: STREAMINFO embeds the MD5 of the decoded
  audio, so a byte drift in the vector or a sample drift in our
  decoder both break a 128-bit digest comparison.
- TIFF PackBits: the canonical worked example from Apple Technote
  TN1023 (the document the TIFF 6.0 spec defers to for PackBits) —
  published packed bytes against published unpacked bytes.
- VP8L: the widely-circulated 34-byte minimal lossless WebP (1x1
  fully-transparent pixel via a 1-entry color-indexing transform),
  walked through the real prefix-code/transform machinery.

Round 13 closes the last two synthesis-only families:

- JPEG: two REAL-encoder public files shipped in this environment
  (CPython's test-suite python.jpg — baseline 4:2:0; Node.js's
  thin-white-stripe.jpg — progressive 4:4:4 at non-MCU-multiple
  dims), compared against the JDK ImageIO decoder's rasters (baked
  as literals; generated once via Spark's JVM gateway).
- TIFF-LZW: a strip encoded by the JDK ImageIO TIFF writer — which
  turned out to emit LATE width changes (PDF EarlyChange 0), one
  code later than the TIFF 6.0 / libtiff convention, catching a
  real-world variant our spec-only decoder rejected.

Every codec family now has at least one external vector. A second
r13 batch adds CPython's real-encoder python.gif (exact-match against
the JDK decoder on opaque pixels), its RGBA python.tiff (genuinely
translucent — parses fully, rejected by the opaque-RGB contract), a
JDK-encoded fully-opaque RGBA+LZW TIFF (the SamplesPerPixel=4 path,
bit-exact), and a JDK-encoded 13x7 baseline 4:2:0 JPEG (the
interleaved partial-MCU path).
"""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

import duckdb_redis_olap_scanner_spark.operators.multimodal as M

# audioop was removed in Python 3.13. ADVICE r11: a module-level
# importorskip would skip this WHOLE file there — including the
# PNG/GIF/FLAC/PackBits vectors that never touch audioop — so only
# the audioop-backed tests carry the gate.
try:
    import audioop
except ImportError:  # pragma: no cover - Python >= 3.13
    audioop = None

requires_audioop = pytest.mark.skipif(
    audioop is None, reason="audioop removed in Python 3.13"
)


# ---------------------------------------------------------------------------
# G.711: full-table equality against audioop
# ---------------------------------------------------------------------------


@requires_audioop
def test_mulaw_table_matches_audioop_all_codes():
    codes = bytes(range(256))
    ours = M.mulaw_expand(np.frombuffer(codes, dtype=np.uint8))
    ref = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    assert (ours == ref).all()


@requires_audioop
def test_alaw_table_matches_audioop_all_codes():
    codes = bytes(range(256))
    ours = M.alaw_expand(np.frombuffer(codes, dtype=np.uint8))
    ref = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert (ours == ref).all()


# ---------------------------------------------------------------------------
# IMA ADPCM: step machine vs audioop.adpcm2lin
# ---------------------------------------------------------------------------


@requires_audioop
def test_ima_step_machine_matches_audioop():
    """Drive the same nibble stream through audioop's DVI/IMA decoder
    (state starts (0, 0)) and our `_ima_step` chain: predictions must
    agree sample for sample. audioop packs the FIRST code in the HIGH
    nibble; repack accordingly."""
    import random

    rng = random.Random(11)
    nibbles = [rng.randrange(16) for _ in range(2000)]
    packed = bytes(
        (nibbles[i] << 4) | nibbles[i + 1]
        for i in range(0, len(nibbles), 2)
    )
    ref = np.frombuffer(audioop.adpcm2lin(packed, 2, None)[0], dtype="<i2")
    pred, idx = 0, 0
    ours = []
    for nib in nibbles:
        pred, idx = M._ima_step(pred, idx, nib)
        ours.append(pred)
    assert (np.asarray(ours, dtype=np.int16) == ref).all()


# ---------------------------------------------------------------------------
# RIFF/WAVE framing written by the stdlib wave module
# ---------------------------------------------------------------------------


def _wave_write(sampwidth: int, channels: int, rate: int, frames: bytes) -> bytes:
    buf = io.BytesIO()
    import wave

    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(sampwidth)
    w.setframerate(rate)
    w.writeframes(frames)
    w.close()
    return buf.getvalue()


def test_decode_wav_pcm16_from_wave_module():
    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, size=800, dtype=np.int16)
    payload = _wave_write(2, 2, 16000, samples.tobytes())
    ch, sr, bits, out = M.decode_wav(payload)
    assert (ch, sr, bits) == (2, 16000, 16)
    assert (out == samples).all()


def test_decode_wav_pcm24_from_wave_module():
    """wave writes 24-bit frames as packed little-endian 3-byte
    samples; our decoder must sign-extend them identically."""
    rng = np.random.default_rng(4)
    vals = rng.integers(-(2**23), 2**23, size=300, dtype=np.int32)
    frames = b"".join(
        int(v).to_bytes(3, "little", signed=True) for v in vals
    )
    payload = _wave_write(3, 1, 22050, frames)
    ch, sr, bits, out = M.decode_wav(payload)
    assert (ch, sr, bits) == (1, 22050, 24)
    assert (np.asarray(out, dtype=np.int64) == vals).all()


# ---------------------------------------------------------------------------
# End-to-end: audioop-ENCODED payloads inside G.711 WAV containers
# ---------------------------------------------------------------------------


def _g711_wav(fmt_tag: int, rate: int, data: bytes) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_tag, 1, rate, rate, 1, 8)
    chunks = (
        struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sII", b"fact", 4, len(data))
        + struct.pack("<4sI", b"data", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


@requires_audioop
@pytest.mark.parametrize(
    "fmt_tag,lin2,expand",
    [
        (7, "lin2ulaw", "ulaw2lin"),
        (6, "lin2alaw", "alaw2lin"),
    ],
    ids=["mulaw", "alaw"],
)
def test_decode_wav_g711_payload_encoded_by_audioop(fmt_tag, lin2, expand):
    rng = np.random.default_rng(5)
    pcm = rng.integers(-32768, 32768, size=500, dtype=np.int16)
    enc = getattr(audioop, lin2)(pcm.tobytes(), 2)
    ch, sr, bits, out = M.decode_wav(_g711_wav(fmt_tag, 8000, enc))
    assert (ch, sr, bits) == (1, 8000, 8)
    ref = np.frombuffer(getattr(audioop, expand)(enc, 2), dtype="<i2")
    assert (out == ref).all()


# ---------------------------------------------------------------------------
# Image containers: widely-published public literals (external encoders)
# ---------------------------------------------------------------------------

# The canonical 42-byte 1x1 "spacer" GIF89a (published everywhere as
# the smallest useful GIF): 2-color GCT, a graphic-control extension,
# LZW min code size 2, single pixel index 0 (black).
GIF_1PX_B64 = "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"

# The canonical 70-byte 1x1 PNG (the "smallest PNG" literal that
# circulates in every web-perf writeup): 8-bit RGBA, one scanline with
# filter type 1 (Sub), pixel (0, 0, 255, 127) — semi-transparent blue.
PNG_1PX_RGBA_B64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
    "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_decode_gif_public_1px_literal():
    import base64

    from duckdb_redis_olap_scanner_spark.operators.gif import decode_gif

    payload = base64.b64decode(GIF_1PX_B64)
    assert payload[:6] == b"GIF89a" and len(payload) == 42
    arr, table_n, interlaced = decode_gif(payload)
    assert arr.shape == (1, 1, 3)
    assert arr.tolist() == [[[0, 0, 0]]]
    assert table_n == 2 and not interlaced


def test_decode_png_public_1px_rgba_literal():
    """External vector AND an independent value oracle: the IDAT is
    inflated here with stdlib zlib and unfiltered by hand (filter 1 on
    the first pixel has left=0, so raw == pixel), then compared to the
    full decode_png container walk."""
    import base64
    import zlib

    import duckdb_redis_olap_scanner_spark.operators.multimodal as M

    payload = base64.b64decode(PNG_1PX_RGBA_B64)
    arr, n_raw = M.decode_png(payload)
    assert arr.shape == (1, 1, 4) and n_raw == 5
    assert arr.tolist() == [[[0, 0, 255, 127]]]

    pos = 8
    while pos < len(payload):
        (ln,), ct = struct.unpack_from(">I", payload, pos), payload[
            pos + 4 : pos + 8
        ]
        if ct == b"IDAT":
            raw = zlib.decompress(payload[pos + 8 : pos + 8 + ln])
            assert list(raw) == [1, 0, 0, 255, 127]
        pos += 12 + ln


def test_decode_png_gray_and_gray_alpha_independent_container():
    """Grayscale (color 0) and gray+alpha (color 4) PNGs built HERE
    from the spec (struct + zlib only — no shared code with the
    decoder) decode to the exact sample grid."""
    import zlib

    import duckdb_redis_olap_scanner_spark.operators.multimodal as M

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png(w, h, color, channels, samples):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        stride = w * channels
        raw = b"".join(
            b"\x00" + bytes(samples[y * stride : (y + 1) * stride])
            for y in range(h)
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    gray = [(7 * i + 3) % 256 for i in range(4 * 3)]
    arr, _ = M.decode_png(png(4, 3, 0, 1, gray))
    assert arr.shape == (3, 4, 1)
    assert arr.reshape(-1).tolist() == gray

    ga = [(11 * i + 5) % 256 for i in range(2 * 5 * 2)]
    arr, _ = M.decode_png(png(5, 2, 4, 2, ga))
    assert arr.shape == (2, 5, 2)
    assert arr.reshape(-1).tolist() == ga


def test_decode_png_paletted_independent_container():
    """8-bit paletted PNG (color 3) built from the spec (struct+zlib
    only): the index grid exercises filter types 0/1/2 and a 5-entry
    PLTE; decode must yield the palette-mapped RGB grid. An
    out-of-range index must raise, not wrap."""
    import zlib

    import numpy as np

    import duckdb_redis_olap_scanner_spark.operators.multimodal as M

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    plte = bytes(
        [10, 20, 30, 200, 0, 0, 0, 200, 0, 0, 0, 200, 123, 231, 111]
    )
    w, h = 4, 3
    idx = [[0, 1, 2, 3], [4, 3, 2, 1], [0, 0, 4, 4]]

    def filt(row, prior, ftype):
        if ftype == 0:
            return row
        if ftype == 1:  # Sub, bpp=1
            out, left = [], 0
            for x in row:
                out.append((x - left) % 256)
                left = x
            return out
        if ftype == 2:  # Up
            return [(x - p) % 256 for x, p in zip(row, prior)]
        raise AssertionError

    raw = b""
    prior = [0] * w
    for y, ftype in zip(range(h), (0, 1, 2)):
        raw += bytes([ftype]) + bytes(filt(idx[y], prior, ftype))
        prior = idx[y]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    arr, _ = M.decode_png(png)
    table = np.frombuffer(plte, dtype=np.uint8).reshape(5, 3)
    assert arr.shape == (3, 4, 3)
    assert (arr == table[np.array(idx)]).all()

    # out-of-range index: PLTE of 2 entries, index 2 used
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes(6))
        + chunk(b"IDAT", zlib.compress(b"\x00\x02"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="outside"):
        M.decode_png(bad)


def test_decode_png_16bit_independent_container():
    """16-bit gray and RGB PNGs built from the spec (struct+zlib
    only): filters operate on bytes with bpp = bytes-per-pixel, and
    the byte pairs must recombine big-endian into uint16 samples —
    including values whose high/low bytes differ wildly (the classic
    endianness trap)."""
    import zlib

    import numpy as np

    import duckdb_redis_olap_scanner_spark.operators.multimodal as M

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png16(w, h, color, channels, samples):
        ihdr = struct.pack(">IIBBBBB", w, h, 16, color, 0, 0, 0)
        row_samp = w * channels
        raw = b"".join(
            b"\x00"
            + b"".join(
                struct.pack(">H", v)
                for v in samples[y * row_samp : (y + 1) * row_samp]
            )
            for y in range(h)
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(47)
    gray = [int(v) for v in rng.randint(0, 65536, size=5 * 4)]
    arr, _ = M.decode_png(png16(5, 4, 0, 1, gray))
    assert arr.dtype == np.uint16 and arr.shape == (4, 5, 1)
    assert arr.reshape(-1).tolist() == gray

    rgb = [int(v) for v in rng.randint(0, 65536, size=3 * 2 * 3)]
    arr, _ = M.decode_png(png16(3, 2, 2, 3, rgb))
    assert arr.dtype == np.uint16 and arr.shape == (2, 3, 3)
    assert arr.reshape(-1).tolist() == rgb


def test_decode_png_subbyte_independent_containers():
    """1/2/4-bit gray and palette PNGs built from the spec (struct +
    zlib only, MSB-first bit packing by hand): decode must unpack
    bit-exact sample values — including widths that don't fill the
    last byte (the row-padding trap) — and map palette indices
    through the PLTE."""
    import zlib

    import numpy as np

    import duckdb_redis_olap_scanner_spark.operators.multimodal as M

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def pack_row(samples, depth):
        bits = "".join(format(v, f"0{depth}b") for v in samples)
        bits += "0" * (-len(bits) % 8)
        return bytes(
            int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
        )

    def png(w, h, depth, color, grid, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
        raw = b"".join(b"\x00" + pack_row(row, depth) for row in grid)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    # 1-bit gray, width 10 (6 pad bits per row)
    rng = np.random.RandomState(53)
    g1 = rng.randint(0, 2, size=(3, 10)).tolist()
    arr, _ = M.decode_png(png(10, 3, 1, 0, g1))
    assert arr.shape == (3, 10, 1) and arr[..., 0].tolist() == g1

    # 2-bit gray, width 5 (2 samples spill into a second byte)
    g2 = rng.randint(0, 4, size=(4, 5)).tolist()
    arr, _ = M.decode_png(png(5, 4, 2, 0, g2))
    assert arr[..., 0].tolist() == g2

    # 4-bit palette, width 3 (odd width — half-byte padding)
    plte = bytes(range(16 * 3))
    g4 = rng.randint(0, 16, size=(2, 3)).tolist()
    arr, _ = M.decode_png(png(3, 2, 4, 3, g4, plte))
    table = np.frombuffer(plte, dtype=np.uint8).reshape(16, 3)
    assert (arr == table[np.array(g4)]).all()

    # 4-bit palette index past the PLTE still raises
    with pytest.raises(ValueError, match="outside"):
        M.decode_png(png(1, 1, 4, 3, [[5]], bytes(9)))


def test_decode_gif87a_public_1px_literal():
    """The 35-byte GIF87a 1x1 literal (the 'smallest GIF' form that
    predates extensions) — exercises the 87a signature and the
    no-extension container path, complementing the 89a literal's
    graphic-control-extension skip."""
    import base64

    from duckdb_redis_olap_scanner_spark.operators.gif import decode_gif

    payload = base64.b64decode(
        "R0lGODdhAQABAIAAAAAAAAAAACwAAAAAAQABAAACAkQBADs="
    )
    assert payload[:6] == b"GIF87a" and len(payload) == 35
    arr, table_n, interlaced = decode_gif(payload)
    assert arr.shape == (1, 1, 3)
    assert arr.tolist() == [[[0, 0, 0]]]
    assert table_n == 2 and not interlaced


# ---------------------------------------------------------------------------
# FLAC: the RFC 9639 appendix example stream (external + self-authenticating)
# ---------------------------------------------------------------------------

# The FLAC specification's first worked decoding example: a complete
# 57-byte stream — fLaC marker, a last-block STREAMINFO (44.1 kHz,
# 2 channels, 16 bps, 1 interframe sample, min = max frame size 15),
# and one 15-byte frame (8-bit-at-end blocksize code, two VERBATIM
# subframes) carrying the documented samples 25588 (left) and
# 10416 (right).
FLAC_RFC9639_EXAMPLE1 = bytes.fromhex(
    "664c6143"                          # fLaC
    "80000022"                          # last=1, STREAMINFO, len 34
    "1000" "1000" "00000f" "00000f"     # block sizes, frame sizes
    "0ac442f0" "00000001"               # 44100 Hz, 2 ch, 16 bps, 1 sample
    "3e84b41807dc690307586a3dad1a2e0f"  # MD5 of the decoded audio
    "fff8691800" "00" "bf"              # frame header + CRC-8
    "0358fd0312"                        # 2 verbatim subframes
    "8b" "aa9a"                         # padding-to-byte + CRC-16
)


def test_decode_flac_rfc9639_example_stream():
    """End-to-end decode of the spec's own example file. The embedded
    STREAMINFO MD5 is computed over the interleaved little-endian
    samples, so matching it proves our frame-layer decode is
    bit-exact against an externally-authored stream — not just
    against our own encoder."""
    import hashlib

    from duckdb_redis_olap_scanner_spark.operators.flac import decode_flac

    ch, sr, bits, samples = decode_flac(FLAC_RFC9639_EXAMPLE1)
    assert (ch, sr, bits) == (2, 44100, 16)
    out = np.asarray(samples, dtype="<i2")
    # Interleaved [left, right] for the single interchannel sample —
    # the values the RFC's example walkthrough documents.
    assert out.tolist() == [25588, 10416]
    embedded_md5 = FLAC_RFC9639_EXAMPLE1[26:42]
    assert hashlib.md5(out.tobytes()).digest() == embedded_md5


def test_decode_flac_rfc9639_example_crc_enforced():
    """Flipping one payload bit in the example stream must be caught
    by the decoder's CRC verification, not silently decoded."""
    from duckdb_redis_olap_scanner_spark.operators.flac import decode_flac

    bad = bytearray(FLAC_RFC9639_EXAMPLE1)
    bad[48] ^= 0x01  # inside a verbatim subframe sample
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))


# ---------------------------------------------------------------------------
# TIFF PackBits: the Apple TN1023 worked example
# ---------------------------------------------------------------------------


def test_packbits_decode_tn1023_published_vector():
    """Apple Technote TN1023 — the PackBits definition the TIFF 6.0
    spec references — publishes this exact packed/unpacked pair.
    Decoding THEIR encoder's output (not ours) pins the run/literal
    control-byte conventions: 0x81..0xFF = repeat next byte
    (257 - n) times, 0x00..0x7F = copy n + 1 literals, 0x80 = no-op."""
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    unpacked = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA"
    )
    assert M.packbits_decode(packed, len(unpacked)) == unpacked
    # And the published example round-trips through our encoder too
    # (our packer need not emit Apple's exact control choices, but
    # decode(encode(x)) must reproduce x).
    assert M.packbits_decode(
        M.packbits_encode(unpacked), len(unpacked)
    ) == unpacked
    # TN1023's 0x80 no-op (absent from the worked example) must be
    # skipped wherever an encoder inserts it.
    assert M.packbits_decode(b"\x80\x01AB\x80", 2) == b"AB"


# ---------------------------------------------------------------------------
# VP8L: the public minimal lossless WebP literal
# ---------------------------------------------------------------------------

# The widely-circulated smallest valid lossless WebP (34 bytes): a
# 1x1 image whose single pixel is fully-transparent black, encoded
# through a 1-entry color-indexing (palette) transform.
WEBP_1PX_MIN = bytes.fromhex(
    "52494646" "1a000000" "57454250"        # RIFF, size 26, WEBP
    "5650384c" "0d000000"                   # VP8L chunk, size 13
    "2f00000010071011" "11888888" "fe0700"  # VP8L bitstream
)


def test_decode_vp8l_public_minimal_literal():
    """Walk the public literal through the real VP8L machinery (bit
    reader, transform parse, prefix-code image decode) and check the
    documented semantics: 1x1, one color-indexing transform whose
    palette holds a single fully-transparent-black entry, pixel
    ARGB = 0x00000000. The literal exercises an externally-encoded
    prefix-code layout our own encoder never emits."""
    from duckdb_redis_olap_scanner_spark.operators import vp8l as V

    body = WEBP_1PX_MIN[20 : 20 + struct.unpack_from("<I", WEBP_1PX_MIN, 16)[0]]
    br = V._LsbBitReader(body)
    assert br.read(8) == 0x2F
    w, h = br.read(14) + 1, br.read(14) + 1
    assert (w, h) == (1, 1)
    assert br.read(1) == 1  # alpha hint set — the pixel is transparent
    assert br.read(3) == 0  # version
    assert br.read(1) == 1  # one transform present...
    assert br.read(2) == 3  # ...color-indexing
    n_colors = br.read(8) + 1
    assert n_colors == 1
    deltas, _ = V._read_image_data(br, n_colors, 1, False)
    assert deltas == [0x00000000]  # transparent black palette entry
    assert br.read(1) == 0  # no further transforms
    argbs, _cache_bits = V._read_image_data(br, 1, 1, True)
    assert argbs == [0x00000000]


def test_decode_webp_minimal_literal_hits_rgb_contract():
    """The top-level decode_webp API deliberately serves only opaque
    RGB; the transparent public literal must be rejected by that
    contract (proving the alpha check runs on real external input),
    not crash or silently drop alpha."""
    from duckdb_redis_olap_scanner_spark.operators.vp8l import decode_webp

    with pytest.raises(ValueError, match="non-opaque"):
        decode_webp(WEBP_1PX_MIN)


# ---------------------------------------------------------------------------
# Round 13: JPEG and TIFF-LZW external-encoder vectors
# ---------------------------------------------------------------------------
#
# JPEG truth values come from an INDEPENDENT decoder available in this
# container: the JDK's com.sun.imageio JPEG reader (IJG-derived),
# driven once through Spark's JVM gateway; the decoded rasters are
# baked below as literals (BufferedImage.getRaster().getSamples — raw
# code values, NOT getRGB, whose gray->sRGB ICC transform distorts
# grayscale). The JPEG payloads themselves are published public files
# shipped in this environment:
#
# - _CPYTHON_LOGO_JPEG_HEX: Lib/test/test_email/data/python.jpg from
#   the CPython source distribution (PSF license) — a REAL-encoder
#   baseline SOF0 16x16 4:2:0 file.
# - _NODEJS_STRIPE_JPEG_HEX: doc/api_assets/thin-white-stripe.jpg from
#   the Node.js distribution (MIT) — a REAL-encoder PROGRESSIVE SOF2
#   493x58 4:4:4 file whose non-MCU-multiple dims exercise the
#   partial-MCU ceil-grid + crop path end to end.
#
# TIFF-LZW: no LZW TIFF ships in this container, so the vector is a
# strip ENCODED BY the JDK's com.sun.imageio TIFF writer (the
# independent encoder available here), over pixels reproduced by the
# closed-form formula in the test. Decoding it caught a real wild
# variant: the JDK emits LATE width changes (PDF's EarlyChange 0),
# one code later than the TIFF 6.0 / libtiff early change — see
# tiff_lzw_decode(early_change=).

_JDK_LZW_TIFF_HEX = (
    "4d4d002a00000008000c0100000300000001001700000101000300000001000b000001"
    "02000300000003000000a0010300030000000100050000010600030000000100020000"
    "0111000400000001000000b80115000300000001000300000116000300000001000b00"
    "0001170004000000010000038e011a000500000001000000a8011b0005000000010000"
    "00b0012800030000000100010000000000000000000800080008000000000001000000"
    "010000000100000001800020407018041c060105412030e0300823078145412030c42a"
    "071c060103f0d8248c1e05134420b2a090185b13834c42a071a45a0f380c0207719844"
    "fc36092147213460f028931f85534420b0340a020a018061b01810440c028a41206180"
    "280e370b8207c10049143a0a2607816530d830b42406984420e340881e6f17840ec280"
    "89f46a12420d8268b19851243c0aa647216500e82ea723860340a020841205140300c2"
    "f0181c6c06040f40a0922060144b0f82ca41206164220d300501c671583cdc2e081d45"
    "a113e08024831384d143a0a24472154c0f02c9f1985d4c360c2b46a195a12034270781"
    "85c0c038d412081e0181243018289400059443a0c2c0681a5f0b838cc14079b422103a"
    "0b8227b15849042809a244a14480882a4b87e0b13c1e02e528720c1581b032598660d1"
    "74180366089a0e0680a0101d82e04884090142483a058a00c0182b836068bc0301c328"
    "02078d8060203981e088f4050244086a0991018028478660a92c1f02c4e8720b948120"
    "305584e0c964110345c85a0d98014038638560e99c2b03c208320539c0589e0f8182b0"
    "20068ba0a81c3202c078d60582039018088f200824400040990e03828470700a92a1e8"
    "2c4e07c0b94619830550680c962148345c0540d97e17838630400e99a1283c6a04c0f9"
    "b62d8402703c060aa0e81a2e030070c60b81e35024080e2088223c018090fe05826430"
    "0c0a11a0282a4a0000b1361f82e510740c1521c832580680d16e198365f05c0e18a168"
    "3a660500f1a61383e6d044101c210842740b8110b61181c31040078d21282038054088"
    "ee178243f0580990a188284606c0a9261d82c4d0700b9421e830540040c95e038345b0"
    "080d97a048386201c0e9960983c690200f9b20a84070034109ce0f84477038119ea308"
    "4834050080de158223b05c090fa10826420480a1161382a490740b1321e82e500600c1"
    "4e198325706c0d16a048365e0180e1860783a650040f1a20283e6c030101be0d842730"
    "3c111da088467a028121f60b84a010d413364090f817026418560a1141202a488420b1"
    "301102e4f87e0c14c1c032e50345a06c0d97619838610180e9920483c680140f9ae038"
    "406f000109ca0e8447603c119e60d8487d028128020884c04024e80de141041902844a"
    "2c480680b12f0c13c1f0305287a0c958100345984e0d97415038608520e9901603c678"
    "260f9ac0b0406e82a109c80c0447583e119e4010487c802128000204c038161381c070"
    "500a81a14839762020"
)

_CPYTHON_LOGO_JPEG_HEX = (
    "ffd8ffe000104a46494600010101000100010000ffdb00430003020202020203020202"
    "0303030304060404040404080606050609080a0a090809090a0c0f0c0a0b0e0b09090d"
    "110d0e0f101011100a0c12131210130f101010ffdb0043010303030403040804040810"
    "0b090b1010101010101010101010101010101010101010101010101010101010101010"
    "101010101010101010101010101010101010ffc0001108001000100301220002110103"
    "1101ffc400160001010100000000000000000000000000070405ffc400241000010401"
    "0402020300000000000000000102030406050708121311220014093132ffc400150101"
    "0100000000000000000000000000000006ffc400231100010205030500000000000000"
    "000000010211030405062100123115166181e1ffda000c03010002110311003f0014a6"
    "d26a1b73c1e61312d4951cf31163e42565beba5aec694540b1e520b254a51fd2cab8fa"
    "f220ab963d976c9335e69b77d7e66da71781a5571c7f1cea71e24b39d7e32253f21a69"
    "ded4714a38b482e84b892a71691ecd2d213bf1efb91a74aceea15a758ed548ac655b85"
    "8b81857b21299867a96b94b949654fb9c88529114b812af07ad9f23c807e55be0df662"
    "a140cce8e69a3d5cb743b3d77a6558b1d9512188bf64b8d3f1c3680429c0d0febb3c02"
    "e03c5407b4bdd97b54e627fb6edf9460148262138db8529828370589727960e432896f"
    "c3828ea7528cea208dbe78191f07ad7fffd9"
)

_CPYTHON_LOGO_IMAGEIO_RGB_HEX = (
    "0002080000050100040004106582a05884ab4f7fad497bac4976af436b9c41637e0006"
    "1300010603000000020000020000050d00030b0001090003126586a5d8ffff5083ae40"
    "74a33f6da1436c9a4d6c8900041300010501000000010001060000030b00040e000919"
    "00071e5782a24b7fa4427a9f437aa13b6b99456b98405d7f0002190003090308040002"
    "00000501000b1f6a8aa15f84a15782a54d7fa4427a9f336f942b668e396e9a3c66904a"
    "62860007130103000703000907000502005590b85288b45684b6507eb2447aa83a77a3"
    "3675a131709c2a67933e6e9449617d000200efde8ef6de7ee5d1941100004a8dc24d8c"
    "c14f84ba4a7db24176a8427ba838729a346b92386e944169824d5d5c0f0900fbde69fb"
    "d856e9ce77180000578bc54b83b64882a8437ba04070a1446f9c3e6a8741677e43627e"
    "45585c080600ddcb69f6d44cfcd64ff0d3751901004e80b54e82b1427b994779904767"
    "7e1c323f000700000a00000700060800d2c463f7db56ffdb44f3ce41eacd671c030049"
    "83ab437ba0487999456771000600e3dea6f1e696f0e482f1e67aeee065f8dd52fcd941"
    "f8d231f2ce3aecd0621b0400467f9d4b7e9d49708d223634dfde9efbe882ffe46cffe3"
    "5af8dd48fddf43f9d235ffd737fad12bf4d03ed6be541a0800497894466e8850688000"
    "0400f4ec97ffec6fffdf5affda4fffd847ffd743ffd239fbc628fbcb29f3cd44ae9946"
    "0f030000061b000a1c000212090900f5e784f7dd52ffdd4ef0c133efc034eebf33edbc"
    "33e9bb34dfb837b89b3512010014060000000b000209000306070300efdd71ffe755ff"
    "dc46fdd542f7d148f1cf51e8c8571e05001103001105001402000e0000070000040000"
    "040301080200f6e27ff9dc5af4d24df8d553efd155ffff95d9c56e0e04000404000001"
    "000700020d0006060201030200010000070100dccb85e4cd6feed175ebcc6fe7ce6ad5"
    "c067aa9b5a090400000300010707000004010005000100000000010002070100140500"
    "1704001b01001d02001b03001906000f0200060200000300000304000105000106"
)

_NODEJS_STRIPE_JPEG_HEX = (
    "ffd8ffe000104a46494600010100000100010000ffdb00840001010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101010202"
    "0202020202020202020303030303030303030301010101010101020101020202010202"
    "0303030303030303030303030303030303030303030303030303030303030303030303"
    "0303030303030303030303030303ffc2001108003a01ed03011100021101031101ffc4"
    "001d00010003000203010000000000000000000008090a020601050b07ffda00080101"
    "00000000b0a0000000000000759ecc06bac0000000000f201c1f3dbfa1381c80000000"
    "000082d910d3ff00b5af3bbfc9c525ef23303ae49bc000000000000639e4354748a8b9"
    "6795b5036c02635f1da700000000000015bd376bdba1413b24ce75b44edcee6cff00d9"
    "000000000000010d224fe99665cc0000000000000115e11cd995600000000000000000"
    "ffc4001c0101000105010100000000000000000000000301020405060708ffda000801"
    "0210000000f9a400000000000050a81f4900000000001400918b30128000000000016c"
    "32f8c657ab5f1e44535c000000000000415b3e38ea7dcbacb6ed56eef0000000000002"
    "dadbe75cff007dbec8ac7380000000000000e774399da000000000000001a3e6fa4de0"
    "00000000000000003fffc4001c01010002020301000000000000000000000002060304"
    "05070801ffda0008010310000000f388000000000000003d1e00000000007c0036f500"
    "0000000000013d8c1d4fc576ff002797573eb44000000000000d98e4f18ed7a0fb0670"
    "af7358c0000000000009c67d555dec2baca19b58000000000000055eb7bf7cfa000000"
    "00000000af552d562000000000000000007fffc4002910000102050500020202030000"
    "0000000000060805070919220203040a11015013391418314860ffda00080101000108"
    "00b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d"
    "3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c"
    "34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14"
    "b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c"
    "52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c52c34f14b0d3c62c34"
    "f184ed13dc9abf7d43c5495869e2961a78a5869e2961a78a5869e2961a78a5869e2999"
    "9999999999999999999999999999999999999999999999999999999999999999999999"
    "99999999999999e6a3cd479a8f351e6a3cd479a8f351e6a3f1fcfc7f8fc5f244e724d5"
    "943d85959a25979a8f351e6a3cd479a8f351e6afb07dd5116df4f197d075bcfb5df67a"
    "7a1159ed0f5ccbfa71d5e1b4d46f8bc84ca25d3d4b91527f7e3e8b94b232b2f32910ae"
    "dd80b928cbbb6e29d6efcd75ea07abd9f261c5555b29a62d22e77c7dca55a9be4fd54d"
    "44aad2d8a9cb0fe2c1663223b423bb87cf8e7ad17cc6ea0edb2a0f2f628ba6fdf67db3"
    "bfd03184d3ed994c1a20f1d76b4eb0bfb175693995fb3c1764e910dc999fbfb9c6f8fe"
    "46d385dcddddeb30a7dddea0bf1a979c8d6e13fbe72a74c8ed158692da1b47684fd882"
    "049474ff006f55116a4a541b45a5ad2d25cd3265eae2109dfb37dd4c591750f5d37450"
    "cfe43ca49652da5a41a4da15b9522daeb4777d1c762dd9e7520a553828f4766e49b45d"
    "26b4c3785c9988f9a390e6e3166ddc96eb309d975aa58c479f0898f4eea7075f3906d0"
    "a328e9cf3eaa074a66b15138571b9f35db975c77c5255d67194c9e83707950c8442a1b"
    "cdfb7d09f81aa1e0cd18c29a0ce61ce2b92c9e556fca146a2a664ca5442e19b5b7a76b"
    "6f6f6b4fdd4c69673821332e3f3724a26538dee02934bcb087b7c92aa94446e2abe5b7"
    "fc37ffc4003a100000060201030204040305090000000001020304050600070896b1d7"
    "1112131421a11516225017416109232431584251606871b6b7c8d1ffda000801010009"
    "3f00bdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1"
    "d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f"
    "8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c7"
    "5eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e"
    "28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d"
    "7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8"
    "a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75"
    "eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e2"
    "8cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7"
    "acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a"
    "32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f7c75e"
    "b2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbd71d7acf61f8a32f5c75eb3d87e28"
    "cdd1c4fb439a8cebcab5adbd7768dbe6d7ac59a3bdbf88572c2946eb372a42ceb1f797"
    "e3337209384bd43dc40f5cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a32f"
    "7c75eb2d87e28cbdf1d7acb61f8a32f7c75eb2d87e28cbdf1d7acb61f8a307b60f6c1e"
    "d83db07b60f6c1ed83db07b60f6c1ed83db07b60f6c1ed83db07b60f6c1ed83db07b60"
    "f6c1ed83db07b60f6c1ed83db07b60f6c1ed83db07b60f6c1ed83db07b60f6c1ed83db"
    "07b60f6c1fb061bec186fb061bec186fb061bec186fb061bec186fb061bec186fe5e81"
    "ea023e9ff4fd41ff00dfeb8737f2ff0077d03d03d40a3fe7fabd3ea23ea3f5fa0866c0"
    "b55210d81fda2554d7d7b655f9776c632e54ab56e981829eacda22d353f0f9d887d1b2"
    "4b17e1394940454302a97b15210e537d830df60c37d830df60c37d830df60c37d83f70"
    "9c98195b88ce36d6faf6a914797b96c291aea518acd3685495519c3c7b3882cdb3176f"
    "641db46a80394cbef32aa2491e87abaa5a3a25759aff0002e66306cae2cf12b2c4117b"
    "69d95f0a36ccded28a006f965a24b1d1a818c5f8ec9dfb044e9ce6b9de7035c52cb6ed"
    "336d20bb78d621a3b8e8e909ea9db19364a12dd5c6b252a8222a7b5948a62a94cb3244"
    "86298d14db62ec2849093819693903386f46ab4f43bd7b192f18f8cd946d2964968793"
    "62641cb56a76add33898a2f01549444211bec5a64c3e59c36b554a2e22bd73aa82a21f"
    "e04910d4b195cb343b5f614124d4f927c5050e73bb70252243b4e0a174047469e4df6c"
    "2926f2cd59b7212746aff2031278ff00cc0ace2b66f48e49826d0ef577a62a29a47398"
    "a034189aad2a125d05deeccdc1089ce596f4dd8b80328c62e9083f246d46b52654cc53"
    "aae1c3a955dba85310239628864443c0d8f6e73c3445ea6e1abff3bf8246c94f6eea6b"
    "b76d228245cbd7e0c5254c20982cb2aa017e82630fd71c4cdeb74d82bc5b1d374ad352"
    "009e948970edfc6319eb1d81e243074eabb8958c5d1f995ccbbc57e0aa2d59ba149429"
    "757eafb1e8695591681a4e09bb98299abc4a4b1fdb235ed98b15fcbc8da9444c5f9a3c"
    "936711ae4482083463eff712cb22e5f550615bec3a0d9e30f0b78d7725604a45687656"
    "260455dc6b86f2858877f28f63dd3c62e45b2a522c2a24a909fb9ffcd47feb8671e75d"
    "59361dff004a6e8d8b62d8d290e0e760fe71a7ca6ca6b549684b99d4fcc35924036866"
    "e9a0d639c35666294ff1525057702aff00a5ed97ff007dea7c5fd4af77f6e9978cf71b"
    "f4a0f54d856355db0288fafa0b96e1f18a1f400314dfed1f07d1445405083fd4047fcf"
    "fa087d30c27554b7431d43987d4c739b9a71c26308ff0031308fae0e8f1d8458b63fc3"
    "626ff5812a8fe411829e1d80a57ff311894535b93501b8a226119e2103dd1de9e8b0e1"
    "8c7e3f97fb41f4d174f98c3613146821beea9f9785135b002ce66df23edf84321fe305"
    "2f6fc5fd7eb9fe94b5c7fe4bdcf91fc414d957353ead5b5eda80f2d5ede5adf7b3b774"
    "1fe28486e3916d0cf36f4a32966ac2c889919924957dcfab1186294897c542f762d97b"
    "236e8d39d6d3b8ca366f0b02e9c51d2b292bd1950aab751e1e0e1e34d6f90131dcbb7a"
    "edd28b7bcea14854d14bf7398b7a94ee3ea9b39c175f55df2706db602db1cdae84ed2c"
    "5644006722e1e30bafca074a38cd9db8f9a1f6ba43e1feba2d66b3aaebf5e52a913418"
    "d8a6a4ac37aeae92e93c8a5231522a83c6f22574a8baf8e0a19d9d650eb09cea1cc64a"
    "c1aec2d1ad6d5afe774ea0e825b5f377166b05527cf60aa2b2265676b408a95a310f1d"
    "f30e58fa2e506c4689a5f0d49b1d35bca524ddd9649c9c1d496bebb591cacbbe712162"
    "8928ad215d969490310cbc8467b92faa8aaac1caea18f9b26bda7f5c413c3a0eebb58b"
    "147be9db53840ee08924dac6741d318d6130a2443b36ed5bbe997a89cc97c064e3da21"
    "c35d8307c0d968b1824646662a45668dd9a1369da53b6d969d1f30e37353a255b107e2"
    "6d6c8e03f112bd283a5c1b898aa8ed5ab6e0d4d72906c76d53bedb22184dd4e3e41c81"
    "0d2511b018a435bbc55e2804e6540e9b3964124c1322720b7b8d9364dffc87ab4944d9"
    "eba74537915a9f5ada621ca32319275383505094b64ec248a20a369497f6a455134d74"
    "63daae9954c8593aaedb8282fc029bbae92e08cee307188b97d22ca12599ba2af096ea"
    "ba32920b2df24f511552f8eb7ca3868a2ca283cb2af6a0d774b788c840efcd50f6c2db"
    "685922d65fdcac031d7c73336910f5e376e0949a12526f220a454a0509327c44725dfd"
    "81ec7c6b162ee7a5528c46526dd346a920e25e491858f898749fc92a98acb15a356cd8"
    "aa1c41249327b481fbbc4b2b13dd5fa5351496bd19a47f126d4f93b24eedc3cf4ac031"
    "742a338d979508166455e26995d0a681480a013d4065ec90108b6a9a0d89b5875968a8"
    "fdcd07216c9bad0cdd97f8a2ce1661e5ae8acdab85d1f82d9ac72463c79be64aa180c5"
    "0134341d5365f1d38fbb9ec0d352acf62a8f21b2656d3b35a4ddaebd153b1480b60920"
    "89413399cc73776b15ba62e9305ca610138953211328a873aa71290a05013a8a18ca28"
    "7100fa98c22223f511f5fdedf5065e42e746af50ee345d9079b8660e1bd55e5a9ed7ec"
    "15db7579acc3a8d7cd15b6b823966e239c22e9200f6aa89c0072b7bbef3c8eafd36bba"
    "e6f741d5325b974e485d54a9c4a308de6afc6349d1ab6d35e1d13026c67a54c415e34c"
    "42262a19316e9b7a6d664e4a8349d6757d63af127cbd575d5068cfac727090aad8e54c"
    "47f6db019cd9d6f9b7a0d99a0262fa2699c3fbc1ff0081bfffc4003411000102030802"
    "01010703050000000000010203001112040617525493a1d20521314107132232505171"
    "6181d31523424460ffda0008010201013f00c3bbdda51bacf78c3bbdda51bacf78c3bb"
    "dda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf7"
    "8c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51"
    "bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bb"
    "dda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf7"
    "8c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51"
    "bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bb"
    "dda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf7"
    "8c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51"
    "bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bb"
    "dda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf7"
    "8c3bbdda51bacf78c3bbdda51bacf78c3bbdda51bacf78c3cbdfa41bacff009230f2f7"
    "e906eb3fe48c3bbdc7fea8dd67fc918777bb4a3759ef18777bb4a3759ef18777bb4a37"
    "59ef18777bb4a3759ef18777bb4a3759ef18777bb4a3759ef18777bb4a3759ef14399f"
    "8114399f8114399f8114399f8114399f8114399f8114399f8114399f8114399f811439"
    "9f8114399f8114399f8114399f8114399f8114399f8114399f8114399f8114399f8114"
    "399f8114399f8114399f8114399f8114399f8114399f8114399f8114399f8114399f81"
    "14399f8114399f8114399f8114399f8114399f8114399f8114399f8114399f8114399f"
    "8114399f8114399f8114399f8114399f8114399f8114399f8114399f8114b99f8114b9"
    "9f8114b99f8114b99f8114b99f8114b99f8114b99f8114b99f8114b99f81135fefc44d"
    "7fbf023f105ca7ee714b99f8114b99f8114b99f8114b99f8114b99f8114b99f8114b99"
    "f81fa8294123dc7deaa7fd212b0afe62fa7db3788bbde4d7777c4b66d5e750695d40a5"
    "968913928fa538a130694493efdb808298bbbf6816e5b29579848750a33a9002549fe0"
    "7a4a80fdbd1fa951f88b25b6cb6eb326d965585d9d5391f63e0907d19104104488853a"
    "7fe300cd53feb0a584fcfcc07553f7f1095050f5faa3df484a53f77397b9435f9bfb47"
    "da5f8cb33d7a17e62c63fde45a1c6de97d40714127f9499a49fd8a7f68f1ca28f1a163"
    "e409c5c699ba6c151992a70cff00975661ba3dd5f31eabf5f13877f37f68b3b7e615e5"
    "5d2f16bfd23eec7dd81f982bd4e7ea79a7332fcb4fd610808fe7f545202889fd224009"
    "7d2020255508bcff0067560f325cb5f8f5062dce12a50332d38a54c9247b2852899952"
    "663e4d054671e1ee42ac3622bbcce26cf6441224140a95fb7b13002be804d67e249316"
    "3b7d97c6d910cb3627d8f069124ae53909cca94899712924935a8124fb50139c365ab4"
    "361eb32d2b65426082083fc11ea12d84fb3ecc29015f3f301a503f3fac865a7ef03ee3"
    "c90b5316668b73f741529da8a41f409a44cfcfa94e1bf33e6ad0c21f2a5a1bfb842aa6"
    "d80f24a9499abef00254800ca40247e1fc538f1f67b35b6dab42294b0f58d87941a984"
    "170a9c05490a1f590f9482642a13802425faddaec5e41bb6aedfe34b4a5b8d250b4395"
    "01f84a8a5495a41208a8cc149047d418619f12d308b12116977cba1b4b6b4345e64ae9"
    "12a97ed090de55abe53e84e521e27c6bf667156ab486d0b53486d2db73a5b420a88151"
    "f6a57e2333203f61f5ff00c3ff00ffc400351100010204050400040502070000000000"
    "0102030004061117515392d30512213113223241071450618152713042606291a1c1ff"
    "da0008010301013f00c22a9f564b7b9c5184553eac96f738a308aa7d592dee71461154"
    "fab25bdce28c22a9f564b7b9c5184553eac96f738a308aa7d592dee71461154fab25bd"
    "ce28c22a9f564b7b9c5184553eac96f738a308aa7d592dee71461154fab25bdce28c22"
    "a9f564b7b9c5184553eac96f738a308aa7d592dee71461154fab25bdce28c22a9f564b"
    "7b9c5184553eac96f738a308aa7d592dee71461154fab25bdce28c22a9f564b7b9c518"
    "4553eac96f738a308aa7d592dee71461154fab25bdce28c22a9f564b7b9c5184553eac"
    "96f738a308aa7d592dee71461154fab25bdce28c22a9f564b7b9c5184553eac96f738a"
    "308aa7d592dee71461154fab25bdce28c22a9f564b7b9c5184553eac96f738a308aa7d"
    "592dee71461154fab25bdce28c22a9f564b7b9c5184553eac96f738a308aa7d592dee7"
    "1461154fab25bdce28c22a9f564b7b9c5184553eac96f738a308aa7d592dee71461154"
    "fab25bdce28c22a9f564b7b9c5184553eac96f738a308aa7d592dee71461154fab25bd"
    "ce28c22a9f564b7b9c5184553eac96f738a308aa7d592dee71461154fab25bdce28c22"
    "a9f564b7b9c5184553eac96f738a308aa7d493dee71461154fab25bdce28c22a9f564b"
    "7b9c5184553eac96f738a308aa7d592dee71461154fab25bdce28c22a9f564b7b9c518"
    "4553eac96f738a2c338b0ce2c338b0ce2c338b0ce2c338b0ce2c338b0ce2c338b0ce2c"
    "338b0ce2c338b0ce2c338b0ce2c338b0ce2c338b0ce2c338b0ce2c338b0ce2c338b0ce"
    "2c338b0ce2c338b0ce2c338b0ce2c338b0ce2c338b0ce2c338b0ce2c338b0ce3c7f85f"
    "3671f3670002cf9cbf574214b3610184dac7dc2db523c9f51557e28f4ee8b34be93d2d"
    "1f99eaa8576a89b869b50f0413e14b50fba5361fef04111d0ff11a7db2075a4879951b"
    "f72004ad3fb002c9501f606caf64a8fa8909d96ea72c89c9157c4975dec6c47a241163"
    "6208208371f684b02df3fb823b5b2065086d4bf5ea0b09b587b85a148363faa4bfdff8"
    "ff00d85ad41db03e2f0ffd1fcc55df01753cd38cfd626de0afee1d50ff0091e6ff00c4"
    "2965b93ef4fd405ffea3f0bca8d252aa51ba8a9e37feeeb90efc4f1d97b41bfc33ddee"
    "d0c7d1fcc4b9a89ba81f54e29b3d00b63e1816eeeef1fb5ffabbae6df4f6fde1c70acf"
    "ec3f5442ca01b7b304926e7dc29c5293daa8aabf0cba7f5971cea1d295f96ea8b51528"
    "1b969c512492a1e4a14a26e549b8f64b65449890a0ff002f28662ac7512b24836294a8"
    "152ed9285c00aff281dcb23c76a4c74eea92bd1e51b6a5a42625a9f40210e76dec2f72"
    "a5b772ea50a249ef5024deea02f78969e626994beca92b6542e14920a4ff0062216f15"
    "784f81087148f5ea14f20a7c8f3fac865998a9a61d98485ae5e5192df779082a53ddc5"
    "20f80a3da9ba879b0b5e1aebdd7a665d130a538868cb36a0a6a5c3e92b527b95f14249"
    "5b60122c0247cbf35e3a64acacfcfb8db7da8979891967d419b86cba56e852d2143c5f"
    "b47b4826c3b85e00b0b7eb73d21d4db9f5f52e945952dd652dadb77b922c82b2952569"
    "0a208ef37052411f70625d8e8accb37d3d0dcdbdd710d25a71b64bec173b13dbdce796"
    "d21bfe9717ed3602f6ed1d17a54c4a3aa9c9a0d36e2996da434ddfb1a6db2a294f71f2"
    "b55d66eab24640fbff0043ff00ffd9"
)

_NODEJS_STRIPE_IMAGEIO_RGB_GRID_HEX = (
    "44883d44883d44883d44883d44883d44883d44883d44883d44883d44883d44883d4488"
    "3d44883d44883d44883d44883d44883d44883d44883d44883d44883d44883d44883d44"
    "883d44883d44883d44883d44883d44883d44883d44883d44883d44883d44883d44883d"
    "44883d44883d44883dfefefefefefefefefefefefefefefefefefefefefefefefefefe"
    "fefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefe"
    "fefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefefe"
    "fefefefefefefefefefefefefefefefefefeffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "fffffffffffffffffffffffdffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "fffffffffffffffffffefefe3c383581be6eecf2ee3b3734ffffff3c3837ffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffff518851428540fefefee7e6"
    "e45e5a59ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "fffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffe"
    "ffffffff3c3835ffffff999896ffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffa9c8a8e2eee0ffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffff679e67fdfffcffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
    "ffffffffffffffffffffff"
)


def _hex(b):
    return bytes.fromhex("".join(b))


def test_decode_tiff_lzw_jdk_imageio_vector():
    """A JDK-ImageIO-encoded LZW TIFF (big-endian MM, 23x11 RGB, no
    predictor) decodes bit-exactly to the generating formula. This is
    the first TIFF-LZW vector from an encoder other than our own —
    and it requires the late-width-change retry path."""
    data = _hex(_JDK_LZW_TIFF_HEX)
    px, n_strips, byte_order, compression = M.decode_tiff(data)
    assert (byte_order, compression) == ("MM", 5)
    assert px.shape == (11, 23, 3)
    want = np.zeros((11, 23, 3), dtype=np.uint8)
    for y in range(11):
        for x in range(23):
            want[y, x] = (
                (x * 7 + y * 13) % 256,
                ((x * 3) ^ (y * 5)) % 256,
                (x + y * 2) % 256,
            )
    assert (px == want).all()


def test_jdk_lzw_strip_is_late_width_change():
    """Pin that the JDK vector really exercises the non-spec variant:
    the raw strip fails under the TIFF 6.0 early-change rule and
    decodes exactly under early_change=False."""
    data = _hex(_JDK_LZW_TIFF_HEX)
    # Single strip: StripOffsets/ByteCounts are LONGs inline (MM).
    (ifd_off,) = struct.unpack_from(">I", data, 4)
    (n_tags,) = struct.unpack_from(">H", data, ifd_off)
    tags = {}
    for i in range(n_tags):
        tag, _typ, _cnt = struct.unpack_from(
            ">HHI", data, ifd_off + 2 + i * 12
        )
        tags[tag] = struct.unpack_from(">I", data, ifd_off + 2 + i * 12 + 8)[0]
    strip = data[tags[273] : tags[273] + tags[279]]
    expected = 23 * 11 * 3
    with pytest.raises(ValueError):
        M.tiff_lzw_decode(strip, expected)
    out = M.tiff_lzw_decode(strip, expected, early_change=False)
    assert len(out) == expected


def _ycbcr_from_rgb(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return (
        0.299 * r + 0.587 * g + 0.114 * b,
        128 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    )


def test_decode_jpeg_baseline_420_cpython_file():
    """CPython's test-suite python.jpg (real-encoder baseline 4:2:0)
    against the JDK decoder's raster. The luma plane is
    decoder-agnostic (full resolution, unaffected by chroma
    upsampling policy), so on pixels where the independent decoder's
    RGB is unclipped — Y is recoverable from clamped RGB only there —
    our Y must agree within rounding; chroma differs by upsampling
    policy (fancy triangle vs spec replication), checked as plane
    means."""
    from duckdb_redis_olap_scanner_spark.operators.jpeg import decode_jpeg

    px, stats = decode_jpeg(_hex(_CPYTHON_LOGO_JPEG_HEX))
    assert (stats["width"], stats["height"]) == (16, 16)
    assert px.shape == (16, 16, 3)
    truth = np.frombuffer(
        _hex(_CPYTHON_LOGO_IMAGEIO_RGB_HEX), dtype=np.uint8
    ).reshape(16, 16, 3).astype(np.float64)
    y_t, cb_t, cr_t = _ycbcr_from_rgb(truth)
    unclipped = ((truth > 0) & (truth < 255)).all(axis=2)
    assert unclipped.sum() > 100  # the comparison actually bites
    dy = np.abs(px[..., 0].astype(np.float64) - y_t)
    assert dy[unclipped].max() <= 3.0
    assert abs(px[..., 1].mean() - cb_t.mean()) <= 5.0
    assert abs(px[..., 2].mean() - cr_t.mean()) <= 5.0


def test_decode_jpeg_progressive_nodejs_file():
    """Node.js's thin-white-stripe.jpg: real-encoder PROGRESSIVE
    (SOF2, spectral selection + successive approximation) at
    non-MCU-multiple 493x58 — both the progressive scan machinery and
    the partial-MCU crop run against externally-encoded input. 4:4:4
    sampling makes the comparison upsampling-free, so all three YCbCr
    planes must match the JDK decoder on a 38x9 sample grid within
    rounding (measured max |diff| 1.0)."""
    from duckdb_redis_olap_scanner_spark.operators.jpeg import decode_jpeg

    px, stats = decode_jpeg(_hex(_NODEJS_STRIPE_JPEG_HEX))
    assert (stats["width"], stats["height"]) == (493, 58)
    assert px.shape == (58, 493, 3)
    grid_rgb = np.frombuffer(
        _hex(_NODEJS_STRIPE_IMAGEIO_RGB_GRID_HEX), dtype=np.uint8
    ).reshape(9, 38, 3).astype(np.float64)
    y_t, cb_t, cr_t = _ycbcr_from_rgb(grid_rgb)
    samp = px[np.ix_(np.arange(0, 58, 7), np.arange(0, 493, 13))].astype(
        np.float64
    )
    assert np.abs(samp[..., 0] - y_t).max() <= 2.5
    assert np.abs(samp[..., 1] - cb_t).max() <= 2.5
    assert np.abs(samp[..., 2] - cr_t).max() <= 2.5


# ---------------------------------------------------------------------------
# Round 13 (second batch): GIF, RGBA-TIFF, and partial-MCU baseline JPEG
# ---------------------------------------------------------------------------
#
# - _CPYTHON_LOGO_GIF_HEX: Lib/test/test_email/data/python.gif from the
#   CPython source distribution (PSF license) — a real-encoder 16x16
#   GIF89a with a transparent background. GIF is lossless, so our
#   decode must match the JDK ImageIO decoder EXACTLY on every opaque
#   pixel (our decoder serves the palette color for transparent
#   indices; ImageIO serves alpha=0 — compared only where alpha=255).
# - _CPYTHON_LOGO_TIFF_HEX: the sibling python.tiff — a real-encoder
#   uncompressed RGBA TIFF (SamplesPerPixel=4 + ExtraSamples) with
#   GENUINE translucency: it must parse through the full IFD/strip
#   machinery and then be rejected by the opaque-RGB decode contract,
#   mirroring decode_webp's behavior on the transparent WebP literal.
# - _JDK_RGBA_LZW_TIFF_HEX: a fully-opaque RGBA TIFF encoded by the
#   JDK ImageIO TIFF writer with LZW — pins the spp=4 strip math,
#   the RGBA late-width-change LZW expansion, and the alpha-drop path
#   bit-exactly against the generating formula.
# - _JDK_13X7_JPEG_HEX: a baseline 4:2:0 JPEG at 13x7 from the JDK
#   JPEG encoder — a real-encoder PARTIAL-MCU baseline file (one
#   padded 16x16 MCU cropped to 13x7), complementing the progressive
#   partial-MCU vector above; truth raster from the JDK decoder.

_JDK_RGBA_LZW_TIFF_HEX = (
    "4d4d002a00000008000d01000003000000010013000001010003000000010009000001"
    "02000300000004000000ac010300030000000100050000010600030000000100020000"
    "0111000400000001000000c40115000300000001000400000116000300000001000900"
    "000117000400000001000002cd011a000500000001000000b4011b0005000000010000"
    "00bc012800030000000100010000015200030000000100020000000000000000000800"
    "0800080008000000010000000100000001000000018000204ff0580406ff0b0080cff1"
    "080c12ff1601018ff1b8141eff2101824ff2681c2aff2c02030ff3182436ff370283cf"
    "f3c82c42ff4203048ff478344eff4d03854ff5283c5aff5804060ff5d84466ff630486"
    "cff0081c0aff0601810ff0b81416ff110101cff1680c22ff1c00828ff218042eff2700"
    "034ff2c83c3aff3203840ff3783446ff3d0304cff4282c52ff4802858ff4d8245eff53"
    "02064ff5885c6aff5e05870ff6385476ff0103814ff0683c1aff0c03020ff1183426ff"
    "170282cff1c82c32ff2202038ff278243eff2d01844ff3281c4aff3801050ff3d81456"
    "ff430085cff4880c62ff4e00068ff538046eff5907874ff5e87c7aff6407080ff01856"
    "2e0e0a46c32178f8902d23178464e3a084ac8a139794025332d8766e330389d8e20fa7"
    "e3e03ca190e0ca8e49030a593a0d8727f9500d0787f9660287e7f97c020847f9920388"
    "a7f8080e2c6b72ce0d03cb584a0fade18030b98760caee23034bd8a20dafe2e028c18c"
    "e0ab0e3902cc58fac71fe44020c992608b2e4f0241f1fe54826209fe5a018221fe5f81"
    "a239fe6501c251fe02846d7820113660d842db84c103761884edf878133862384ae38a"
    "4123962e856e78d0153a639852eb8fc143b64485eef928173c64f85a219fe55058231f"
    "e5a866249fe60064261fe65862279fe030549582215a5e0e0509984e14a6e1905c9d87"
    "a17a7e24058a18a616a8e2f044a58d211c223a0410a8fe10c324504d0e92a13c425004"
    "8241fe5584a259fe5b074271fe60876289fe660702a1fe03862bb824182f60e866bf85"
    "0193061986ac387c1a3162486ec78a81b3262f872cb8d41c49c3a877291001d4ac4587"
    "b2d12c1e4bc5087e269fe5607c281fe5b842299fe610402b1fe668462c9fe04070e182"
    "61cb8eed39614876e78681e3a61f87aeb8941f3b62ae507f8c0183c635863460ec1952"
    "040d267f9181a5304b86b4e1441b0a47f95a1b8aa7f970140b07f986148b67f99c150b"
    "c7fa02"
)

_CPYTHON_LOGO_TIFF_HEX = (
    "49492a0008040000000000000000000000000000000000004e8dc0af4a86baed4883b4"
    "ff447eadff4078a7ff3c719ef7376896920000000b0000000300000000000000000000"
    "0000000000000000000000000000000000004c8abcffffffffff457fafff4179a8ff3e"
    "74a2ff3a6f9bff366994ff000000280000000b00000000000000000000000000000000"
    "0000000000000000000000004985b7ff4680b1ff427baaff3e75a3ff3b709dff376a96"
    "ff366994ff0000004100000015000000000000000000000000000000004e8fc47e4c8a"
    "bfa04885b6a1437dada33d74a1a7396c96aa366690aa386c97ff366994ff366994ff00"
    "000048000000180000000000000000000000005291c6bd4f8dc1ff4b88bbff4883b4ff"
    "447dadff4078a6ff3d73a0ff396d99ff366994ff366994ff366994ff00000048ffe255"
    "fffddd4af7f9d53e820000000a508fc3ff4c89bcff4884b5ff457fafff4179a8ff3d74"
    "a1ff3a6f9bff366994ff366994ff366994ff326087b600000043ffde4bffffda41fffd"
    "d536ed000000244d8bbeff4985b7ff4680b0ff427baaff3e75a3ff3b709cff376a96ff"
    "366994ff356892f7326087b60000004fecce4588ffda42ffffd637ffffd32dff000000"
    "3d4a87b9ff4781b2ff437cabff3f76a5ff366993b61b31455c0000004c000000480000"
    "004700000041e2c3456bfdd941f7ffd738ffffd32dffffcf23ff000000464681b2f744"
    "7dadff4078a6ff366791aa0000004ef2e16ea6fde96af7ffe661ffffe357ffffdf4dff"
    "ffdb42ffffd738ffffd32effffcf24fffdcb1bf700000047437daed74179a8ff3d74a1"
    "ff1c324b5bf5e36fb3ffeb6cffffe761ffffe357ffffdf4dffffdb43ffffd739ffffd3"
    "2effffcf24ffffcc1cfff3c11ac2000000414075a36f3d73a2f73a709cff0000004bff"
    "eb6cffffe762ffffe358ffffdf4effffdb43ffffd739ffffd32fffffcf24ffffcc1cff"
    "ffcc1cffc29a127a0000003400000008000000210000003c00000035ffe762ffffe358"
    "ffffdf4effe8c73daaebc534a9ebc22aa9ebbe21a9ebbb18a9ebbb18a9c69b12790000"
    "00410000002000000002000000090000001300000012ffe358ffffdf4effffdb44ffff"
    "d73affffd330ffffd025ffffcc1cff00000041000000350000002c0000001e0000000b"
    "00000000000000000000000000000000fdde4ef7ffdb44ffffd83affffd430ffffd026"
    "fffffffffffdcb1bf7000000400000001c000000090000000500000001000000000000"
    "00000000000000000000f1d03f4cfad339ccfdd22ff7ffd026ffffcc1cfffac719d8c0"
    "97127b0000003b00000012000000000000000000000000000000000000000000000000"
    "00000000000000080000001d0000003500000042000000470000004500000038000000"
    "1f00000008000000000000000000000000110000010300010000001000000001010300"
    "01000000100000000201030004000000da040000030103000100000001000000060103"
    "0001000000020000000a01030001000000010000000d0102000c000000220500001101"
    "0400010000000800000012010300010000000100000015010300010000000400000016"
    "01030001000000800000001701040001000000000400001c0103000100000001000000"
    "2901030002000000000001003e01050002000000120500003f01050006000000e20400"
    "00520103000100000002000000000000000800080008000800000ad7a3ffffffff80e1"
    "7a54ffffffff00cdcc4cffffffff009a9999ffffffff80666626fffffffff0285c0fff"
    "ffffff801b0d50ffffffff00583954ffffffff707974686f6e2e7469666600"
)

_CPYTHON_LOGO_GIF_HEX = (
    "47494638396110001000f53f00ebbb18ebbe21f3c11afac719fdcb1bffcc1cebc22aff"
    "cf23ffcf24ffd025ffd32debc534e8c73dffd330ffd430fdd536fad339ffd739f9d53e"
    "ffd83aecce45ffda41ffdb44ffde4bffdf4effe255ffe358ffe762f2e16ef5e36ffde9"
    "6affeb6c326087366690366791366993376896376a96396c963a6f9b3a709c3b709c3c"
    "719e3d73a23e74a23f76a54078a6427baa437cab437dad457faf4680b14781b24883b4"
    "4885b64a86ba4c89bc4c8abc4c8abf4f8dc1508fc35291c6ffffff00000021ff0b496d"
    "6167654d616769636b0767616d6d613d300021f9040500003f002c0000000010001000"
    "00069bc09ff0b7bbcd622d1569c814e67cb3170b556a326d5156aa34b2fe74b618cb14"
    "3295aaccde0e5793b954a7d1f997b9487e3c1d4df6828ffe203f17150f5f3634522a67"
    "228114840a3f87302e5d4d15110a073f472e223f1c1e1b191815130a08043f31523f1d"
    "1f1b1a1816110d080502422b293fafb1a5a7050556b0180c0b060100005eb1b30d09c2"
    "5e3fb2110e093ea9d23f10cf0503dae04341003b"
)

_CPYTHON_LOGO_GIF_IMAGEIO_ARGB_HEX = (
    "00000000000000000000000000000000ff4f8dc1ff4a86baff4680b1ff437dadff3f76"
    "a5ff3c719eff3768960000000000000000000000000000000000000000000000000000"
    "00000000000000000000ff4c8abcffffffffff4680b1ff427baaff3e74a2ff3a709cff"
    "376a960000000000000000000000000000000000000000000000000000000000000000"
    "00000000ff4885b6ff4680b1ff427baaff3e74a2ff3b709cff376a96ff366993000000"
    "00000000000000000000000000000000000000000000000000ff4c8abfff4885b6ff43"
    "7dadff3e74a2ff396c96ff366690ff396c96ff376a96ff376a96000000000000000000"
    "0000000000000000000000ff5291c6ff4f8dc1ff4c89bcff4883b4ff457fafff4078a6"
    "ff3c719eff3a6f9bff366993ff376a96ff376a9600000000ffffe255ffffde4bfff9d5"
    "3e00000000ff508fc3ff4c8abfff4781b2ff457fafff427baaff3c719eff3a6f9bff36"
    "6993ff366993ff366993ff32608700000000ffffde4bffffda41fffdd53600000000ff"
    "4c8abfff4885b6ff4781b2ff427baaff3e74a2ff3c719eff376a96ff376a96ff366791"
    "ff32608700000000ffecce45ffffda41fffdd536ffffd32d00000000ff4885b6ff4781"
    "b2ff437cabff4078a6ff36699300000000000000000000000000000000000000000000"
    "0000ffffda41ffffd739ffffd32dffffcf2300000000ff4680b1ff437dadff4078a6ff"
    "36679100000000fff2e16efffde96affffe762ffffe255ffffdf4effffda41ffffd83a"
    "ffffd32dffffcf24fffdcb1b00000000ff437dadff427baaff3e74a200000000fff5e3"
    "6fffffeb6cffffe762ffffe358ffffdf4effffdb44ffffd739ffffd330ffffcf24ffff"
    "cc1cfff3c11a0000000000000000ff3d73a2ff3b709c00000000ffffeb6cffffe762ff"
    "ffe358ffffdf4effffda41ffffd83affffd32dffffcf24ffffcc1cffffcc1c00000000"
    "0000000000000000000000000000000000000000ffffe762ffffe358ffffdf4effe8c7"
    "3dffebc534ffebc22affebbe21ffebbb18ffebbb180000000000000000000000000000"
    "0000000000000000000000000000ffffe358ffffdf4effffdb44ffffd739ffffd330ff"
    "ffd025ffffcc1c00000000000000000000000000000000000000000000000000000000"
    "0000000000000000ffffdf4effffdb44ffffd739ffffd430ffffd025fffffffffffdcb"
    "1b00000000000000000000000000000000000000000000000000000000000000000000"
    "000000000000fffad339ffffd330ffffd025ffffcc1cfffac719000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000000000"
    "000000000000000000"
)

_JDK_13X7_JPEG_HEX = (
    "ffd8ffe000104a46494600010200000100010000ffdb00430003020203020203030303"
    "04030304050805050404050a070706080c0a0c0c0b0a0b0b0d0e12100d0e110e0b0b10"
    "16101113141515150c0f171816141812141514ffdb0043010304040504050905050914"
    "0d0b0d1414141414141414141414141414141414141414141414141414141414141414"
    "141414141414141414141414141414141414ffc00011080007000d0301220002110103"
    "1101ffc4001f0000010501010101010100000000000000000102030405060708090a0b"
    "ffc400b5100002010303020403050504040000017d0102030004110512213141061351"
    "6107227114328191a1082342b1c11552d1f02433627282090a161718191a2526272829"
    "2a3435363738393a434445464748494a535455565758595a636465666768696a737475"
    "767778797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5"
    "b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2"
    "f3f4f5f6f7f8f9faffc4001f0100030101010101010101010000000000000102030405"
    "060708090a0bffc400b511000201020404030407050404000102770001020311040521"
    "31061241510761711322328108144291a1b1c109233352f0156272d10a162434e125f1"
    "1718191a262728292a35363738393a434445464748494a535455565758595a63646566"
    "6768696a737475767778797a82838485868788898a92939495969798999aa2a3a4a5a6"
    "a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5"
    "e6e7e8e9eaf2f3f4f5f6f7f8f9faffda000c03010002110311003f00b9f04be19c7fe8"
    "ff002af6afa4fc65f163e16fecd7a2687ff0b1fc48be1cfedaf3bec1fe817375e7793e"
    "5f9bfea227db8f363fbd8ceee3383828a00fffd9"
)

_JDK_13X7_IMAGEIO_RGB_HEX = (
    "3c3c3c4848485555556060606d6d6d7878788484849090909d9d9da5a5a5b3b3b3c5c5"
    "c5c7c7c74444445151515d5d5d6868687575758080808c8c8c999999a7a7a7b4b4b4bf"
    "bfbfcacacad6d6d64e4e4e5b5b5b6767677272727f7f7f8a8a8a969696a3a3a3ababab"
    "bababac0c0c0d2d2d2dbdbdb5757576363636f6f6f7a7a7a8787879292929f9f9fabab"
    "abb9b9b9c8c8c8d2d2d2dbdbdbe9e9e96060606c6c6c7979798484849090909c9c9ca8"
    "a8a8b4b4b4bfbfbfc9c9c9d6d6d6e5e5e5ededed6a6a6a7676768383838e8e8e9b9b9b"
    "a6a6a6b2b2b2bebebecbcbcbd3d3d3e4e4e4eaeaeafdfdfd7171717d7d7d8989899494"
    "94a1a1a1acacacb9b9b9c5c5c5d3d3d3dadadaeaeaeafdfdfd000000"
)


def test_decode_gif_cpython_logo_matches_imageio_exactly():
    from duckdb_redis_olap_scanner_spark.operators.gif import decode_gif

    px, _table_n, interlaced = decode_gif(_hex(_CPYTHON_LOGO_GIF_HEX))
    assert px.shape == (16, 16, 3) and not interlaced
    truth = np.frombuffer(
        _hex(_CPYTHON_LOGO_GIF_IMAGEIO_ARGB_HEX), dtype=np.uint8
    ).reshape(16, 16, 4)
    opaque = truth[..., 0] == 255
    assert opaque.sum() == 149  # the logo's opaque core
    assert (px[opaque] == truth[..., 1:][opaque]).all()


def test_decode_tiff_rejects_real_translucent_rgba():
    """CPython's python.tiff: real-encoder RGBA with true
    translucency — the RGBA machinery parses it (not a bad-header
    error) and the opaque-RGB contract rejects it loudly."""
    with pytest.raises(ValueError, match="non-opaque"):
        M.decode_tiff(_hex(_CPYTHON_LOGO_TIFF_HEX))


def test_decode_tiff_rgba_lzw_jdk_imageio_vector():
    """Fully-opaque RGBA + LZW from the JDK writer decodes to the
    exact RGB formula (alpha verified 255 then dropped)."""
    px, n_strips, byte_order, compression = M.decode_tiff(
        _hex(_JDK_RGBA_LZW_TIFF_HEX)
    )
    assert (byte_order, compression) == ("MM", 5)
    assert px.shape == (9, 19, 3)
    want = np.zeros((9, 19, 3), dtype=np.uint8)
    for y in range(9):
        for x in range(19):
            want[y, x] = (
                (x * 11 + y) % 256,
                (x ^ (y * 7)) % 256,
                (3 * x + 5 * y) % 256,
            )
    assert (px == want).all()


def test_decode_jpeg_baseline_partial_mcu_jdk_file():
    """A 13x7 baseline 4:2:0 JPEG (one padded MCU cropped) from the
    JDK encoder: the interleaved partial-MCU path against a real
    encoder, gray gradient chosen mid-range so Y is exactly
    recoverable from the independent decoder's RGB."""
    from duckdb_redis_olap_scanner_spark.operators.jpeg import decode_jpeg

    px, stats = decode_jpeg(_hex(_JDK_13X7_JPEG_HEX))
    assert (stats["width"], stats["height"]) == (13, 7)
    assert px.shape == (7, 13, 3)
    truth = np.frombuffer(
        _hex(_JDK_13X7_IMAGEIO_RGB_HEX), dtype=np.uint8
    ).reshape(7, 13, 3).astype(np.float64)
    y_t, cb_t, cr_t = _ycbcr_from_rgb(truth)
    unclipped = ((truth > 0) & (truth < 255)).all(axis=2)
    assert unclipped.sum() >= 80
    assert np.abs(px[..., 0].astype(np.float64) - y_t)[unclipped].max() <= 2.0
    assert abs(px[..., 1].mean() - cb_t.mean()) <= 3.0
    assert abs(px[..., 2].mean() - cr_t.mean()) <= 3.0


def test_decode_jpeg_jdk_encoder_conformance_sweep(spark):
    """Cross-encoder conformance sweep: the JDK's ImageIO JPEG
    encoder (IJG-derived — the independent implementation available
    in this container via Spark's JVM) encodes a matrix of odd
    geometries and qualities at runtime; our decoder must match the
    JDK's own decode within rounding on every one. Gradients stay
    mid-range so no channel clips and Y is exactly recoverable.
    Covers 1x1 and single-row/column partial MCUs, gray (1-component)
    and color (4:2:0) sampling, and two quantization levels — the
    combinations no baked literal sweep could enumerate."""
    jvm = spark._jvm
    ImageIO = jvm.javax.imageio.ImageIO
    BufferedImage = jvm.java.awt.image.BufferedImage
    from duckdb_redis_olap_scanner_spark.operators.jpeg import decode_jpeg

    def s32(v):
        return v - (1 << 32) if v >= (1 << 31) else v

    def jdk_encode(img, quality):
        w = ImageIO.getImageWritersByFormatName("jpeg").next()
        p = w.getDefaultWriteParam()
        p.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = ImageIO.createImageOutputStream(baos)
        w.setOutput(ios)
        w.write(None, jvm.javax.imageio.IIOImage(img, None, None), p)
        ios.flush()
        return bytes(baos.toByteArray())

    cases = [
        (1, 1, True, 0.9), (3, 5, True, 0.9), (31, 2, True, 0.7),
        (13, 7, True, 0.7), (1, 9, True, 0.9), (8, 8, True, 0.9),
        (13, 7, False, 0.9), (17, 17, False, 0.7), (24, 9, False, 0.9),
        (7, 16, False, 0.9), (64, 48, False, 0.7), (2, 2, False, 0.9),
    ]
    for w, h, gray, quality in cases:
        if gray:
            img = BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
            ras = img.getRaster()
            for y in range(h):
                for x in range(w):
                    # raw code values via the raster — setRGB would
                    # push them through the gray<->sRGB ICC transform
                    ras.setSample(x, y, 0, 60 + (x * 9 + y * 7) % 140)
        else:
            img = BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            for y in range(h):
                for x in range(w):
                    v = 60 + (x * 9 + y * 7) % 140
                    img.setRGB(x, y, s32((v << 16) | (v << 8) | v))
        payload = jdk_encode(img, quality)
        px, stats = decode_jpeg(payload)
        assert (stats["width"], stats["height"]) == (w, h), (w, h, gray)
        assert px.shape[:2] == (h, w)
        back = ImageIO.read(jvm.java.io.ByteArrayInputStream(payload))
        if gray:
            truth_y = np.array(
                [
                    [back.getRaster().getSample(x, y, 0) for x in range(w)]
                    for y in range(h)
                ],
                dtype=np.float64,
            )
        else:
            argb = list(back.getRGB(0, 0, w, h, None, 0, w))
            rgb = np.array(
                [((v >> 16) & 255, (v >> 8) & 255, v & 255) for v in argb],
                dtype=np.float64,
            ).reshape(h, w, 3)
            assert ((rgb > 0) & (rgb < 255)).all(), "clipped: Y not recoverable"
            truth_y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] \
                + 0.114 * rgb[..., 2]
        dy = np.abs(px[..., 0].astype(np.float64) - truth_y).max()
        assert dy <= 2.5, (w, h, gray, quality, dy)


def test_decode_tiff_jdk_encoder_conformance_sweep(spark):
    """Cross-encoder TIFF sweep: the JDK ImageIO TIFF writer encodes
    a matrix of {LZW, PackBits, Deflate, ZLib, uncompressed} x
    {RGB, opaque RGBA} x odd geometries at runtime; TIFF is lossless,
    so every combination must decode BIT-EXACTLY to the generating
    formula."""
    jvm = spark._jvm
    ImageIO = jvm.javax.imageio.ImageIO
    BufferedImage = jvm.java.awt.image.BufferedImage

    def s32(v):
        return v - (1 << 32) if v >= (1 << 31) else v

    def jdk_encode_tiff(img, ctype):
        w = ImageIO.getImageWritersByFormatName("tiff").next()
        p = w.getDefaultWriteParam()
        if ctype is not None:
            p.setCompressionMode(
                jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
            )
            p.setCompressionType(ctype)
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = ImageIO.createImageOutputStream(baos)
        w.setOutput(ios)
        w.write(None, jvm.javax.imageio.IIOImage(img, None, None), p)
        ios.flush()
        return bytes(baos.toByteArray())

    comp_tag = {"LZW": 5, "PackBits": 32773, "Deflate": 32946,
                "ZLib": 8, None: 1}
    cases = [
        ("LZW", False, 23, 11), ("LZW", True, 6, 30),
        ("PackBits", False, 17, 5), ("PackBits", True, 9, 9),
        ("Deflate", False, 12, 8), ("ZLib", True, 5, 13),
        (None, False, 3, 3), (None, True, 40, 2),
        ("LZW", False, 1, 1),
    ]
    for ctype, rgba, w, h in cases:
        img = BufferedImage(
            w, h,
            BufferedImage.TYPE_INT_ARGB if rgba
            else BufferedImage.TYPE_INT_RGB,
        )
        want = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                r, g, b = (x * 11 + y) % 256, (x ^ (y * 7)) % 256, \
                    (3 * x + 5 * y) % 256
                want[y, x] = (r, g, b)
                img.setRGB(
                    x, y, s32((0xFF << 24) | (r << 16) | (g << 8) | b)
                )
        data = jdk_encode_tiff(img, ctype)
        px, n_strips, byte_order, compression = M.decode_tiff(data)
        assert compression == comp_tag[ctype], (ctype, compression)
        assert px.shape == (h, w, 3), (ctype, rgba, w, h, px.shape)
        assert (px == want).all(), (ctype, rgba, w, h)


def test_decode_png_bmp_jdk_encoder_conformance_sweep(spark):
    """PNG and BMP cross-encoder sweeps: the JDK PNG encoder chooses
    per-row filters adaptively (a real-encoder behavior the synthesis
    contracts never produce), the BMP encoder writes bottom-up
    BI_RGB; both are lossless so every geometry decodes bit-exact."""
    jvm = spark._jvm
    ImageIO = jvm.javax.imageio.ImageIO
    BufferedImage = jvm.java.awt.image.BufferedImage

    def s32(v):
        return v - (1 << 32) if v >= (1 << 31) else v

    def jdk_encode(img, fmt):
        baos = jvm.java.io.ByteArrayOutputStream()
        ok = ImageIO.write(img, fmt, baos)
        assert ok, f"no JDK writer for {fmt}"
        return bytes(baos.toByteArray())

    for fmt, w, h in [
        ("png", 23, 11), ("png", 1, 1), ("png", 64, 3), ("png", 2, 40),
        ("bmp", 23, 11), ("bmp", 1, 1), ("bmp", 5, 2), ("bmp", 33, 7),
    ]:
        # TYPE_3BYTE_BGR: the JDK PNG writer encodes it as 8-bit
        # truecolor RGB and the BMP writer as 24-bit BI_RGB — the
        # variants our decoders serve.
        img = BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        want = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                r, g, b = (x * 13 + y * 3) % 256, (x * 5 ^ y) % 256, \
                    (x + 7 * y) % 256
                want[y, x] = (r, g, b)
                img.setRGB(x, y, s32((r << 16) | (g << 8) | b))
        data = jdk_encode(img, fmt)
        if fmt == "png":
            px, n_raw = M.decode_png(data)
        else:
            px = M.decode_bmp(data)
        assert px.shape == (h, w, 3), (fmt, w, h, px.shape)
        assert (px == want).all(), (fmt, w, h)


# ---------------------------------------------------------------------------
# Round 13 (third batch): JDK javax.sound WAV vectors
# ---------------------------------------------------------------------------
#
# The JDK's javax.sound.sampled stack is a second independent audio
# encoder in this container (audioop, the first, was REMOVED in
# Python 3.13 — these vectors keep the external coverage alive there).
# Payloads below were produced by AudioSystem.write(..., WAVE, ...):
# PCM16 stereo frames verbatim, and the same mono signal transcoded to
# G.711 u-law / A-law by the JDK's own converters. The generating
# signal is the closed form in _wav_signal().

_JDK_PCM16_WAV_HEX = (
    "524946462401000057415645666d74201000000001000200401f0000007d0000040010"
    "006461746100010000000065294703122b8a068b2cc509cf2df40cdc2e1210b02f1d13"
    "4b300f16ac30e618d3309d1bbe30321e6f30a120e62fe722232f0225282eed26f52ca9"
    "288c2b312aef29842b2028a12c2126852df423312e9d21a32e1e1fda2e7b1cd62eb619"
    "982ed4161f2ed7136d2dc410812c9f0d5e2b6b0a042a2c077628e603b526a000c3245a"
    "fda42219fa5820e3f6e51dbaf34b1ba3f09018a2edb615bbeac012f0e7b30f46e5930c"
    "c0e2620962e026062ddee20225dc9cff4dda55fca6d812f933d7d8f5f6d5abf2f0d48f"
    "ef22d487ec8ed398e934d3c5e615d311e430d381e186d317df16d4d6dce0d4c1dae2d5"
    "dbd81cd726d78bd8a4d52eda57d403dc41d308de"
)

_JDK_ULAW_WAV_HEX = (
    "524946466600000057415645666d74201200000007000100401f0000401f0000010008"
    "0000006461746140000000ffd1c3bbb5afaca9a6a3a19f9e9d9c9b9a99999898989898"
    "989899999a9a9b9c9d9e9fa1a4a6a9acafb5bcc5d4724f423a342f2c292623201f1e1d"
    "1c1b1a1919"
)

_JDK_ALAW_WAV_HEX = (
    "524946466600000057415645666d74201200000006000100401f0000401f0000010008"
    "0000006461746140000000d5ffef969c8586838d8e8bb5b4b7b6b1b0b0b3b3b2b2b2b2"
    "b2b2b3b3b0b0b1b6b7b4b5888e8d80879a9c97edf250786e111f0506030c0e0b353437"
    "3631303033"
)


def _wav_signal(n, ch):
    import math

    out = []
    for i in range(n):
        for c in range(ch):
            out.append(int(12000 * math.sin(0.07 * i + c)) + 500 * c)
    return out


def test_decode_wav_pcm16_jdk_javax_sound_vector():
    n_ch, rate, bits, samples = M.decode_wav(_hex(_JDK_PCM16_WAV_HEX))
    assert (n_ch, rate, bits) == (2, 8000, 16)
    assert list(samples) == _wav_signal(64, 2)  # bit-exact


@pytest.mark.parametrize("name,lit", [
    ("ulaw", "_JDK_ULAW_WAV_HEX"), ("alaw", "_JDK_ALAW_WAV_HEX"),
])
def test_decode_wav_g711_jdk_javax_sound_vectors(name, lit):
    """JDK-ENCODED G.711: our expansion of the JDK encoder's code
    bytes must land within one quantization step of the original
    signal (segment step <= 256 at these amplitudes for both laws) —
    a true cross-implementation encode->decode loop, unlike the
    audioop vectors where encode and table come from one codebase."""
    payload = _hex(globals()[lit])
    n_ch, rate, bits, samples = M.decode_wav(payload)
    assert (n_ch, rate, bits) == (1, 8000, 8)
    orig = _wav_signal(64, 1)
    assert len(samples) == 64
    worst = max(abs(int(s) - o) for s, o in zip(samples, orig))
    assert worst <= 256, (name, worst)
    # and the decode is not degenerate: it tracks the waveform
    import numpy as np

    corr = np.corrcoef(np.asarray(samples, float), np.asarray(orig, float))[0, 1]
    assert corr > 0.999, (name, corr)
