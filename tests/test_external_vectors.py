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

Remaining caveats: JPEG and TIFF-LZW have no independent encoder or
published byte-exact vector reproducible in this container and stay
covered by closed-form synthesis + corruption fuzz.
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
