"""Unit tests for the dependency-free media codecs
(operators/multimodal.py): BMP (24-bit BI_RGB), PPM (P6), PNG (8-bit
truecolor, stdlib zlib), WAV (PCM16), G.711 mu-law WAV, and
uncompressed AVI video.

The end-to-end decode entries are hash-gated against closed-form
DuckDB oracles (test_oracle_parity / the driver gate); these tests pin
the parser edge cases the oracle can't reach — top-down BMPs, comment
handling, chunk walking, and the loud rejection of unsupported
variants.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

import duckdb_redis_olap_scanner_spark.operators.multimodal as M


@pytest.mark.parametrize("doc_id", [0, 1, 5, 12, 13, 51, 123, 4999])
def test_bmp_ppm_round_trip(doc_id):
    px = M._image_pixels(doc_id)
    assert (M.decode_bmp(M.encode_bmp_payload(doc_id)) == px).all()
    assert (M.decode_ppm(M.encode_ppm_payload(doc_id)) == px).all()


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 50, 123])
def test_wav_round_trip(doc_id):
    ch, sr, f = M._audio_params(doc_id)
    got_ch, got_sr, bits, samples = M.decode_wav(M.encode_wav_payload(doc_id))
    assert (got_ch, got_sr, bits) == (ch, sr, 16)
    assert len(samples) == f * ch
    assert (samples == M._audio_samples(doc_id)).all()


def test_bmp_top_down_negative_height():
    """BMPs with negative biHeight store rows top-down; the decoder
    must not flip them."""
    doc_id = 7
    buf = bytearray(M.encode_bmp_payload(doc_id))
    w, h = struct.unpack_from("<ii", buf, 18)
    stride = (w * 3 + 3) // 4 * 4
    body = (
        np.frombuffer(bytes(buf[54:]), np.uint8)
        .reshape(h, stride)[::-1]
        .tobytes()
    )
    top_down = (
        bytes(buf[:22]) + struct.pack("<i", -h) + bytes(buf[26:54]) + body
    )
    assert (M.decode_bmp(top_down) == M._image_pixels(doc_id)).all()


def test_bmp_row_padding_varies():
    """Widths 4..16 cover every stride-mod-4 case; each must decode
    (padding bytes skipped, not read as pixels)."""
    for doc_id in range(13):
        w, _h = M._image_dims(doc_id)
        assert (w * 3) % 4 == (doc_id % 13 * 3) % 4  # all residues hit
        px = M.decode_bmp(M.encode_bmp_payload(doc_id))
        assert (px == M._image_pixels(doc_id)).all()


def test_bmp_rejects_unsupported():
    buf = bytearray(M.encode_bmp_payload(3))
    with pytest.raises(ValueError, match="magic"):
        M.decode_bmp(b"PNG" + bytes(buf[2:]))
    bad_bpp = bytearray(buf)
    struct.pack_into("<H", bad_bpp, 28, 8)  # 8-bit palette
    with pytest.raises(ValueError, match="bpp=8"):
        M.decode_bmp(bytes(bad_bpp))
    bad_comp = bytearray(buf)
    struct.pack_into("<I", bad_comp, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression=1"):
        M.decode_bmp(bytes(bad_comp))


def test_ppm_header_variants():
    """The netpbm header allows arbitrary whitespace and '#' comments
    anywhere between fields."""
    px = M._image_pixels(5)
    h, w, _ = px.shape
    raw = px.tobytes()
    hdr = f"P6 # inline\n # another\n  {w}\n#x\n {h}  \n255\n".encode()
    assert (M.decode_ppm(hdr + raw) == px).all()
    with pytest.raises(ValueError, match="P6"):
        M.decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        M.decode_ppm(f"P6\n{w} {h}\n65535\n".encode() + raw * 2)


def test_wav_chunk_walk():
    """The parser must skip unknown chunks (with the even-padding
    rule) and find fmt/data wherever they sit."""
    doc_id = 4
    ch, sr, f = M._audio_params(doc_id)
    data = M._audio_samples(doc_id).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
    odd = b"xyz"  # 3 bytes -> 1 pad byte
    chunks = (
        struct.pack("<4sI", b"junk", len(odd)) + odd + b"\x00"
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"fact", 4) + struct.pack("<I", f)
        + struct.pack("<4sI", b"data", len(data)) + data
    )
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks
    got_ch, got_sr, bits, samples = M.decode_wav(payload)
    assert (got_ch, got_sr, bits) == (ch, sr, 16)
    assert (samples == M._audio_samples(doc_id)).all()


def test_wav_rejects_unsupported():
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_wav(b"OggS" + b"\x00" * 40)
    buf = bytearray(M.encode_wav_payload(2))
    # fmt chunk payload starts at 12 (RIFF hdr) + 8 (chunk hdr)
    struct.pack_into("<H", buf, 20, 3)  # IEEE float format
    with pytest.raises(ValueError, match="format=3"):
        M.decode_wav(bytes(buf))


def test_decode_image_dispatch():
    """The public decode_image routes BMP/PPM to the native decoders
    with NO import gate; only compressed formats still require
    Pillow."""
    assert (M.decode_image(M.encode_bmp_payload(9)) == M._image_pixels(9)).all()
    assert (M.decode_image(M.encode_ppm_payload(9)) == M._image_pixels(9)).all()
    assert (M.decode_image(M.encode_png_payload(9)) == M._image_pixels(9)).all()
    if M._try_import_pillow() is None:
        # Baseline AND progressive JPEG now decode natively; only
        # arithmetic-coded JPEG still import-gates on Pillow.
        import duckdb_redis_olap_scanner_spark.operators.jpeg as _J

        arith = bytearray(_J.encode_jpeg_payload(1))
        sof = arith.find(b"\xff\xc0")
        arith[sof + 1] = 0xC9
        with pytest.raises(NotImplementedError, match="codec-library"):
            M.decode_image(bytes(arith))


def test_decode_audio_dispatch():
    ch, sr, bits, samples = M.decode_audio(M.encode_wav_payload(11))
    assert bits == 16 and (samples == M._audio_samples(11)).all()
    # fLaC magic now routes to the NATIVE decoder (which rejects this
    # truncated imposter loudly) — no codec-library gate
    with pytest.raises(ValueError, match="metadata truncated"):
        M.decode_audio(b"fLaC" + b"\x00" * 16)
    # perceptual codecs stay gated: an MP3 frame header is neither
    # RIFF/WAVE nor FLAC
    with pytest.raises(NotImplementedError, match="perceptual-audio"):
        M.decode_audio(b"\xff\xfb\x90\x00" + b"\x00" * 16)


def test_checksum_pins_order():
    """The position-weighted checksum must distinguish the decoded
    array from its channel-swapped and row-flipped variants — the
    property that makes the oracle catch stride/flip/BGR bugs."""
    px = M._image_pixels(8).astype(np.int64)

    def chk(a):
        flat = a.reshape(-1)
        return int(((np.arange(flat.size) + 1) * flat).sum())

    assert chk(px) != chk(px[:, :, ::-1])  # BGR left unswapped
    assert chk(px) != chk(px[::-1])  # rows left bottom-up


@pytest.mark.parametrize("doc_id", [0, 1, 4, 9, 17, 64, 123])
def test_png_round_trip(doc_id):
    """Docs where doc_id % 3 == 0 (0, 9, 123) are Adam7-interlaced;
    the rest sequential — both round-trip to the same pixels, with
    n_raw following each wire format's scanline accounting."""
    px, n_raw = M.decode_png(M.encode_png_payload(doc_id))
    assert (px == M._image_pixels(doc_id)).all()
    w, h = M._image_dims(doc_id)
    if doc_id % 3 == 0:
        want = sum(
            ph * (1 + 3 * pw)
            for pw, ph in M._adam7_pass_dims(w, h)
            if pw and ph
        )
    else:
        want = h * (1 + 3 * w)
    assert n_raw == want


def test_png_adam7_edge_geometries_round_trip():
    """Adam7 on sizes that empty out various passes (1x1 keeps only
    pass 1; single-row/column images drop whole pass families) and on
    sizes exercising all seven passes."""
    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (2, 1), (1, 2), (3, 3), (5, 5), (8, 8),
                 (9, 10), (16, 20), (13, 1), (1, 13)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = M.png_from_array(px, adam7=True)
        out, _ = M.decode_png(payload)
        assert np.array_equal(out, px), (w, h)


def test_png_adam7_header_flag_is_real():
    """The IHDR interlace byte decides the scanline layout: decoding
    an Adam7 stream with the flag patched to 0 must fail the length
    check, not silently misinterpret the passes."""
    import struct
    import zlib

    payload = bytearray(M.encode_png_payload(9))  # 9 % 3 == 0: Adam7
    ihdr_off = len(M.PNG_SIG) + 8
    assert payload[ihdr_off + 12] == 1  # interlace byte
    payload[ihdr_off + 12] = 0
    body = bytes(payload[ihdr_off : ihdr_off + 13])
    crc = zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    struct.pack_into(">I", payload, ihdr_off + 13, crc)
    with pytest.raises(ValueError, match="scanline stream"):
        M.decode_png(bytes(payload))


def test_png_exercises_all_five_filters():
    # Row y uses filter y % 5, so any image with height >= 5 carries
    # every PNG filter type; doc_id=4 has height 2+4%7 = 6 (and is
    # sequential: 4 % 3 != 0, so filter bytes sit at row strides).
    import struct
    import zlib

    payload = M.encode_png_payload(4)
    pos = len(M.PNG_SIG)
    idat = bytearray()
    n_idat = 0
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        if ctype == b"IDAT":
            idat.extend(payload[pos + 8 : pos + 8 + length])
            n_idat += 1
        pos += 12 + length
    assert n_idat == 2  # the multi-IDAT split is real
    raw = zlib.decompress(bytes(idat))
    w, h = M._image_dims(4)
    stride = 1 + 3 * w
    filters = {raw[y * stride] for y in range(h)}
    assert filters == {0, 1, 2, 3, 4}


def test_png_rejects_corruption_and_imposters():
    payload = bytearray(M.encode_png_payload(7))
    payload[-5] ^= 0xFF  # flip a CRC byte
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png(bytes(payload))
    with pytest.raises(ValueError, match="signature"):
        M.decode_png(b"NOTAPNG" + bytes(payload))
    # Truncated IDAT stream: zlib must fail loudly, not return junk.
    with pytest.raises(Exception):
        M.decode_png(bytes(M.encode_png_payload(7))[:40])


@pytest.mark.parametrize("doc_id", [0, 1, 2, 5, 16, 17, 33, 48])
def test_wav_adpcm_stereo_round_trip(doc_id):
    """Stereo IMA ADPCM: two independent state machines over
    interleaved 4-byte nibble groups, verified against a direct
    Python replay of the synthesis closed form (includes docs whose
    last block is partial and single-block docs)."""
    ch, sr, bits, samples = M.decode_wav(
        M.encode_wav_adpcm_stereo_payload(doc_id)
    )
    _sr, n = M._adpcm_params(doc_id)
    assert (ch, sr, bits) == (2, _sr, 4)
    assert len(samples) == n * 2
    for c in (0, 1):
        s = 0
        b = 0
        pred = idx = None
        while s < n:
            pred, idx = M._adpcm_stereo_header(doc_id, b, c)
            assert samples[2 * s + c] == pred
            s += 1
            k = min(M.ADPCM_SPB, n - s + 1) - 1
            for j in range(k):
                nib = M._adpcm_stereo_nibble(doc_id, s + j, c)
                pred, idx = M._ima_step(pred, idx, nib)
                assert samples[2 * (s + j) + c] == pred
            s += k
            b += 1


def test_wav_adpcm_stereo_requires_fact():
    payload = bytearray(M.encode_wav_adpcm_stereo_payload(3))
    fact = payload.find(b"fact")
    # rename the fact chunk so the parser cannot see the frame count
    payload[fact : fact + 4] = b"junk"
    with pytest.raises(ValueError, match="fact chunk"):
        M.decode_wav(bytes(payload))


@pytest.mark.parametrize("doc_id", [0, 1, 2, 5, 33])
def test_wav_pcm24_round_trip(doc_id):
    """3-byte two's-complement widening: both sign regions appear
    (the synthesis stride wraps the 24-bit range)."""
    import numpy as np

    ch, sr, f = M._audio_params(doc_id)
    got_ch, got_sr, bits, samples = M.decode_wav(
        M.encode_wav_pcm24_payload(doc_id)
    )
    assert (got_ch, got_sr, bits) == (ch, sr, 24)
    ref = M._pcm24_samples(doc_id)
    assert (samples.astype(np.int64) == ref).all()
    assert (ref < 0).any() and (ref > 0).any()


def test_wav_pcm24_rejects_misaligned_data():
    payload = bytearray(M.encode_wav_pcm24_payload(3))
    # shrink the data chunk by one byte -> not a multiple of 3
    data_at = payload.find(b"data")
    import struct as _st

    (n,) = _st.unpack_from("<I", payload, data_at + 4)
    _st.pack_into("<I", payload, data_at + 4, n - 1)
    del payload[data_at + 8 + n - 1]
    with pytest.raises(ValueError, match="multiple of 3"):
        M.decode_wav(bytes(payload))


def test_alaw_expansion_reference_values():
    """Known G.711 A-law landmarks: 0x55/0xD5 are minus/plus 8 (the
    quiet codes), 0x2A/0xAA full scale -/+32256; complementary sign
    pairs are symmetric."""
    import numpy as np

    got = M.alaw_expand(np.array([0x55, 0xD5, 0x2A, 0xAA], dtype=np.uint8))
    assert list(got) == [-8, 8, -32256, 32256]
    b = np.arange(128, dtype=np.uint8)
    assert (M.alaw_expand(b) == -M.alaw_expand(b | 0x80)).all()


@pytest.mark.parametrize("doc_id", [0, 1, 2, 5, 33])
def test_wav_alaw_round_trip(doc_id):
    ch, sr, f = M._audio_params(doc_id)
    got_ch, got_sr, bits, samples = M.decode_wav(
        M.encode_wav_alaw_payload(doc_id)
    )
    assert (got_ch, got_sr, bits) == (ch, sr, 8)
    ref = M.alaw_expand(M._alaw_samples(doc_id))
    assert (samples.astype("int64") == ref).all()


def test_mulaw_expansion_reference_values():
    """Known G.711 mu-law landmarks: 0xFF/0x7F are plus/minus zero,
    0x80 is full-scale positive, 0x00 full-scale negative (+-32124)."""
    import numpy as np

    enc = np.array([0xFF, 0x7F, 0x80, 0x00, 0xF0, 0x70], dtype=np.uint8)
    got = M.mulaw_expand(enc)
    assert list(got[:4]) == [0, 0, 32124, -32124]
    # Symmetric magnitudes for complementary sign pairs.
    assert got[4] == -got[5]


@pytest.mark.parametrize("doc_id", [0, 1, 2, 5, 33])
def test_wav_mulaw_round_trip(doc_id):
    ch, sr, f = M._audio_params(doc_id)
    got_ch, got_sr, bits, samples = M.decode_wav(
        M.encode_wav_mulaw_payload(doc_id)
    )
    assert (got_ch, got_sr, bits) == (ch, sr, 8)
    assert len(samples) == f * ch
    assert (samples == M.mulaw_expand(M._mulaw_samples(doc_id))).all()


@pytest.mark.parametrize("doc_id", [0, 1, 3, 7, 12, 99])
def test_avi_round_trip(doc_id):
    fr = M.decode_avi(M.encode_avi_payload(doc_id))
    assert (fr == M._video_pixels(doc_id)).all()
    w, h, nf = M._video_params(doc_id)
    assert fr.shape == (nf, h, w, 3)


def test_avi_rejects_unsupported():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        M.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    buf = bytearray(M.encode_avi_payload(2))
    # strh's fccHandler sits 4 bytes into the strh payload; patch the
    # codec fourcc to a compressed one — the decoder must refuse.
    i = buf.find(b"strh") + 8 + 4
    buf[i : i + 4] = b"MJPG"
    with pytest.raises(ValueError, match="MJPG"):
        M.decode_avi(bytes(buf))


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, operators/jpeg.py)
# ---------------------------------------------------------------------------

import duckdb_redis_olap_scanner_spark.operators.jpeg as J  # noqa: E402


def test_jpeg_zigzag_is_the_spec_order():
    # First entries of T.81's zigzag scan in natural (row*8+col) index.
    assert J.ZIGZAG[:16] == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    ]
    assert sorted(J.ZIGZAG) == list(range(64))


def _expected_stats(doc_id):
    w, h = J.synth_dims(doc_id)
    nb = (w // 8) * (h // 8)
    dc = ac = ck = 0
    for b in range(nb):
        for c in range(3):
            q = J.quant_table(c)
            for z, v in J.synth_block_coefs(doc_id, b, c).items():
                deq = v * q[z]
                dc += deq if z == 0 else 0
                ac += deq if z > 0 else 0
                ck += (b * 192 + c * 64 + z + 1) * deq
    return w, h, nb * 3, dc, ac, ck


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 5, 6, 11, 12, 123, 4999])
def test_jpeg_round_trip_coefficients(doc_id):
    """Encode from closed-form coefficients, decode through the full
    marker walk + file-defined Huffman tables + dequantize; doc_id
    divisible by 3 exercises DRI/RSTn with DC-predictor resets."""
    px, st = J.decode_jpeg(J.encode_jpeg_payload(doc_id))
    w, h, n_blocks, dc, ac, ck = _expected_stats(doc_id)
    assert (st["width"], st["height"], st["n_blocks"]) == (w, h, n_blocks)
    assert st["sum_dc"] == dc
    assert st["sum_ac"] == ac
    assert st["coef_checksum"] == ck
    assert px.shape == (h, w, 3) and px.dtype == np.uint8


def test_jpeg_restart_markers_present_and_required():
    """A doc_id % 3 == 2 payload must physically contain RSTn markers,
    and corrupting one must fail loudly (proving the decoder honors
    the DRI interval rather than skipping bytes)."""
    payload = bytearray(J.encode_jpeg_payload(5))  # 3x2 MCUs, DRI=2
    rst_positions = [
        i for i in range(len(payload) - 1)
        if payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7
    ]
    assert len(rst_positions) == 2  # 6 MCUs / DRI 2 -> 2 interior RSTs
    payload[rst_positions[0] + 1] = 0xD7  # wrong RST index
    with pytest.raises(ValueError, match="expected RST"):
        J.decode_jpeg(bytes(payload))


def test_jpeg_dc_only_idct_closed_form():
    """IDCT pin: a block whose only coefficient is DC decodes to the
    flat value round(dc*Q0/8) + 128 on every pixel — the one
    closed-form pixel case a lossy codec has."""
    real_synth = J.synth_block_coefs
    try:
        J.synth_block_coefs = lambda d, b, c: {0: 24 if c == 0 else -16}
        px, st = J.decode_jpeg(J.encode_jpeg_payload(1))  # 16x16, no DRI
        q0_luma, q0_chroma = J.quant_table(0)[0], J.quant_table(1)[0]
        want_y = int(np.clip(np.round(24 * q0_luma / 8) + 128, 0, 255))
        want_c = int(np.clip(np.round(-16 * q0_chroma / 8) + 128, 0, 255))
        assert (px[:, :, 0] == want_y).all()
        assert (px[:, :, 1] == want_c).all()
        assert (px[:, :, 2] == want_c).all()
        assert st["sum_ac"] == 0
    finally:
        J.synth_block_coefs = real_synth


def test_jpeg_rejects_non_dct_modes():
    payload = bytearray(J.encode_jpeg_payload(1))
    # SOF0 (FFC0) -> SOF9 (FFC9): arithmetic coding stays gated.
    sof = payload.find(b"\xff\xc0")
    assert sof > 0
    payload[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"NOPE")


def test_jpeg_sof2_relabel_decodes_identically():
    """A full-band Ss=0..63 scan under an SOF2 header carries baseline
    semantics; the multi-scan decoder must produce identical stats."""
    payload = bytearray(J.encode_jpeg_payload(1))
    _px0, st0 = J.decode_jpeg(bytes(payload))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2
    _px1, st1 = J.decode_jpeg(bytes(payload))
    assert st0 == st1


def test_jpeg_huffman_tables_are_canonical_and_legal():
    """Every DHT in a synthesized file must be decodable by the
    generic canonical reader AND leave the all-ones code of its max
    length unassigned (T.81's prefix-reservation rule)."""
    payload = J.encode_jpeg_payload(123)
    pos, n_tables = 2, 0
    while pos + 4 <= len(payload):
        marker = payload[pos + 1]
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xC4:
            n_tables += 1
            bits = list(body[1:17])
            code, maxcode = 0, {}
            for ln in range(1, 17):
                code = (code << 1) if ln > 1 else 0
                code += 0  # canonical walk below
            # rebuild canonical codes and check the all-ones rule
            code = 0
            last_len = 0
            codes = []
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    code <<= ln - last_len
                    last_len = ln
                    codes.append((code, ln))
                    code += 1
            assert codes, "empty Huffman table"
            for c, ln in codes:
                assert c < (1 << ln)
                assert not (ln and c == (1 << ln) - 1), (
                    f"all-ones code of length {ln} assigned"
                )
        if marker == 0xDA:
            break
        pos += 2 + length
    assert n_tables == 4


def test_decode_image_routes_baseline_jpeg_natively():
    px = M.decode_image(J.encode_jpeg_payload(7))
    w, h = J.synth_dims(7)
    assert px.shape == (h, w, 3)


def _expected_stats_420(doc_id):
    w, h = J.synth_dims420(doc_id)
    nm = (w // 16) * (h // 16)
    dc = ac = ck = 0
    blk = 0
    for m in range(nm):
        for n, c in enumerate((0, 0, 0, 0, 1, 2)):
            q = J.quant_table(c)
            for z, v in J.synth_block_coefs(doc_id, m * 6 + n, c).items():
                deq = v * q[z]
                dc += deq if z == 0 else 0
                ac += deq if z > 0 else 0
                ck += (blk * 64 + z + 1) * deq
            blk += 1
    return w, h, nm * 6, dc, ac, ck


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 5, 6, 11, 123, 4999])
def test_jpeg420_round_trip_coefficients(doc_id):
    """4:2:0 interleaved MCUs: four luma blocks per MCU share one DC
    predictor chain — a decoder that walks components 1:1:1 drifts
    immediately. Odd doc_ids exercise DRI/RSTn mid-row."""
    px, st = J.decode_jpeg(J.encode_jpeg_payload(doc_id, "420"))
    w, h, n_blocks, dc, ac, ck = _expected_stats_420(doc_id)
    assert (st["width"], st["height"], st["n_blocks"]) == (w, h, n_blocks)
    assert (st["sum_dc"], st["sum_ac"], st["coef_checksum"]) == (dc, ac, ck)
    assert px.shape == (h, w, 3) and px.dtype == np.uint8


def test_jpeg420_chroma_upsampling_is_replication():
    """DC-only 4:2:0 chroma decodes to a flat half-res plane that must
    come back replicated 2x2 to full resolution."""
    real_synth = J.synth_block_coefs
    try:
        J.synth_block_coefs = lambda d, b, c: {0: 8 if c == 0 else 24}
        px, _st = J.decode_jpeg(J.encode_jpeg_payload(0, "420"))
        q0_l, q0_c = J.quant_table(0)[0], J.quant_table(1)[0]
        want_y = int(np.clip(np.round(8 * q0_l / 8) + 128, 0, 255))
        want_c = int(np.clip(np.round(24 * q0_c / 8) + 128, 0, 255))
        assert (px[:, :, 0] == want_y).all()
        assert (px[:, :, 1] == want_c).all() and (px[:, :, 2] == want_c).all()
    finally:
        J.synth_block_coefs = real_synth


def test_jpeg_rejects_oversampled():
    payload = bytearray(J.encode_jpeg_payload(1))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 2 + 2 + 6 + 1] = 0x33  # Y sampling 3x3
    with pytest.raises(NotImplementedError, match="sampling factor"):
        J.decode_jpeg(bytes(payload))


# ---------------------------------------------------------------------------
# IMA ADPCM (stateful compressed audio, operators/multimodal.py)
# ---------------------------------------------------------------------------


def _adpcm_reference(doc_id):
    """Independent replay of the IMA state machine from the synthesis
    contract (not via adpcm_expand)."""
    sr, n = M._adpcm_params(doc_id)
    out = []
    pred = idx = 0
    for s in range(n):
        if s % M.ADPCM_SPB == 0:
            pred, idx = M._adpcm_block_header(doc_id, s // M.ADPCM_SPB)
        else:
            nib = M._adpcm_nibble(doc_id, s)
            step = M.IMA_STEP_TABLE[idx]
            diff = (step >> 3) + (nib & 1) * (step >> 2) \
                + ((nib >> 1) & 1) * (step >> 1) + ((nib >> 2) & 1) * step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + M.IMA_INDEX_ADJUST[nib & 7]))
        out.append(pred)
    return sr, out


def test_ima_tables_are_the_spec_tables():
    assert len(M.IMA_STEP_TABLE) == 89
    assert M.IMA_STEP_TABLE[0] == 7 and M.IMA_STEP_TABLE[-1] == 32767
    assert all(a < b for a, b in zip(M.IMA_STEP_TABLE, M.IMA_STEP_TABLE[1:]))
    assert M.IMA_INDEX_ADJUST == [-1, -1, -1, -1, 2, 4, 6, 8]


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 16, 17, 33, 50, 123, 4999])
def test_adpcm_round_trip(doc_id):
    """n = 16 + d%33 spans partial single blocks, exact one-block
    (n=17), and multi-block streams with per-block state resets."""
    ch, sr, bits, samples = M.decode_wav(M.encode_wav_adpcm_payload(doc_id))
    rsr, ref = _adpcm_reference(doc_id)
    assert (ch, sr, bits) == (1, rsr, 4)
    assert list(samples) == ref


def test_adpcm_fact_chunk_bounds_padded_last_block():
    """A doc with an ODD nibble count carries a zero pad nibble the
    fact chunk must exclude; without the fact count the capacity
    formula would emit one extra sample."""
    for doc_id in range(33):
        _sr, n = M._adpcm_params(doc_id)
        if (n - 1) % M.ADPCM_SPB % 2 == 0 and n % M.ADPCM_SPB != 0:
            break
    _ch, _sr2, _bits, samples = M.decode_wav(
        M.encode_wav_adpcm_payload(doc_id)
    )
    assert len(samples) == n


def test_adpcm_rejects_corrupt_step_index():
    payload = bytearray(M.encode_wav_adpcm_payload(2))
    data_off = payload.find(b"data") + 8
    payload[data_off + 2] = 120  # step index > 88
    with pytest.raises(ValueError, match="step index"):
        M.decode_wav(bytes(payload))


# ---------------------------------------------------------------------------
# FLAC (operators/flac.py)
# ---------------------------------------------------------------------------

import duckdb_redis_olap_scanner_spark.operators.flac as FL


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 6, 7, 16, 40, 123, 4999])
def test_flac_round_trip(doc_id):
    """Bit-exact lossless round trip, samples checked against the
    closed form computed HERE (not via _flac_samples). Even doc_ids
    are mono; odd are stereo and cycle all four channel assignments
    across frames; n = 24 + d%41 spans exact-multiple and partial
    last frames."""
    ch, sr, bits, samples = FL.decode_flac(FL.encode_flac_payload(doc_id))
    ech, esr, n = 1 + doc_id % 2, 8000 + (doc_id % 3) * 4000, 24 + doc_id % 41
    assert (ch, sr, bits) == (ech, esr, 16)
    assert len(samples) == n * ech
    for i, s in enumerate(samples):
        assert s == ((doc_id * 11 + i * 97) % 65536) - 32768


def test_flac_crc8_and_crc16_are_verified():
    payload = bytearray(FL.encode_flac_payload(3))
    # first frame starts right after fLaC + 4-byte header + 34 bytes
    frame0 = 4 + 4 + 34
    bad_hdr = bytearray(payload)
    bad_hdr[frame0 + 4] ^= 0x01  # inside the header, before the CRC-8
    with pytest.raises(ValueError, match="CRC-8"):
        FL.decode_flac(bytes(bad_hdr))
    bad_body = bytearray(payload)
    bad_body[frame0 + 12] ^= 0x40  # inside subframe data
    with pytest.raises(ValueError, match="CRC|sync|truncated|reserved"):
        FL.decode_flac(bytes(bad_body))


def test_flac_utf8_frame_numbers():
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              (1 << 31) - 1, (1 << 36) - 1):
        br = FL._BitReader(FL._utf8_number(v))
        assert FL._read_utf8_number(br) == v


def _handmade_stream(frame_bits_fn, bs, total, sr=8000, ch=1, bps=16):
    """Assemble a one-frame FLAC stream from a caller-supplied
    subframe-bits writer, exercising decoder paths the repo encoder
    never emits."""
    si = FL._BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    for _ in range(16):
        si.write(0, 8)
    out = bytearray(b"fLaC") + struct.pack(">I", (1 << 31) | 34)
    out += si.getvalue()
    bw = FL._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(1, 1)            # VARIABLE blocksize strategy
    bw.write(0b0111, 4)       # 16-bit blocksize-1 at end of header
    bw.write(0b0100, 4)       # sample rate 8000 from the code table
    bw.write(0, 4)            # mono
    bw.write(0b100, 3)        # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)            # UTF-8 sample number 0
    bw.write(bs - 1, 16)
    header = bw.getvalue()
    bw.write(FL.crc8(header), 8)
    frame_bits_fn(bw)
    bw.align()
    frame = bw.getvalue()
    out += frame + struct.pack(">H", FL.crc16(frame))
    return bytes(out)


def test_flac_constant_subframe_with_wasted_bits():
    """CONSTANT + wasted-bits: the repo encoder emits neither, so this
    pins the decoder against a hand-assembled spec stream."""
    def sub(bw):
        bw.write(0, 1)
        bw.write(0b000000, 6)   # CONSTANT
        bw.write(1, 1)          # wasted-bits flag
        bw.write(0b01, 2)       # unary 1 -> 2 wasted bits
        bw.write_signed(5, 14)  # constant at bps - wasted
    ch, sr, bits, samples = FL.decode_flac(_handmade_stream(sub, 8, 8))
    assert (ch, sr, bits) == (1, 8000, 16)
    assert list(samples) == [5 << 2] * 8


def test_flac_rice2_method_partitioned():
    """Residual method 1 (5-bit Rice parameters), partition order 1."""
    res = [3, -4, 1, 0, -1, 2, 7, -8]
    def sub(bw):
        bw.write(0, 1)
        bw.write(0b001000, 6)   # FIXED order 0
        bw.write(0, 1)
        bw.write(0b01, 2)       # method 1: rice2
        bw.write(1, 4)          # partition order 1 -> two partitions
        for part in (res[:4], res[4:]):
            bw.write(2, 5)      # k = 2
            for r in part:
                u = (r << 1) if r >= 0 else (-(r << 1) - 1)
                bw.write_unary(u >> 2)
                bw.write(u & 3, 2)
    ch, _sr, _bits, samples = FL.decode_flac(_handmade_stream(sub, 8, 8))
    assert list(samples) == res


def test_flac_rejects_imposters_and_reserved():
    with pytest.raises(ValueError, match="fLaC"):
        FL.decode_flac(b"RIFF....WAVE")
    def sub(bw):
        bw.write(0, 1)
        bw.write(0b000010, 6)   # reserved subframe type
        bw.write(0, 1)
    with pytest.raises(ValueError, match="reserved subframe"):
        FL.decode_flac(_handmade_stream(sub, 8, 8))


def test_flac_payloads_are_genuinely_compressed():
    """The fixed/LPC+Rice frames must beat raw PCM for the sawtooth's
    correlated step pattern on at least the mono docs — i.e. the
    encoder is actually predicting, not verbatim-dumping (frame 0 is
    verbatim by design; the rest predict)."""
    smaller = 0
    for doc_id in range(0, 40, 2):
        n = 24 + doc_id % 41
        raw = n * 2
        overhead = 4 + 4 + 34  # marker + block header + STREAMINFO
        if len(FL.encode_flac_payload(doc_id)) - overhead < raw + 16 * 6:
            smaller += 1
    assert smaller >= 10


def test_flac_dispatches_through_decode_audio():
    ch, sr, bits, samples = M.decode_audio(FL.encode_flac_payload(7))
    assert (ch, sr, bits) == (2, 12000, 16)
    assert len(samples) == (24 + 7 % 41) * 2


# ---------------------------------------------------------------------------
# WebP lossless / VP8L (operators/vp8l.py)
# ---------------------------------------------------------------------------

import duckdb_redis_olap_scanner_spark.operators.vp8l as V


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 5, 6, 7, 11, 12, 30, 90,
                                    4999])
def test_vp8l_round_trip(doc_id):
    """Bit-exact round trip across cache sizes 2..64, simple and
    code-length-coded prefix codes, the subtract-green transform, and
    (tile < height) LZ77 backward references — 2D-mapped distances
    for tile <= 7 (docs 3, 5...), direct scan-order codes for tile >=
    8 (docs 7, 30), literal-only when tile >= height (doc 4999)."""
    px, cache_bits = V.decode_webp(V.encode_webp_payload(doc_id))
    assert cache_bits == 1 + doc_id % 6
    assert (px == M._image_pixels_tiled(doc_id)).all()


def test_vp8l_overlapping_copy_round_trip():
    """A constant image collapses to one literal plus a distance-1
    overlapping copy — the LZ77 copy source overlaps its destination
    and must be copied pixelwise, not memcpy'd."""
    const = np.full((4, 6, 3), 77, dtype=np.uint8)
    payload = V.encode_vp8l(const, 3)
    px, _ = V.decode_webp(payload)
    assert (px == const).all()
    # 24 pixels -> a handful of bytes proves the copy engaged
    assert len(payload) < 60


def test_vp8l_lz77_distance_shapes_round_trip():
    """Mapped 2D distances (dx != 0, dy = 0 and dx = 0, dy > 1),
    direct distances past the 120-entry map, and multi-copy streams
    all round-trip."""
    # 1-row image with period 5 -> dist 5 = map entry (5, 0)
    row = (np.arange(50 * 3, dtype=np.int64) % 15).astype(np.uint8)
    one_row = row.reshape(1, 50, 3)
    px, _ = V.decode_webp(V.encode_vp8l(one_row, 4))
    assert (px == one_row).all()
    # 1-row image with period 9 at width 50 -> (dx=9, dy=0) is past
    # the map's dx<=8 -> direct distance code 9 + 120
    row9 = (np.arange(50 * 3, dtype=np.int64) % 27).astype(np.uint8)
    one_row9 = row9.reshape(1, 50, 3)
    px, _ = V.decode_webp(V.encode_vp8l(one_row9, 4))
    assert (px == one_row9).all()
    # 9-row vertical tile at width 16 -> dist 144, dy=9 past the map
    block = np.arange(9 * 16 * 3, dtype=np.int64) % 256
    tall = np.tile(block.astype(np.uint8).reshape(9, 16, 3), (3, 1, 1))
    px, _ = V.decode_webp(V.encode_vp8l(tall, 6))
    assert (px == tall).all()


def test_vp8l_color_cache_hits_decode():
    """Single-pixel repeats below MIN_MATCH force cache-hit symbols
    (runs of >= 3 become LZ77 copies instead, so this path needs
    isolated repeats)."""
    # A recurs every 3 pixels with distinct fillers between, so each
    # repeat matches for exactly 1 pixel (< MIN_MATCH) and must go
    # through the color cache where its slot survives.
    vals = []
    a = (10, 20, 30)
    f = 0
    for i in range(24):
        if i % 3 == 0:
            vals.extend(a)
        else:
            f += 1
            vals.extend((40 + f, 80 + f, 120 + f))
    arr = np.array(vals, dtype=np.uint8).reshape(1, 24, 3)
    for cache_bits in (2, 6, 10):
        px, _ = V.decode_webp(V.encode_vp8l(arr, cache_bits))
        assert (px == arr).all()


def test_vp8l_code_length_code_round_trip():
    """The DEFLATE-style RLE (16 repeat / 17-18 zero runs) through the
    19-entry reorder table, including a >138 zero gap."""
    for lengths in (
        {0: 1, 255: 1},
        {5: 2, 6: 2, 7: 3, 8: 3, 200: 2},
        {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 5: 4, 6: 4, 7: 4,
         250: 3, 251: 3, 279: 2},
        {279: 1, 0: 1},
    ):
        bw = V._LsbBitWriter()
        V._write_code_lengths(bw, lengths, 280)
        got = V._read_code_lengths(V._LsbBitReader(bw.getvalue()), 280)
        assert got == lengths


def test_vp8l_compresses_flat_content():
    """A 64x64 image drawn from 8 values must come out well under raw
    RGB size — i.e. the prefix codes genuinely compress."""
    rng = np.arange(64 * 64 * 3, dtype=np.int64)
    px = ((rng % 8) * 31 % 256).astype(np.uint8).reshape(64, 64, 3)
    payload = V.encode_vp8l(px, 4)
    assert len(payload) < 64 * 64 * 3 // 2
    got, _ = V.decode_webp(payload)
    assert (got == px).all()


def test_vp8l_rejects_and_gates():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        V.decode_webp(b"fLaC" + b"\x00" * 40)
    # lossy VP8 chunk -> loud codec-library gate
    lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError, match="lossy"):
        V.decode_webp(lossy)

    def stream(bits_fn, w=2, h=1):
        bw = V._LsbBitWriter()
        bw.write(0x2F, 8)
        bw.write(w - 1, 14)
        bw.write(h - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bits_fn(bw)
        body = bw.getvalue()
        vp8l = b"VP8L" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            vp8l += b"\x00"
        return (b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP"
                + vp8l)

    def truncated_predictor(bw):
        bw.write(1, 1)  # transform present
        bw.write(0, 2)  # predictor — then nothing: sub-image truncated
    with pytest.raises(ValueError, match="truncated"):
        V.decode_webp(stream(truncated_predictor))

    def repeated_transform(bw):
        bw.write(1, 1)
        bw.write(2, 2)  # subtract-green
        bw.write(1, 1)
        bw.write(2, 2)  # subtract-green AGAIN — spec: each at most once
    with pytest.raises(ValueError, match="repeated"):
        V.decode_webp(stream(repeated_transform))

    def truncated_huffman_image(bw):
        bw.write(0, 1)  # no transform
        bw.write(0, 1)  # no cache
        bw.write(1, 1)  # huffman image present — then nothing
    with pytest.raises(ValueError, match="truncated"):
        V.decode_webp(stream(truncated_huffman_image))

    def lz77_before_start(bw):
        bw.write(0, 1)  # no transform
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no huffman image
        # green code over {0, 256}: symbol 256 is length prefix 0
        V._write_prefix_code(bw, {0: 1, 256: 1}, 280)
        for _ in range(3):
            V._write_prefix_code(bw, {0: 1}, 256)
        V._write_prefix_code(bw, {0: 1}, 40)
        codes = V.canonical_codes({0: 1, 256: 1})
        c, ln = codes[256]
        bw.write_code(c, ln)  # copy as the FIRST symbol: nothing behind
    with pytest.raises(ValueError, match="before image start"):
        V.decode_webp(stream(lz77_before_start))

    def lz77_overrun(bw):
        bw.write(0, 1)  # no transform
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no huffman image
        # symbol 259 = length prefix 3 -> length 4 > the 1 pixel left
        V._write_prefix_code(bw, {0: 1, 259: 1}, 280)
        for _ in range(3):
            V._write_prefix_code(bw, {0: 1}, 256)
        # distance prefix 1 -> distance code 2 -> map (1, 0) -> dist 1
        V._write_prefix_code(bw, {1: 1}, 40)
        codes = V.canonical_codes({0: 1, 259: 1})
        c, ln = codes[0]
        bw.write_code(c, ln)  # one literal (r/b/a are zero-bit codes)
        c, ln = codes[259]
        bw.write_code(c, ln)
    with pytest.raises(ValueError, match="overruns image"):
        V.decode_webp(stream(lz77_overrun))


def test_vp8l_decode_image_dispatch():
    px = M.decode_image(V.encode_webp_payload(9))
    assert (px == M._image_pixels_tiled(9)).all()


def test_vp8l_predictor_transform_all_modes():
    """All 14 predictor modes round-trip, including the Select and
    clamped add/subtract predictors and the spec border rules (1x1,
    single row, single column)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    for mode in range(14):
        out, _ = V.decode_webp(
            V.encode_vp8l(img, 3, transforms=(("predictor", 2, mode),))
        )
        assert (out == img).all(), f"mode {mode}"
    for shape in [(1, 1), (1, 9), (9, 1), (2, 2)]:
        im = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        for mode in (3, 11, 13):
            out, _ = V.decode_webp(
                V.encode_vp8l(im, 2, transforms=(("predictor", 2, mode),))
            )
            assert (out == im).all(), (shape, mode)


def test_vp8l_color_transform_round_trip():
    """The color transform's signed int8 ColorTransformDelta
    (arithmetic >> 5) forward/inverse across element values spanning
    both sign interpretations."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    for elems in [(0, 0, 0), (16, 200, 3), (255, 1, 128), (77, 77, 77)]:
        out, _ = V.decode_webp(
            V.encode_vp8l(img, 2, transforms=(("color", 3, elems),))
        )
        assert (out == img).all(), elems


def test_vp8l_palette_transform_all_bundle_widths():
    """Color indexing with delta-coded palettes across every pixel
    bundling width (8/4/2 indices per green byte and unbundled)."""
    rng = np.random.default_rng(7)
    for ncol in (2, 3, 4, 9, 16, 17, 200):
        vals = rng.integers(0, 256, size=(ncol, 3))
        idx = rng.integers(0, ncol, size=(7, 29))
        pimg = vals[idx].astype(np.uint8)
        out, _ = V.decode_webp(
            V.encode_vp8l(pimg, 0, transforms=("palette",))
        )
        assert (out == pimg).all(), ncol


def test_vp8l_huffman_images_round_trip():
    """Meta prefix codes: per-block prefix-code groups selected per
    pixel, including group counts that exceed the block count (the
    encoder clamps to the groups the meta image can name)."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    for ng in (2, 3, 5):
        out, _ = V.decode_webp(V.encode_vp8l(img, 4, meta_spec=(2, ng)))
        assert (out == img).all(), ng
    tiny = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    out, _ = V.decode_webp(V.encode_vp8l(tiny, 1, meta_spec=(2, 3)))
    assert (out == tiny).all()


def test_vp8l_transform_combinations():
    """Transforms chain in stream order and invert in reverse order;
    palette composes with meta prefix codes."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    out, _ = V.decode_webp(
        V.encode_vp8l(
            img, 3, transforms=("subtract_green", ("predictor", 2, 11))
        )
    )
    assert (out == img).all()
    out, _ = V.decode_webp(
        V.encode_vp8l(
            img, 3,
            transforms=(("predictor", 3, 12), ("color", 2, (9, 8, 7)),
                        "subtract_green"),
        )
    )
    assert (out == img).all()
    vals = rng.integers(0, 256, size=(5, 3))
    pimg = vals[rng.integers(0, 5, size=(9, 17))].astype(np.uint8)
    out, _ = V.decode_webp(
        V.encode_vp8l(pimg, 2, transforms=("palette",), meta_spec=(3, 2))
    )
    assert (out == pimg).all()


def test_vp8l_contract_rotates_wire_variants():
    """The synthesis contract rotates doc_id % 5 through all five wire
    shapes; every variant must decode to the same closed-form pixels
    (this is what makes the single oracle certify the full feature
    set)."""
    for did in (10, 11, 12, 13, 14, 95, 96, 97, 98, 99):
        px, cb = V.decode_webp(V.encode_webp_payload(did))
        assert cb == 1 + did % 6
        assert (px == M._image_pixels_tiled(did)).all(), did


# ---------------------------------------------------------------------------
# TIFF (baseline: II/MM byte orders, uncompressed/PackBits)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "doc_id", [0, 1, 2, 3, 4, 5, 6, 7, 12, 90, 101, 4999]
)
def test_tiff_round_trip(doc_id):
    """Multi-strip assembly across all eight synthesis variants
    (doc_id % 8: II/MM x none/PackBits/LZW+Pred2/deflate+Pred2):
    RowsPerStrip rotates 1..3, so strip boundaries move per doc and
    the offset/count arrays are real; compressed strips must
    re-expand (and un-difference) bit-exact."""
    px, n_strips, byte_order, compression = M.decode_tiff(
        M.encode_tiff_payload(doc_id)
    )
    assert (px == M._image_pixels(doc_id)).all()
    w, h = M._image_dims(doc_id)
    rps = 1 + doc_id % 3
    assert n_strips == (h + rps - 1) // rps
    assert byte_order == ("II" if doc_id % 2 == 0 else "MM")
    v = doc_id % 8
    assert compression == {2: 32773, 3: 32773, 4: 5, 5: 5,
                           6: 8, 7: 8}.get(v, 1)


def test_tiff_lzw_round_trip_and_widths():
    """MSB-first packing, early change through every code width, and
    a table-full Clear: a 50 kB structured stream forces the table
    past 9->10->11->12 bits and a reset."""
    data = bytes((i * 7 + (i // 3)) % 256 for i in range(50000))
    enc = M.tiff_lzw_encode(data)
    assert M.tiff_lzw_decode(enc, len(data)) == data
    import random

    rng = random.Random(1)
    for trial in range(60):
        n = rng.randrange(0, 2000)
        style = trial % 3
        if style == 0:
            d = bytes(rng.randrange(256) for _ in range(n))
        elif style == 1:
            d = bytes(rng.choice((0, 1, 2, 255)) for _ in range(n))
        else:
            d = (b"abcab" * (n // 5 + 1))[:n]
        assert M.tiff_lzw_decode(M.tiff_lzw_encode(d), n) == d
    with pytest.raises(ValueError, match="LZW"):
        M.tiff_lzw_decode(b"", 4)  # no EOI
    with pytest.raises(ValueError, match="LZW"):
        # first code after clear must be a literal: 9-bit stream
        # Clear(256)=100000000, then 258 -> invalid
        M.tiff_lzw_decode(bytes([0b10000000, 0b01000000, 0b10000000]), 4)


def test_tiff_lzw_late_change_round_trip_and_divergence():
    """Both wild width-change conventions round-trip with the matching
    decoder setting, the two encoders genuinely diverge once the table
    crosses a width boundary (the off-by-one the JDK vector exposed —
    tests/test_external_vectors.py), and cross-convention decode fails
    loudly or wrongly rather than silently agreeing."""
    import random

    rng = random.Random(13)
    for trial in range(20):
        n = rng.randrange(0, 2500)
        d = bytes(rng.randrange(256) for _ in range(n))
        early = M.tiff_lzw_encode(d, early_change=True)
        late = M.tiff_lzw_encode(d, early_change=False)
        assert M.tiff_lzw_decode(early, n, early_change=True) == d
        assert M.tiff_lzw_decode(late, n, early_change=False) == d
        # random bytes add ~1 table entry per ~2 input bytes, so 2 kB
        # guarantees the 9->10 boundary where the conventions differ
        if n >= 2048:
            assert early != late
            try:
                wrong = M.tiff_lzw_decode(late, n, early_change=True)
                assert wrong != d
            except ValueError:
                pass
    # a 50 kB structured stream walks every width AND the table-full
    # Clear under the late convention too
    data = bytes((i * 7 + (i // 3)) % 256 for i in range(50000))
    enc = M.tiff_lzw_encode(data, early_change=False)
    assert M.tiff_lzw_decode(enc, len(data), early_change=False) == data


def test_tiff_predictor_round_trip():
    import numpy as np

    rng = np.random.default_rng(8)
    for w in (1, 2, 5, 16):
        for rows in (1, 3):
            strip = rng.integers(0, 256, size=rows * w * 3,
                                 dtype=np.uint8).tobytes()
            assert M._tiff_unpredict2(
                M._tiff_predict2(strip, w), w
            ) == strip


def test_packbits_round_trip_and_bounds():
    import random

    rng = random.Random(7)
    for _ in range(50):
        n = rng.randrange(0, 400)
        # runs + literals mixed: low-cardinality bytes make real runs
        data = bytes(rng.choice((0, 0, 0, 1, 2, 255)) for _ in range(n))
        enc = M.packbits_encode(data)
        assert M.packbits_decode(enc, n) == data
    # a 300-byte run must use maximal 128-repeat records
    run = b"\x42" * 300
    enc = M.packbits_encode(run)
    assert len(enc) <= 6 and M.packbits_decode(enc, 300) == run
    with pytest.raises(ValueError, match="PackBits"):
        M.packbits_decode(b"\x05ab", 6)  # literal run past end
    with pytest.raises(ValueError, match="PackBits"):
        M.packbits_decode(b"\x81", 4)  # repeat run missing byte


def test_tiff_rejects_and_gates():
    payload = bytearray(M.encode_tiff_payload(8))  # II, uncompressed
    with pytest.raises(ValueError, match="bad header"):
        M.decode_tiff(b"XX" + bytes(payload[2:]))
    # Compression tag (259, inline SHORT) patched to deflate(8) -> gate.
    import struct as _st

    (n_tags,) = _st.unpack_from("<H", payload, 8)
    for i in range(n_tags):
        off = 10 + i * 12
        tag, typ, cnt, _val = _st.unpack_from("<HHII", payload, off)
        if tag == 259:
            _st.pack_into("<HHIHH", payload, off, tag, typ, cnt, 7, 0)
    with pytest.raises(NotImplementedError, match="codec library"):
        M.decode_tiff(bytes(payload))  # 7 = JPEG-in-TIFF -> loud gate


def test_tiff_mm_inline_shorts_left_justified():
    """The MM pitfall: inline SHORT values live in the HIGH half of
    the 4-byte slot. A decoder that reads them as 32-bit ints sees
    Photometric=131072 instead of 2 and rejects every MM file — so a
    correct decode of an MM stream pins the layout."""
    import struct as _st

    payload = M.encode_tiff_payload(1)  # MM, uncompressed
    assert payload[:2] == b"MM"
    (n_tags,) = _st.unpack_from(">H", payload, 8)
    seen = {}
    for i in range(n_tags):
        off = 10 + i * 12
        tag, typ, cnt = _st.unpack_from(">HHI", payload, off)
        if tag in (259, 262, 277):
            seen[tag] = _st.unpack_from(">H", payload, off + 8)[0]
    assert seen == {259: 1, 262: 2, 277: 3}


# ---------------------------------------------------------------------------
# GIF (LZW)
# ---------------------------------------------------------------------------

import duckdb_redis_olap_scanner_spark.operators.gif as GI


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 12, 90, 4999])
def test_gif_round_trip(doc_id):
    """Bit-exact pixels through the LZW coder; even docs are 4-pass
    interlaced."""
    px, table_n, inter = GI.decode_gif(GI.encode_gif_payload(doc_id))
    assert inter == (doc_id % 2 == 0)
    assert (px == M._image_pixels(doc_id)).all()
    w, h = M._image_dims(doc_id)
    assert table_n == 1 << max(1, (w * h - 1).bit_length())


def test_gif_lzw_width_growth_and_dict_cap():
    """Images large enough to push code widths through 9..12 bits and
    hit the 4096-entry dictionary freeze must round-trip in both
    interlace modes."""
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 256, size=(256, 3))
    big = vals[rng.integers(0, 256, size=(80, 80))].astype(np.uint8)
    for inter in (False, True):
        px, table_n, _ = GI.decode_gif(GI.gif_from_array(big, interlace=inter))
        assert (px == big).all()
        assert table_n == 256


def test_gif_skips_89a_extensions():
    """A graphic-control extension block before the image descriptor
    (the common 89a layout) must be sub-block-skipped."""
    payload = bytearray(GI.encode_gif_payload(5))
    payload[:6] = b"GIF89a"
    table_n = 2 << (payload[10] & 0x07)
    desc = 13 + table_n * 3  # image descriptor offset
    assert payload[desc] == 0x2C
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    patched = bytes(payload[:desc]) + gce + bytes(payload[desc:])
    px, _tn, _i = GI.decode_gif(patched)
    assert (px == M._image_pixels(5)).all()


def test_gif_rejects_malformed():
    with pytest.raises(ValueError, match="signature"):
        GI.decode_gif(b"NOTGIF" + b"\x00" * 20)
    payload = bytearray(GI.encode_gif_payload(7))
    with pytest.raises(ValueError, match="truncated|missing|invalid"):
        GI.decode_gif(bytes(payload[:20]))


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 6, 13, 90, 4999])
def test_jpeg_lossless_round_trip(doc_id):
    """Bit-exact pixels through all seven T.81 predictors (doc_id % 7
    rotates the scan's Ss selector) and the edge-prediction rules."""
    import duckdb_redis_olap_scanner_spark.operators.jpeg as J

    px, st = J.decode_jpeg(J.encode_jpeg_lossless_payload(doc_id))
    assert st["mode"] == "lossless"
    assert st["predictor"] == 1 + doc_id % 7
    assert (px == M._image_pixels(doc_id)).all()


def test_jpeg_lossless_rejects_malformed():
    import duckdb_redis_olap_scanner_spark.operators.jpeg as J

    payload = bytearray(J.encode_jpeg_lossless_payload(3))
    # Ss (predictor selector) is the 3rd-from-last SOS header byte.
    sos = payload.find(b"\xff\xda")
    ln = struct.unpack_from(">H", payload, sos + 2)[0]
    ss_at = sos + 2 + ln - 3
    good = payload[ss_at]
    payload[ss_at] = 0
    with pytest.raises(ValueError, match="predictor"):
        J.decode_jpeg(bytes(payload))
    payload[ss_at] = good
    # Point transform (Al) nonzero -> loud gate.
    payload[ss_at + 2] = 1
    with pytest.raises(NotImplementedError, match="point transform"):
        J.decode_jpeg(bytes(payload))


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 11, 17, 123, 4999])
def test_jpeg_progressive_matches_baseline(doc_id):
    """The ten-scan progressive stream must reassemble to the exact
    coefficients (and pixels) of the one-scan baseline stream."""
    _pb, sb = J.decode_jpeg(J.encode_jpeg_payload(doc_id, "444"))
    pp, sp = J.decode_jpeg(J.encode_jpeg_payload(doc_id, "prog"))
    assert sp == sb
    assert (pp == J.decode_jpeg(J.encode_jpeg_payload(doc_id, "444"))[0]).all()


def test_jpeg_progressive_refinement_zrl_and_eobrun():
    """Force the hard refinement paths: a newly-significant coefficient
    past >16 zero-history positions (refinement ZRL with positionally-
    consumed correction bits) and multi-block EOB runs, via a crafted
    coefficient synthesis."""
    real_synth = J.synth_block_coefs

    def crafted(doc_id, b, c):
        if b == 0 and c == 0:
            # |v|>=2 coefs at 1 and 3 (correction bits), then a
            # magnitude-1 at z=40: >16 zero-history gaps -> ZRL in the
            # refinement scan with interleaved correction bits
            return {0: 5, 1: 4, 3: -6, 40: 1}
        if c == 0:
            return {0: -3}  # AC-empty luma blocks -> EOB runs
        return {0: 2, 2: 1}
    J.synth_block_coefs = crafted
    try:
        doc_id = 5  # 24x16 -> 6 MCUs: EOBRUN spans >1 block
        _pb, sb = J.decode_jpeg(J.encode_jpeg_payload(doc_id, "444"))
        _pp, sp = J.decode_jpeg(J.encode_jpeg_payload(doc_id, "prog"))
        assert sp == sb
        assert sb["sum_ac"] != 0
    finally:
        J.synth_block_coefs = real_synth


def test_jpeg_progressive_routes_natively():
    """decode_image must decode SOF2 streams without the Pillow gate."""
    px = M.decode_image(J.encode_jpeg_payload(7, "prog"))
    assert px.shape == (8 * (1 + 7 % 2), 8 * (1 + 7 % 3), 3)


# ---------------------------------------------------------------------------
# Corruption robustness: mutated payloads must raise (ValueError /
# NotImplementedError), never hang or crash the worker process.
# ---------------------------------------------------------------------------


def _mutations(payload: bytes, seed: int):
    """Deterministic truncations and bit flips."""
    import random

    rng = random.Random(seed)
    for _ in range(40):
        kind = rng.randrange(3)
        if kind == 0 and len(payload) > 4:
            yield payload[: rng.randrange(4, len(payload))]
        elif kind == 1:
            i = rng.randrange(len(payload))
            b = bytearray(payload)
            b[i] ^= 1 << rng.randrange(8)
            yield bytes(b)
        else:
            i = rng.randrange(len(payload))
            b = bytearray(payload)
            b[i] = rng.randrange(256)
            yield bytes(b)


@pytest.mark.parametrize(
    "encode,decode,seed,strict",
    [
        (lambda d: FL.encode_flac_payload(d), FL.decode_flac, 101, True),
        (lambda d: V.encode_webp_payload(d), V.decode_webp, 202, True),
        (lambda d: J.encode_jpeg_payload(d, "prog"), J.decode_jpeg, 303,
         True),
        (lambda d: J.encode_jpeg_payload(d, "444"), J.decode_jpeg, 304,
         True),
        (lambda d: M.encode_png_payload(d), M.decode_png, 405, True),
        (lambda d: M.png_from_array(M._image_pixels(d), adam7=True),
         M.decode_png, 406, True),
        (lambda d: J.encode_jpeg_lossless_payload(d), J.decode_jpeg, 507,
         True),
        (lambda d: M.encode_wav_adpcm_stereo_payload(d), M.decode_wav,
         608, True),
        # GIF carries NO integrity checks by design (no CRCs), so most
        # flips decode to wrong-but-well-formed pixels; the bar there
        # is never-hang plus structural validation firing at all.
        (lambda d: GI.encode_gif_payload(d), GI.decode_gif, 709, False),
        # TIFF is also integrity-check-free (no CRCs): never-hang +
        # structural validation firing is the bar.
        (lambda d: M.encode_tiff_payload(d), M.decode_tiff, 810, False),
        # force the LZW+predictor variant (8d+4 ≡ 4 mod 8)
        (lambda d: M.encode_tiff_payload(8 * d + 4), M.decode_tiff, 811,
         False),
        # deflate variant: zlib's adler32 detects most flips -> strict
        (lambda d: M.encode_tiff_payload(8 * d + 6), M.decode_tiff, 812,
         False),
    ],
    ids=["flac", "vp8l", "jpeg-prog", "jpeg-444", "png", "png-adam7",
         "jpeg-lossless", "adpcm-stereo", "gif", "tiff", "tiff-lzw",
         "tiff-deflate"],
)
def test_codec_corruption_never_hangs(encode, decode, seed, strict):
    ok = bad = 0
    for doc_id in (3, 7):
        payload = encode(doc_id)
        for mut in _mutations(payload, seed + doc_id):
            try:
                decode(mut)
                ok += 1  # flip landed somewhere harmless — fine
            except (ValueError, NotImplementedError, struct.error):
                bad += 1
    # most mutations must be DETECTED (CRCs / marker checks), proving
    # the validation paths run; a few may land in don't-care bytes
    if strict:
        assert bad > ok
    else:
        assert bad > 0


# ---------------------------------------------------------------------------
# Review fixes (r9): unknown FLAC totals, reserved codes, fill bytes,
# WebP Pillow fallthrough
# ---------------------------------------------------------------------------


def test_flac_unknown_total_samples_decodes_all_frames():
    """STREAMINFO total-samples == 0 means UNKNOWN (streaming
    encoders); the decoder must consume frames to end-of-payload, not
    return zero samples."""
    doc_id = 9
    buf = bytearray(FL.encode_flac_payload(doc_id))
    si = 8  # fLaC + 4-byte block header
    # total(36) spans bits 108..143 of STREAMINFO: low nibble of
    # byte 13 + bytes 14..17
    buf[si + 13] &= 0xF0
    for i in range(14, 18):
        buf[si + i] = 0
    ch, sr, bits, samples = FL.decode_flac(bytes(buf))
    n = 24 + doc_id % 41
    assert len(samples) == n * (1 + doc_id % 2)
    assert list(samples) == list(FL._flac_samples(doc_id))


def test_flac_reserved_sample_size_code_raises_value_error():
    si = FL._BitWriter()
    si.write(8, 16); si.write(8, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(15, 5); si.write(8, 36)
    for _ in range(16):
        si.write(0, 8)
    out = bytearray(b"fLaC") + struct.pack(">I", (1 << 31) | 34)
    out += si.getvalue()
    bw = FL._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0110, 4)   # 8-bit blocksize at end
    bw.write(0b0100, 4)   # sr 8000
    bw.write(0, 4)        # mono
    bw.write(0b011, 3)    # RESERVED sample size
    bw.write(0, 1)
    bw.write(0, 8)        # frame number 0
    bw.write(7, 8)        # blocksize-1
    header = bw.getvalue()
    bw.write(FL.crc8(header), 8)
    bw.align()
    frame = bw.getvalue()
    out += frame + struct.pack(">H", FL.crc16(frame))
    with pytest.raises(ValueError, match="reserved sample-size"):
        FL.decode_flac(bytes(out))


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker."""
    payload = bytearray(J.encode_jpeg_payload(3))
    _px, st = J.decode_jpeg(bytes(payload))
    sof = payload.find(b"\xff\xc0")
    padded = bytes(payload[:sof]) + b"\xff\xff\xff" + bytes(payload[sof:])
    _px2, st2 = J.decode_jpeg(padded)
    assert st2 == st


def test_webp_unsupported_features_fall_to_pillow_gate():
    """decode_image must route VP8L NotImplementedError features into
    the Pillow fallthrough (gate message when Pillow is absent), not
    propagate them raw."""
    if M._try_import_pillow() is not None:
        pytest.skip("Pillow installed: fallthrough decodes instead")
    lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 0) + b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="codec-library"):
        M.decode_image(lossy)
