"""Third-opinion audit, batch 24 (r18): MJPEG-in-AVI.

The product's compressed-video path composes its own RIFF walk with
its own T.81 decoder, and the synthesis side writes both — so a
matched container misreading (chunk padding, LIST recursion, avih
field offsets) or a matched JPEG misreading would cancel in the
oracle gate. This audit re-derives the entry's rows with NO product
decode helpers: an independent RIFF chunk walker typed from the
RIFF/AVI spec (own padding and LIST-subtype handling, own avih field
unpacking) feeding the batch-22 independent JPEG entropy decoder
(tests/test_third_opinion22.ind_decode_jpeg — spec-typed, no product
code), with the frame-order weighting and the jid = d + 6f synthesis
contract restated here rather than imported.

Entries audited here: multimodal_decode_avi_mjpeg.
"""

from __future__ import annotations

import struct

import pytest

from duckdb_redis_olap_scanner_spark.operators import multimodal as M
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR
from .test_third_opinion22 import ind_decode_jpeg, ref_coefs, ref_quant

DOC_IDS = list(range(0, 24)) + [97, 101, 211, 509]


def ind_walk_avi(payload: bytes):
    """Independent RIFF walk: returns (avih_fields, strh_handler,
    frame_chunks). Iterative, own padding rule (chunks are word-
    aligned; the pad byte is outside the declared size), own LIST
    handling (4-byte subtype then sub-chunks)."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    avih = None
    handler = None
    frames: list[bytes] = []
    spans = [(12, 8 + struct.unpack_from("<I", payload, 4)[0])]
    while spans:
        pos, end = spans.pop()
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if cid == b"LIST":
                spans.append((body_start + 4, body_start + size))
            elif cid == b"avih":
                avih = struct.unpack_from("<14I", payload, body_start)
            elif cid == b"strh":
                handler = payload[body_start + 4 : body_start + 8]
            elif cid == b"00dc":
                frames.append(payload[body_start : body_start + size])
            pos = body_start + size + (size % 2)
    return avih, handler, frames


def ind_entry_row(payload: bytes) -> tuple:
    """(width, height, n_frames, n_blocks, sum_dc, sum_ac,
    frame_checksum) — derived ONLY from the independent walk + the
    independent JPEG decode."""
    avih, handler, frames = ind_walk_avi(payload)
    assert handler == b"MJPG"
    w, h, nf = avih[8], avih[9], avih[4]
    assert nf == len(frames)
    n_blocks = sum_dc = sum_ac = frame_checksum = 0
    for f, jfif in enumerate(frames):
        mode, _sof, stats, _px = ind_decode_jpeg(bytes(jfif))
        assert mode == "baseline"
        fw, fh, nb3, s_dc, s_ac, ck = stats
        assert (fw, fh) == (w, h)
        n_blocks += nb3
        sum_dc += s_dc
        sum_ac += s_ac
        frame_checksum += (f + 1) * ck
    return (w, h, nf, n_blocks, sum_dc, sum_ac, frame_checksum)


def closed_form_row(d: int) -> tuple:
    """The synthesis contract restated (not imported): frame f is the
    closed-form JFIF for jid = d + 6f; checksum weight inside a frame
    is (b*192 + c*64 + z + 1), across frames (f+1)."""
    w, h, nf = 8 * (1 + d % 3), 8 * (1 + d % 2), 2 + d % 4
    nb = (1 + d % 3) * (1 + d % 2)
    sum_dc = sum_ac = frame_checksum = 0
    for f in range(nf):
        jid = d + 6 * f
        ck = 0
        for b in range(nb):
            for c in range(3):
                q = ref_quant(c)
                for z, v in ref_coefs(jid, b, c).items():
                    dq = v * q[z]
                    if z == 0:
                        sum_dc += dq
                    else:
                        sum_ac += dq
                    ck += (b * 192 + c * 64 + z + 1) * dq
        frame_checksum += (f + 1) * ck
    return (w, h, nf, nf * nb * 3, sum_dc, sum_ac, frame_checksum)


@pytest.mark.parametrize("d", DOC_IDS)
def test_independent_walk_matches_closed_form(d):
    payload = M.encode_avi_mjpeg_payload(d)
    assert ind_entry_row(payload) == closed_form_row(d)


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401

    return catalog.registry()


def test_entry_rows_match_independent_decode(reg, spark):
    rows = {
        int(r[0]): tuple(r)
        for r in reg["multimodal_decode_avi_mjpeg"]
        .fn(spark, SF_DIR).collect()
    }
    assert len(rows) > 0
    for did, row in sorted(rows.items())[:16]:
        payload = M.encode_avi_mjpeg_payload(did)
        assert row == (did, *ind_entry_row(payload)), f"doc {did}"


@pytest.mark.parametrize("d", [3, 8])
def test_audit_has_teeth_corruption_is_detected(d):
    """The independent derivation must reject or differ on a payload
    with one flipped scan byte — a lenient walker that resynchronizes
    silently would defeat the audit."""
    payload = bytearray(M.encode_avi_mjpeg_payload(d))
    clean = ind_entry_row(bytes(payload))
    idx = bytes(payload).rindex(b"\xff\xda") + 16
    assert payload[idx] not in (0x00, 0xFF)
    payload[idx] ^= 0x2A
    try:
        got = ind_entry_row(bytes(payload))
    except Exception:
        return
    assert got != clean
