"""Tests for the QUEUED r20 wide-edit bundle (prepared in r19 on
branch ``r20-catalog-bundle``; see COVERAGE.md "Round 19").

The bundle holds every deferred ADVICE fix that would re-dirty
verified catalog entries, so they land as ONE commit and the 224-entry
re-gate is paid once (VERDICT r18 task 4):

1. catalog.py — ``_insert_cache_row`` must not hold ``_CACHE_LOCK``
   through the eviction sweep's ``unpersist`` py4j round trips
   (r17 ADVICE; the nested ``_touch_session`` call runs its unpersist
   loop while the caller still holds the RLock).
2. catalog.py — the eviction warning is a once-per-process latch; it
   must warn once per EVICTED SESSION KEY so a driver that raises the
   cap and still thrashes keeps hearing about it (r17 ADVICE).
3. ann_index.py — a SINGLE-page paged-probe result is its own page, so
   registering ``[out]`` under ``id(out)`` strongly pins the result
   forever and the weakref.finalize can never fire (r18 ADVICE).
4. multimodal.py — ``decode_avi_mjpeg`` must take the handler from the
   FIRST 'vids' strh (not the last strh of any stream) and collect
   only '00dc' chunks, so a conforming AVI with a trailing audio
   stream decodes instead of being rejected (r18 ADVICE).
5. multimodal.py — strh dwScale/dwRate are reversed in both AVI
   encoders: (dwScale=30, dwRate=1) declares 1/30 fps, contradicting
   avih dwMicroSecPerFrame=33333 (r18 ADVICE).

Each fix GROUP skips on its own observable behavior — not a single
shared attribute name — so a renamed helper or a partial landing can
never silently skip the whole file forever (r19 ADVICE). A canary
test (never skipped) additionally pins that the three probes agree:
all landed or none.
"""

from __future__ import annotations

import gc
import struct
import threading
import weakref

import pytest

from duckdb_redis_olap_scanner_spark.operators import ann_index as AI
from duckdb_redis_olap_scanner_spark.operators import multimodal as MM
from duckdb_redis_olap_scanner_spark.plans import catalog


class _Collectable:
    """weakref-able stand-in for a page/result DataFrame."""


def _catalog_fixes_landed() -> bool:
    """Fixes 1+2 land together in catalog.py; the latch fix turns
    ``_WARNED_EVICTION`` from a process-wide bool into a per-key set —
    an observable independent of any helper's name."""
    return isinstance(getattr(catalog, "_WARNED_EVICTION", None), set)


def _ann_fix_landed() -> bool:
    """Fix 3, probed behaviorally: pre-fix, registering a single-page
    result pins it strongly (the entry IS ``[out]``), so the weakref
    survives; post-fix the slot is weak and the finalize pops the
    entry. No release call — release would drop the strong ref and
    make the pre-fix state look fixed."""
    out = _Collectable()
    AI._register_paged_result(out, [out])
    ref = weakref.ref(out)
    del out
    gc.collect()
    return ref() is None


def _multimodal_fixes_landed() -> bool:
    """Fixes 4+5 land together in multimodal.py; the strh rate fix
    (dwScale=1, dwRate=30) is directly observable in a fresh encode."""
    payload = MM.encode_avi_mjpeg_payload(0)
    at = payload.index(b"strh") + 8
    return struct.unpack_from("<II", payload, at + 20) == (1, 30)


_CATALOG_LANDED = _catalog_fixes_landed()
_ANN_LANDED = _ann_fix_landed()
_MM_LANDED = _multimodal_fixes_landed()

_SKIP_REASON = (
    "r20 catalog bundle not landed yet (queued on branch "
    "r20-catalog-bundle to pay the 224-entry re-gate once; "
    "COVERAGE.md r19)"
)
skip_unless_catalog = pytest.mark.skipif(not _CATALOG_LANDED, reason=_SKIP_REASON)
skip_unless_ann = pytest.mark.skipif(not _ANN_LANDED, reason=_SKIP_REASON)
skip_unless_mm = pytest.mark.skipif(not _MM_LANDED, reason=_SKIP_REASON)


def test_bundle_probes_agree():
    """Canary — never skipped. The bundle is ONE commit; a state where
    some fix probes read landed and others do not means a partial or
    renamed landing, and must be loud, not silently skipped."""
    states = {
        "catalog": _CATALOG_LANDED,
        "ann_index": _ANN_LANDED,
        "multimodal": _MM_LANDED,
    }
    assert len(set(states.values())) == 1, (
        f"partial bundle landing detected: {states}"
    )


class _StubDF:
    """Duck-typed stand-in for a cached DataFrame: its unpersist()
    probes — from ANOTHER thread, so RLock reentrancy can't lie —
    whether _CACHE_LOCK is free while the sweep releases storage."""

    def __init__(self, sink: dict):
        self._sink = sink

    def unpersist(self):
        got = {}

        def probe():
            ok = catalog._CACHE_LOCK.acquire(timeout=5)
            got["ok"] = ok
            if ok:
                catalog._CACHE_LOCK.release()

        t = threading.Thread(target=probe)
        t.start()
        t.join()
        self._sink.setdefault("probes", []).append(got.get("ok", False))


def _churn_keys(prefix: str, n: int, memo: dict, sink: dict) -> None:
    for i in range(n):
        catalog._insert_cache_row(memo, (f"{prefix}-{i}", "sf"), _StubDF(sink))


@skip_unless_catalog
def test_insert_cache_row_unpersists_outside_lock():
    """Evictions triggered THROUGH _insert_cache_row must run their
    unpersist round trips with _CACHE_LOCK released: a py4j call under
    the global lock stalls every catalog call in every session."""
    sink: dict = {}
    memo: dict = {}
    catalog._ALL_MEMOS.append(memo)
    try:
        # One sweepable victim row, then enough fresh keys through the
        # _insert_cache_row path to evict it (and then some).
        catalog._insert_cache_row(memo, ("bundle-victim", "sf"), _StubDF(sink))
        _churn_keys("bundle-churn", catalog._MAX_CACHED_SESSIONS + 2, memo, sink)
        assert sink.get("probes"), "churn never evicted the victim row"
        assert all(sink["probes"]), (
            "unpersist ran while _CACHE_LOCK was held: the sweep must "
            "collect doomed frames under the lock and release them after"
        )
    finally:
        catalog._ALL_MEMOS.remove(memo)


@skip_unless_catalog
def test_eviction_warns_per_evicted_key(caplog):
    """Two distinct evicted session keys → two warnings, each naming
    its key. The old once-per-process latch went silent after the
    first eviction for the life of the driver."""
    sink: dict = {}
    memo: dict = {}
    catalog._ALL_MEMOS.append(memo)
    try:
        with caplog.at_level("WARNING", logger=catalog.__name__):
            catalog._insert_cache_row(memo, ("bundle-warn-a", "sf"), _StubDF(sink))
            catalog._insert_cache_row(memo, ("bundle-warn-b", "sf"), _StubDF(sink))
            _churn_keys(
                "bundle-warn-churn",
                catalog._MAX_CACHED_SESSIONS + 2,
                memo,
                sink,
            )
        warned = [r.getMessage() for r in caplog.records]
        assert any("bundle-warn-a" in m for m in warned)
        assert any("bundle-warn-b" in m for m in warned)
        # and re-evicting the SAME key does not spam
        with caplog.at_level("WARNING", logger=catalog.__name__):
            caplog.clear()
            catalog._insert_cache_row(memo, ("bundle-warn-a", "sf"), _StubDF(sink))
            _churn_keys(
                "bundle-warn-churn2",
                catalog._MAX_CACHED_SESSIONS + 2,
                memo,
                sink,
            )
        again = [r.getMessage() for r in caplog.records]
        assert not any("bundle-warn-a" in m for m in again)
    finally:
        catalog._ALL_MEMOS.remove(memo)


@skip_unless_ann
def test_single_page_result_is_not_pinned_by_registry():
    """Single-page shape: pages == [out]. The registry entry must not
    hold OUT strongly — before the fix _PAGED_RESULT_PAGES[id(out)]
    was [out] itself, so the finalize never fired and the handle (and
    its checkpoint blocks' Python-side handle) was pinned for the
    session."""
    out = _Collectable()
    AI._register_paged_result(out, [out])
    key = id(out)
    ref = weakref.ref(out)
    del out
    gc.collect()
    assert ref() is None, "registry pinned the single-page result"
    assert key not in AI._PAGED_RESULT_PAGES


@skip_unless_ann
def test_multi_page_registration_still_releases_and_finalizes():
    """Multi-page behavior is unchanged: pages are held until the
    result handle dies (release needs them), then the finalize drops
    the entry."""
    pages = [_Collectable(), _Collectable()]
    out = _Collectable()
    AI._register_paged_result(out, pages)
    key = id(out)
    assert key in AI._PAGED_RESULT_PAGES
    page_ref = weakref.ref(pages[0])
    del pages
    gc.collect()
    # pages survive while the result handle lives — release depends on it
    assert page_ref() is not None
    del out
    gc.collect()
    assert key not in AI._PAGED_RESULT_PAGES
    gc.collect()
    assert page_ref() is None


@skip_unless_ann
def test_release_resolves_single_page_weakref():
    """release_paged_result on a live single-page result must still
    find the page through the weak slot (and pop the entry). The stub
    has no JVM plan, so the unpersist attempt is swallowed by the
    plan-shape guard — the contract here is entry resolution, not RDD
    ids."""
    out = _Collectable()
    AI._register_paged_result(out, [out])
    key = id(out)
    assert AI.release_paged_result(out) == []
    assert key not in AI._PAGED_RESULT_PAGES
    # double release: safe no-op
    assert AI.release_paged_result(out) == []


# ---------------------------------------------------------------------------
# multimodal: multi-stream AVI handling + strh rate fields
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    return (
        struct.pack("<4sI", fourcc, len(data))
        + data
        + (b"\x00" if len(data) & 1 else b"")
    )


def _lst(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _mjpeg_avi_with_audio(doc_id: int) -> bytes:
    """The encoder's exact layout plus a SECOND stream: an 'auds' strl
    after the video strl, and one '01wb' audio chunk interleaved in
    movi — the conforming shape the pre-fix decoder rejected (last
    strh won) or mis-fed to the JPEG decoder ('00db' collected)."""
    from duckdb_redis_olap_scanner_spark.operators import jpeg as _jpeg

    w, h, nf = MM._mjpeg_params(doc_id)
    avih = struct.pack("<14I", 33333, 0, 0, 0, nf, 0, 2, 0, w, h, 0, 0, 0, 0)
    strh_v = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, 30, 0, nf, 0, 0, 0, 0, 0, w, h,
    )
    strf_v = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, struct.unpack("<I", b"MJPG")[0], 0, 2835, 2835, 0, 0,
    )
    strh_a = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1, 8000, 0, 8000, 0, 0, 0,
        0, 0, 0, 0,
    )
    strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)  # PCM fmt
    hdrl = _lst(
        b"hdrl",
        _chunk(b"avih", avih)
        + _lst(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
        + _lst(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)),
    )
    movi_chunks = []
    for f in range(nf):
        movi_chunks.append(
            _chunk(
                b"00dc",
                _jpeg.encode_jpeg_payload(doc_id + MM.AVI_MJPEG_JID_STRIDE * f),
            )
        )
        movi_chunks.append(_chunk(b"01wb", bytes(16)))  # interleaved audio
    movi = _lst(b"movi", b"".join(movi_chunks))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


@skip_unless_mm
def test_decode_avi_mjpeg_tolerates_trailing_audio_stream():
    """A second (audio) strl must not overwrite the video handler, and
    '01wb' / stream-0 raw chunks must not reach the JPEG decoder: the
    two-stream file decodes to EXACTLY the single-stream stats."""
    doc_id = 7
    want = MM.decode_avi_mjpeg(MM.encode_avi_mjpeg_payload(doc_id))
    got = MM.decode_avi_mjpeg(_mjpeg_avi_with_audio(doc_id))
    assert got == want


@skip_unless_mm
def test_decode_avi_mjpeg_ignores_raw_dib_chunks():
    """'00db' (stream-0 UNCOMPRESSED) chunks are not MJPEG frames; a
    stray one must not be fed to the JPEG decoder. With the fix the
    frame count check still sees exactly avih dwTotalFrames '00dc'
    frames."""
    payload = MM.encode_avi_mjpeg_payload(3)
    # splice a '00db' junk chunk at the very end of movi: grow the
    # RIFF, LIST(movi) sizes by its full footprint
    junk = _chunk(b"00db", b"\x00" * 10)
    movi_at = payload.index(b"LIST", 12)
    while payload[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = payload.index(b"LIST", movi_at + 1)
    riff_size = struct.unpack_from("<I", payload, 4)[0] + len(junk)
    movi_size = struct.unpack_from("<I", payload, movi_at + 4)[0] + len(junk)
    out = bytearray(payload) + junk
    struct.pack_into("<I", out, 4, riff_size)
    struct.pack_into("<I", out, movi_at + 4, movi_size)
    want = MM.decode_avi_mjpeg(payload)
    assert MM.decode_avi_mjpeg(bytes(out)) == want


@skip_unless_mm
@pytest.mark.parametrize(
    "encode", [MM.encode_avi_payload, MM.encode_avi_mjpeg_payload]
)
def test_strh_scale_rate_declare_30fps(encode):
    """dwScale=1, dwRate=30 (rate/scale = fps) — consistent with avih
    dwMicroSecPerFrame=33333. The reversed pair declared 1/30 fps to
    external players."""
    payload = encode(5)
    at = payload.index(b"strh") + 8
    scale, rate = struct.unpack_from("<II", payload, at + 20)
    assert (scale, rate) == (1, 30)
