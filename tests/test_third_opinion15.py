"""Third-opinion audit, batch 15 (r17): the multimodal FEATURE and
STUB entries — media math on decoded arrays and payload plumbing.

Each entry's full Spark output at SF_DIR is re-derived row-for-row
with plain python loops over the synthesis closed forms (pixels
v_k = (d*7+k)%256 at w=4+d%13, h=2+d%7; PCM16 s_i =
((d*11+i*97)%65536)-32768 at ch=1+d%2, sr=8000+(d%3)*4000, f=16+d%17)
or, for the payload stubs, over the documents parquet read with
pandas — no Spark expressions, no DuckDB, no product helpers. The
closed forms themselves were independently proven to BE the decoded
content by the batch-13 codec audits, so these audits compose:
independent codecs x independent feature math.

Entries audited here: multimodal_image_features,
multimodal_resize_nearest, multimodal_flip_augment,
multimodal_audio_energy, multimodal_audio_resample,
multimodal_decode_stub, multimodal_resize_stub,
multimodal_frame_sample.
"""

from __future__ import annotations

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401

    return catalog.registry()


@pytest.fixture(scope="module")
def doc_texts() -> dict[int, str]:
    pdf = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    return {int(r.doc_id): r.text for r in pdf.itertuples(index=False)}


def ref_image(d: int) -> tuple[int, int, list[int]]:
    w, h = 4 + d % 13, 2 + d % 7
    return w, h, [(d * 7 + k) % 256 for k in range(w * h * 3)]


def ref_pcm16_ch0(d: int) -> tuple[int, int, list[int]]:
    """(sample_rate, n_frames, channel-0 samples)."""
    ch, sr, f = 1 + d % 2, 8000 + (d % 3) * 4000, 16 + d % 17
    return sr, f, [
        ((d * 11 + (j * ch) * 97) % 65536) - 32768 for j in range(f)
    ]


def _weighted(xs: list[int]) -> int:
    return sum((i + 1) * v for i, v in enumerate(xs))


def _rows(reg, spark, name: str) -> dict[int, tuple]:
    out = {}
    for r in reg[name].fn(spark, SF_DIR).collect():
        out[int(r[0])] = tuple(r)
    return out


def test_image_features_rows(reg, spark, doc_texts):
    """BT.601 integer grayscale + truncating 2x2 average pool,
    re-derived with nested loops (no numpy strides)."""
    rows = _rows(reg, spark, "multimodal_image_features")
    assert set(rows) == set(doc_texts)
    for d in rows:
        w, h, v = ref_image(d)
        gray = [
            [
                (299 * v[3 * (y * w + x)]
                 + 587 * v[3 * (y * w + x) + 1]
                 + 114 * v[3 * (y * w + x) + 2]) // 1000
                for x in range(w)
            ]
            for y in range(h)
        ]
        pw, ph = w // 2, h // 2
        pooled = [
            (gray[2 * py][2 * px_] + gray[2 * py][2 * px_ + 1]
             + gray[2 * py + 1][2 * px_] + gray[2 * py + 1][2 * px_ + 1]) // 4
            for py in range(ph)
            for px_ in range(pw)
        ]
        want = (
            d, pw, ph,
            sum(sum(row) for row in gray),
            sum(pooled), _weighted(pooled),
        )
        assert rows[d] == want, f"doc {d}"


def test_resize_nearest_rows(reg, spark, doc_texts):
    """Nearest-neighbor 3x2 downscale: dst (x, y) samples source
    (x*w//3, y*h//2), top-left convention."""
    rows = _rows(reg, spark, "multimodal_resize_nearest")
    assert set(rows) == set(doc_texts)
    for d in rows:
        w, h, v = ref_image(d)
        small = [
            v[3 * ((y * h // 2) * w + (x * w // 3)) + c]
            for y in range(2)
            for x in range(3)
            for c in range(3)
        ]
        want = (d, w, h, 3, 2, sum(small), _weighted(small))
        assert rows[d] == want, f"doc {d}"


def test_flip_augment_rows(reg, spark, doc_texts):
    """Horizontal mirror: out[y][x] = in[y][w-1-x]; the checksum is
    over the FLIPPED flat order and the sum must be flip-invariant."""
    rows = _rows(reg, spark, "multimodal_flip_augment")
    assert set(rows) == set(doc_texts)
    for d in rows:
        w, h, v = ref_image(d)
        flipped = [
            v[3 * (y * w + (w - 1 - x)) + c]
            for y in range(h)
            for x in range(w)
            for c in range(3)
        ]
        want = (d, w, h, _weighted(flipped), True)
        assert rows[d] == want, f"doc {d}"
        assert sum(flipped) == sum(v)  # the invariant the entry asserts


def test_audio_energy_rows(reg, spark, doc_texts):
    """Short-time energy: window 8, hop 4, full windows only, over
    |channel-0|."""
    rows = _rows(reg, spark, "multimodal_audio_energy")
    assert set(rows) == set(doc_texts)
    for d in rows:
        _sr, f, s0 = ref_pcm16_ch0(d)
        a = [abs(x) for x in s0]
        nw = (f - 8) // 4 + 1 if f >= 8 else 0
        energies = [sum(a[j * 4 : j * 4 + 8]) for j in range(nw)]
        want = (d, f, nw, sum(a), _weighted(energies))
        assert rows[d] == want, f"doc {d}"


def test_audio_resample_rows(reg, spark, doc_texts):
    """Decimation by 2 over channel 0 (keep samples 0, 2, 4, ...)."""
    rows = _rows(reg, spark, "multimodal_audio_resample")
    assert set(rows) == set(doc_texts)
    for d in rows:
        sr, _f, s0 = ref_pcm16_ch0(d)
        out = s0[::2]
        want = (d, sr // 2, len(out), sum(out), _weighted(out))
        assert rows[d] == want, f"doc {d}"


def test_decode_stub_rows(reg, spark, doc_texts):
    rows = _rows(reg, spark, "multimodal_decode_stub")
    assert set(rows) == set(doc_texts)
    for d, text in doc_texts.items():
        n = len(text.encode("utf-8"))
        assert rows[d] == (d, n, n % 640, (n * 7) % 480, "image-stub")


def test_resize_stub_rows(reg, spark, doc_texts):
    rows = _rows(reg, spark, "multimodal_resize_stub")
    assert set(rows) == set(doc_texts)
    for d, text in doc_texts.items():
        n = len(text.encode("utf-8"))
        assert rows[d] == (d, n, 64, 48, min(n, 64 * 48), "image-stub")


def test_frame_sample_rows(reg, spark, doc_texts):
    """256-byte framing, every 4th frame — multi-row fan-out per doc,
    compared as a whole row multiset."""
    got = sorted(
        tuple(r)
        for r in reg["multimodal_frame_sample"].fn(spark, SF_DIR).collect()
    )
    want = []
    for d, text in doc_texts.items():
        n = len(text.encode("utf-8"))
        nframes = -(-n // 256)
        for i in range(0, nframes, 4):
            want.append((d, i, i * 256, min(256, n - i * 256)))
    assert got == sorted(want)
    assert len(got) > len(doc_texts) // 2  # genuine fan-out happened
