"""Third-opinion audit, batch 30 (r20): ZIP corpus ingest.

The queued ``zip_corpus_ingest`` entry packs with stdlib ``zipfile``
and reads back with the from-scratch walker
(operators/zip_archive.zip_members) — the writer is already
independent, but the ROW the entry emits (member count, raw bytes,
md5s) is computed by product code end to end. This audit re-derives
those rows with NO product helpers: the expected values come straight
from the parquet source columns via pandas + hashlib (not the
entry's SQL oracle, not the walker), and the recovered member bytes
are cross-read with stdlib ``zipfile``'s reader — a second,
independent ZIP implementation.

Entries audited here: zip_corpus_ingest (QUEUED in
plans/queued_entries_r21.py; audited now so a future landing is
purely mechanical).
"""

from __future__ import annotations

import hashlib
import io
import zipfile

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.operators.zip_archive import zip_members

from .conftest import SF_DIR


def ind_expected_rows() -> dict:
    """Entry rows re-derived from the SOURCE columns only — the
    synthesis contract restated (one deflated .txt + one stored .json
    per doc), no product code, no SQL."""
    pdf = pd.read_parquet(
        f"{SF_DIR}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    out = {}
    for did, text, lang, source in pdf.itertuples(index=False):
        raw = ("" if text is None else text).encode("utf-8")
        js = (
            '{"lang": "%s", "source": "%s"}'
            % ("" if lang is None else lang, "" if source is None else source)
        ).encode("utf-8")
        out[int(did)] = (
            2,
            len(raw) + len(js),
            hashlib.md5(raw).hexdigest(),
            hashlib.md5(js).hexdigest(),
        )
    return out


def ind_pack(did: int, raw: bytes, js: bytes) -> bytes:
    """The ingest stage's archive recipe, restated independently."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data, method in (
            (f"{did:09d}.txt", raw, zipfile.ZIP_DEFLATED),
            (f"{did:09d}.json", js, zipfile.ZIP_STORED),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return buf.getvalue()


def test_queued_entry_rows_match_independent_derivation(spark):
    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q

    want = ind_expected_rows()
    got = {
        int(r["doc_id"]): (
            r["n_members"], r["n_raw"], r["txt_md5"], r["json_md5"]
        )
        for r in Q.zip_corpus_ingest(spark, SF_DIR).collect()
    }
    assert got == want


@pytest.mark.parametrize("did,text", [
    (7, "audit me " * 33),
    (8, ""),
    (9, "mixed — ünïcode 日本語"),
])
def test_walker_agrees_with_stdlib_reader(did, text):
    """zip_members vs zipfile.ZipFile on the same archive: member
    names, order, and exact bytes from two independent readers."""
    raw = text.encode("utf-8")
    js = b'{"lang": "xx", "source": "audit"}'
    arc = ind_pack(did, raw, js)
    ours = zip_members(arc)
    with zipfile.ZipFile(io.BytesIO(arc)) as zf:
        theirs = [(i.filename, zf.read(i)) for i in zf.infolist()]
    assert ours == theirs == [
        (f"{did:09d}.txt", raw),
        (f"{did:09d}.json", js),
    ]


def test_audit_has_teeth_member_corruption_detected():
    """Flip one byte of the STORED member's payload: zip_members must
    raise (CRC), and a reader that skipped CRC verification would
    have returned silently different bytes — the md5 column would
    move, so the oracle could not hash-match."""
    raw = b"teeth " * 40
    js = b'{"lang": "xx", "source": "audit"}'
    arc = bytearray(ind_pack(3, raw, js))
    at = bytes(arc).index(js)  # stored member bytes appear verbatim
    arc[at + 5] ^= 0x01
    with pytest.raises(ValueError, match="CRC-32 mismatch"):
        zip_members(bytes(arc))
    assert hashlib.md5(bytes(arc[at : at + len(js)])).hexdigest() != (
        hashlib.md5(js).hexdigest()
    )


def test_audit_has_teeth_member_swap_detected():
    """Swap the two members' recovered roles (different doc's text):
    every md5 in the independent derivation moves — the columns pin
    content, not just structure."""
    a = dict(zip_members(ind_pack(1, b"doc one", b'{"lang": "a", "source": "s"}')))
    b = dict(zip_members(ind_pack(2, b"doc two", b'{"lang": "b", "source": "s"}')))
    assert hashlib.md5(a["000000001.txt"]).hexdigest() != (
        hashlib.md5(b["000000002.txt"]).hexdigest()
    )
