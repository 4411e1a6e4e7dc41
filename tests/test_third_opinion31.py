"""Third-opinion audit, batch 31 (r20): DEFLATE inflater audit.

The queued ``deflate_corpus_audit`` entry compresses with stdlib zlib
and decodes with the from-scratch inflater — the producer is already
independent, but the ROW the entry emits is computed by product code
end to end. This audit re-derives the rows with NO product helpers
(pandas + hashlib straight off the parquet source, the parity/level
routing restated), and drives the inflater against zlib's own
DECODER over adversarially-shaped payloads — two independent
implementations agreeing bit-for-bit on the same streams, both
directions of the cross-check the entry itself cannot provide.

Entries audited here: deflate_corpus_audit (QUEUED in
plans/queued_entries_r21.py; audited now so a future landing is
purely mechanical).
"""

from __future__ import annotations

import hashlib
import random
import zlib

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.operators.inflate import (
    inflate,
    inflate_zlib,
)

from .conftest import SF_DIR


def ind_expected_rows() -> dict:
    """Entry rows re-derived from the SOURCE column only — the audit
    contract restated (doc_id % 3 → wrapper, md5 over UTF-8 bytes),
    no product code, no SQL."""
    pdf = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    out = {}
    for did, text in pdf.itertuples(index=False):
        raw = ("" if text is None else text).encode("utf-8")
        out[int(did)] = (
            len(raw),
            ("zlib", "raw", "gzip")[did % 3],
            hashlib.md5(raw).hexdigest(),
        )
    return out


def test_queued_entry_rows_match_independent_derivation(spark):
    from duckdb_redis_olap_scanner_spark.plans import queued_entries_r21 as Q

    want = ind_expected_rows()
    got = {
        int(r["doc_id"]): (r["n_raw"], r["wrapper"], r["txt_md5"])
        for r in Q.deflate_corpus_audit(spark, SF_DIR).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_inflater_agrees_with_zlib_decoder(seed):
    """Adversarially-shaped payloads (runs, near-repeats, random
    tails, single bytes) through every level: the from-scratch
    decode must equal zlib.decompress on the identical stream."""
    rng = random.Random(seed)
    chunks = []
    for _ in range(rng.randrange(1, 6)):
        kind = rng.randrange(4)
        if kind == 0:
            chunks.append(bytes([rng.randrange(256)]) * rng.randrange(1, 700))
        elif kind == 1:
            word = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 9)))
            chunks.append(word * rng.randrange(1, 120))
        elif kind == 2:
            chunks.append(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 800))))
        else:
            chunks.append(b"")
    data = b"".join(chunks)
    for level in range(10):
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        stream = co.compress(data) + co.flush()
        assert inflate(stream) == zlib.decompress(stream, -15) == data


def test_audit_has_teeth_bit_flip_cannot_hash_match():
    """Every wrapped-stream bit flip either raises or yields bytes
    whose md5 moves — the entry's md5 column cannot be matched by a
    corrupted decode. The one byte excluded is the final deflate
    byte, whose bits past the end-of-block code are PADDING no
    integrity check covers (flips there are genuinely inert);
    header-byte and Adler-trailer flips stay in scope and must
    raise."""
    data = b"teeth for the inflater audit " * 25
    clean = hashlib.md5(data).hexdigest()
    stream = zlib.compress(data, 9)
    rng = random.Random(99)
    for _ in range(120):
        flip = bytearray(stream)
        pos = rng.randrange(len(flip))
        if pos == len(flip) - 5:
            continue
        flip[pos] ^= 1 << rng.randrange(8)
        try:
            got = inflate_zlib(bytes(flip))
        except ValueError:
            continue
        assert hashlib.md5(got).hexdigest() != clean, pos


def test_audit_has_teeth_wrapper_routing_detected():
    """A decode path that ignored the RFC 1950 wrapper (fed the whole
    zlib stream to the raw inflater) must not silently succeed on a
    realistic stream — the CMF/FLG bytes are not a valid deflate
    block start for zlib's fixed 0x78 CMF."""
    stream = zlib.compress(b"route me " * 40, 6)
    with pytest.raises(ValueError):
        inflate(stream)
