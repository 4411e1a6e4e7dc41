"""Shared independent-reference implementations for the third-opinion
audits (review finding r16: the even/odd incremental-dedup and
minhash-probe reference loops were copy-pasted across four files — a
future semantics fix had to land in four places or the audits would
silently diverge).

These are the REFERENCES, not the product code: plain hashlib/dict
loops re-deriving the documented semantics. Product modules are never
imported here beyond the fixed constants that ARE the spec.

The text-canonicalization twins (_tokens/_canon/_md5_64/_shingles)
live HERE and the audit files import them from this module (ADVICE
r16: the previous direction — this module importing from
test_third_opinion3 — treated a test file as a library, so renaming
or splitting that audit file would have broken every consumer).
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

from duckdb_redis_olap_scanner_spark.operators.dedup import (
    BAND_ROWS,
    MINHASH_A,
    MINHASH_B,
    N_MINHASH,
)
from duckdb_redis_olap_scanner_spark.operators.text import HASH_P

# Java/RE2 \s is ASCII-only; python \s is unicode-aware — spell it out.
_WS = r"[ \t\n\x0b\f\r]+"


def _tokens(text: str) -> list[str]:
    """tokens_col twin: split(lower(trim(text)), \\s+)."""
    return re.split(_WS, text.strip(" ").lower())


def _canon(text: str) -> str:
    """canonical_text twin: lower(trim(regexp_replace(text, \\s+, ' ')))."""
    return re.sub(_WS, " ", text).strip(" ").lower()


def _md5_64(s: str) -> int:
    """md5_hash64 twin from raw hashlib bytes: little-endian u64 of the
    LAST 8 digest bytes, mod HASH_P — independent of Spark's
    md5/substring/conv/decimal chain and DuckDB's md5_number_lower."""
    return int.from_bytes(
        hashlib.md5(s.encode("utf-8")).digest()[8:16], "little"
    ) % HASH_P


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = _tokens(text)
    if len(toks) < n:
        return set()
    return {" ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)}



def incremental_dedup_ref(docs_pd) -> dict:
    """History = even doc ids, incoming = odd: survivors are incoming
    fingerprints absent from history, keep_id = first-in-batch.
    Returns {content_fp: (keep_id, batch_dup_cnt)}."""
    hist: set = set()
    batch: dict = {}
    for r in docs_pd.itertuples(index=False):
        fp = hashlib.sha256(_canon(r.text).encode("utf-8")).hexdigest()
        if r.doc_id % 2 == 0:
            hist.add(fp)
        else:
            keep, cnt = batch.get(fp, (int(r.doc_id), 0))
            batch[fp] = (min(keep, int(r.doc_id)), cnt + 1)
    return {fp: v for fp, v in batch.items() if fp not in hist}


def incremental_minhash_ref(docs_pd, threshold: float = 0.2) -> list:
    """Odd-id batch probes the even-id corpus band index; every
    band-colliding (incoming, history) pair verified at exact Jaccard
    >= threshold over the shingle-hash sets. Returns a sorted list of
    (doc_id, match_id, common, jaccard)."""

    def bands_of(text: str):
        s = {_md5_64(x) for x in _shingles(text)}
        if not s:
            return None, []
        m = [min((a * h + b) % HASH_P for h in s)
             for a, b in zip(MINHASH_A, MINHASH_B)]
        return s, [
            (j, m[BAND_ROWS * j] * HASH_P + m[BAND_ROWS * j + 1])
            for j in range(N_MINHASH // BAND_ROWS)
        ]

    hist_bands: dict = defaultdict(set)
    hist_sets: dict = {}
    inc: dict = {}
    for r in docs_pd.itertuples(index=False):
        s, bl = bands_of(r.text)
        if s is None:
            continue
        if r.doc_id % 2 == 0:
            hist_sets[int(r.doc_id)] = s
            for bv in bl:
                hist_bands[bv].add(int(r.doc_id))
        else:
            inc[int(r.doc_id)] = (s, bl)
    ref = []
    for doc_id, (s, bl) in inc.items():
        matches: set = set()
        for bv in bl:
            matches |= hist_bands.get(bv, set())
        for m in matches:
            common = len(s & hist_sets[m])
            j = common / (len(s) + len(hist_sets[m]) - common)
            if j >= threshold:
                ref.append((doc_id, m, common, j))
    return sorted(ref)
