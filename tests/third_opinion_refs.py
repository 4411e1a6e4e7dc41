"""Shared independent-reference implementations for the third-opinion
audits (review finding r16: the even/odd incremental-dedup and
minhash-probe reference loops were copy-pasted across four files — a
future semantics fix had to land in four places or the audits would
silently diverge).

These are the REFERENCES, not the product code: plain hashlib/dict
loops re-deriving the documented semantics. Product modules are never
imported here beyond the fixed constants that ARE the spec.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from duckdb_redis_olap_scanner_spark.operators.dedup import (
    BAND_ROWS,
    MINHASH_A,
    MINHASH_B,
    N_MINHASH,
)
from duckdb_redis_olap_scanner_spark.operators.text import HASH_P

from .test_third_opinion3 import _canon, _md5_64, _shingles


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
