"""Third-opinion audit, batch 14 (r16): PII redaction and the last
set-op / lateral / NULL-handling singles.

* text_pii_scrub / text_pii_scrub_full — the redaction pipeline
  replayed with python `re` and an own-rolled Luhn fold: per-class
  counts on the ORIGINAL text, the fixed redaction order
  (email -> phone -> SSN -> IP -> valid CCs in extraction order),
  the scrubbed md5, and the length delta. The injected fixtures are
  mirrored from the entry's documented moduli, including the
  Luhn-INVALID card (counted as candidate, never redacted) and the
  out-of-range IP octet (999.77.1.1 must survive).
* set_union_all / set_intersect / set_except — bag vs set semantics.
* lateral_posexplode — positions from a plain space split.
* null_funcs — coalesce / IS NULL / nullif over outer-join nulls.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog

# The PII patterns ARE the spec being exercised (which strings count
# as each class), re-stated here as literals rather than imported from
# operators/text.py so a silent edit to the product regexes fails this
# audit instead of rewriting its reference (review finding r16). The
# semantics under audit — per-class counts on the original text, the
# fixed redaction order, Luhn gating, md5/len_delta — are re-derived
# below with python re.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
PII_IP_RE = rf"\b{_OCTET}(?:\.{_OCTET}){{3}}\b"
PII_CC_RE = r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b"

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])


def _inject_basic(doc_id: int, text: str) -> str:
    if doc_id % 5 == 0:
        return f"{text} contact user{doc_id}@mail.example.com now"
    if doc_id % 7 == 0:
        return f"{text} call 555-123-4567"
    return text


def _inject_full(doc_id: int, text: str) -> str:
    t = _inject_basic(doc_id, text)
    if doc_id % 11 == 0:
        t += " card 4539-1488-0343-6467 ok"
    elif doc_id % 13 == 0:
        t += " card 4539 1488 0343 6468 bad"
    elif doc_id % 23 == 0:
        t += " acct 4111111111111111"
    if doc_id % 17 == 0:
        t += " ssn 123-45-6789 here"
    if doc_id % 19 == 0:
        t += " ip 192.168.10.254 not 999.77.1.1"
    return t


def _luhn_ok(s: str) -> bool:
    """The documented fold: 1-based position i over the stripped
    digits, ODD positions doubled (minus 9 past 9), sum % 10 == 0."""
    digits = re.sub(r"[^0-9]", "", s)
    total = 0
    for i, ch in enumerate(digits, start=1):
        d = int(ch)
        if i % 2 == 1:
            d = 2 * d - 9 if 2 * d > 9 else 2 * d
        total += d
    return total % 10 == 0


def test_pii_scrub_matches_python_re(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (int(r.n_emails), int(r.n_phones), r.clean_md5,
                        int(r.len_delta))
        for r in reg["text_pii_scrub"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    fired = 0
    for r in docs_pd.itertuples(index=False):
        t = _inject_basic(int(r.doc_id), r.text)
        clean = re.sub(PII_PHONE_RE,
                       "<PHONE>", re.sub(PII_EMAIL_RE, "<EMAIL>", t))
        ne = len(re.findall(PII_EMAIL_RE, t))
        np_ = len(re.findall(PII_PHONE_RE, t))
        fired += ne + np_
        ref[int(r.doc_id)] = (
            ne, np_,
            hashlib.md5(clean.encode("utf-8")).hexdigest(),
            len(t) - len(clean),
        )
    assert got == ref and fired > 0


def test_pii_scrub_full_matches_python_re(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (int(r.n_emails), int(r.n_phones), int(r.n_ssn),
                        int(r.n_ip), int(r.n_cc_candidates),
                        int(r.n_cc_valid), r.clean_md5, int(r.len_delta))
        for r in reg["text_pii_scrub_full"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    saw_invalid_cc = saw_valid_cc = False
    for r in docs_pd.itertuples(index=False):
        t = _inject_full(int(r.doc_id), r.text)
        cands = re.findall(PII_CC_RE, t)
        valid = [c for c in cands if _luhn_ok(c)]
        clean = re.sub(PII_EMAIL_RE, "<EMAIL>", t)
        clean = re.sub(PII_PHONE_RE, "<PHONE>", clean)
        clean = re.sub(PII_SSN_RE, "<SSN>", clean)
        clean = re.sub(PII_IP_RE, "<IP>", clean)
        for c in valid:
            clean = clean.replace(c, "<CC>")
        saw_invalid_cc |= len(valid) < len(cands)
        saw_valid_cc |= bool(valid)
        ref[int(r.doc_id)] = (
            len(re.findall(PII_EMAIL_RE, t)),
            len(re.findall(PII_PHONE_RE, t)),
            len(re.findall(PII_SSN_RE, t)),
            len(re.findall(PII_IP_RE, t)),
            len(cands), len(valid),
            hashlib.md5(clean.encode("utf-8")).hexdigest(),
            len(t) - len(clean),
        )
    assert got == ref
    # both the Luhn-valid and Luhn-invalid branches fired, and the
    # out-of-range IP octet survived scrubbing in at least one doc
    assert saw_valid_cc and saw_invalid_cc
    assert any(re.search(r"999\.77\.1\.1", _inject_full(int(d), t))
               for d, t in zip(docs_pd["doc_id"], docs_pd["text"]))


def test_set_union_all_bag(spark, reg):
    got = Counter(
        (int(r.c_custkey), r.seg)
        for r in reg["set_union_all"].fn(spark, SF_DIR).collect()
    )
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    ref: Counter = Counter()
    for ck, seg in zip(c["c_custkey"], c["c_mktsegment"]):
        if seg == "BUILDING":
            ref[(int(ck), "building")] += 1
        if seg == "AUTOMOBILE":
            ref[(int(ck), "auto")] += 1
    assert got == ref and len(got) > 0


def test_set_intersect_except_distinct(spark, reg):
    """INTERSECT: customers with BOTH an 'O' and an 'F' order;
    EXCEPT: customers without any 'P' order — both DISTINCT (the
    output may not contain duplicates even though the inputs do)."""
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_custkey", "o_orderstatus"])
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet",
                        columns=["c_custkey"])
    rows_i = [int(r.o_custkey)
              for r in reg["set_intersect"].fn(spark, SF_DIR).collect()]
    rows_e = [int(r.c_custkey)
              for r in reg["set_except"].fn(spark, SF_DIR).collect()]
    by_status: dict = {}
    for s in ("O", "F", "P"):
        by_status[s] = {
            int(k) for k, st in zip(o["o_custkey"], o["o_orderstatus"])
            if st == s
        }
    assert set(rows_i) == by_status["O"] & by_status["F"]
    assert set(rows_e) == {int(k) for k in c["c_custkey"]} - by_status["P"]
    # distinct semantics: no duplicates despite duplicated inputs
    assert len(rows_i) == len(set(rows_i))
    assert len(rows_e) == len(set(rows_e))


def test_lateral_posexplode_matches_python(spark, reg):
    got = sorted(
        (int(r.p_partkey), int(r.pos), r.word)
        for r in reg["lateral_posexplode"].fn(spark, SF_DIR).collect()
    )
    p = pd.read_parquet(f"{SF_DIR}/part.parquet",
                        columns=["p_partkey", "p_name"])
    ref = []
    for pk, name in zip(p["p_partkey"], p["p_name"]):
        if pk >= 500:
            continue
        for i, w in enumerate(name.split(" ")):
            ref.append((int(pk), i, w))
    assert got == sorted(ref) and len(got) > 0


def test_null_funcs_matches_python(spark, reg):
    got = {
        int(r.c_custkey): (r.status_or_default, bool(r.has_no_big_order),
                           r.seg_nullified)
        for r in reg["null_funcs"].fn(spark, SF_DIR).collect()
    }
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderstatus",
                 "o_totalprice"],
    )
    big = o[o["o_totalprice"] > 450000.0]
    agg = {}
    for ck, grp in big.groupby("o_custkey"):
        agg[int(ck)] = (int(grp["o_orderkey"].min()),
                        min(grp["o_orderstatus"]))
    ref = {}
    for ck, seg in zip(c["c_custkey"], c["c_mktsegment"]):
        hit = agg.get(int(ck))
        ref[int(ck)] = (
            hit[1] if hit else "NO_ORDERS",
            hit is None,
            None if seg == "BUILDING" else seg,
        )
    assert got == ref
    # all three NULL-handling branches live
    assert any(v[1] for v in ref.values())
    assert any(not v[1] for v in ref.values())
    assert any(v[2] is None for v in ref.values())


def test_subquery_correlated_integer_cross_multiply(spark, reg):
    """Customers above their nation's mean balance, via the entry's
    exact integer cross-multiplication (cents * n > sum_cents) —
    re-derived with plain dict loops, no division anywhere."""
    import numpy as np

    got = sorted(
        (int(r.c_custkey), int(r.c_nationkey))
        for r in reg["subquery_correlated"].fn(spark, SF_DIR).collect()
    )
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    c["cents"] = np.floor(c["c_acctbal"].values * 100).astype("int64")
    n_of: dict = Counter(int(k) for k in c["c_nationkey"])
    sum_of: dict = {}
    for nk, grp in c.groupby("c_nationkey"):
        sum_of[int(nk)] = int(grp["cents"].sum())
    ref = sorted(
        (int(r.c_custkey), int(r.c_nationkey))
        for r in c.itertuples(index=False)
        if int(r.cents) * n_of[int(r.c_nationkey)]
        > sum_of[int(r.c_nationkey)]
    )
    assert got == ref and 0 < len(got) < len(c)


def test_ann_index_entry_equals_numpy_multiprobe(spark, reg):
    """pipeline_incremental_ann_indexed shares ann_ivf_multiprobe's
    oracle by construction; it must also equal the INDEPENDENT numpy
    multiprobe re-derivation — build+append+probe through the
    persisted bucketed index may not change a row."""
    from .test_third_opinion6 import _ivf_assign, _topk_within

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    import numpy as np

    ids = emb["vec_id"].to_numpy()
    q = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype("float64") * 1000.0
    ).astype("int64")
    order = np.argsort(ids)
    ids, q = ids[order], q[order]
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.cell),
         float(r.cos_sim), int(r.rank))
        for r in reg["pipeline_incremental_ann_indexed"]
        .fn(spark, SF_DIR).collect()
    )
    assign1 = _ivf_assign(ids, q, 1)
    probes = _ivf_assign(ids, q, 2)
    assert got == _topk_within(ids, q, probes, assign1) and len(got) > 0


def test_attach_recovery_entry_equals_python_incremental(spark, reg):
    """pipeline_index_attach_recovery (build -> DROP TABLE -> attach
    from the sidecar -> probe) must equal the independent incremental-
    dedup reference: recovery may not change a row."""
    from .third_opinion_refs import incremental_dedup_ref

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    got = {
        r.content_fp: (int(r.keep_id), int(r.batch_dup_cnt))
        for r in reg["pipeline_index_attach_recovery"]
        .fn(spark, SF_DIR).collect()
    }
    assert got == incremental_dedup_ref(docs) and len(got) > 0
