"""Third-opinion audit, batch 5 (r16): window frames, agg formulas,
text heuristics, and the Levenshtein verifier.

Independent re-derivations from each entry's definition (python loops,
hashlib, an own-rolled DP — no Spark, no DuckDB expression reuse):

* dedup_edit_distance   — Levenshtein re-implemented as a hand-rolled
                          DP (both engines ship built-ins that could
                          share a spec misreading; the DP is the
                          textbook definition) over the SAME banded-LSH
                          candidate set, re-derived with hashlib.
* window_range_frame    — RANGE ±1,000,000 cents re-counted per row by
                          brute force (value-based bounds INCLUSIVE on
                          both ends).
* window_moving_avg     — 3-row trailing mean by loop.
* window_percent_rank   — percent_rank=(rank-1)/(n-1), cume_dist from
                          its definition (fraction of partition rows
                          ordered <= current), nth_value(2).
* udaf_second_max       — second-largest DISTINCT cents by sort.
* agg_stats / agg_bitwise / agg_median_cents — formula re-derivations
                          (exact mean over cents; fold and/or/xor;
                          numpy linear-interpolation quantiles).
* customer_order_gaps   — per-customer gap loop, per-mille floor mean.
* events_value_histogram — equi-width bucket fence-posts (clamped
                          [0, 19], integer floor division).
* text_quality_score / text_lang_guess / text_token_stats /
  text_fingerprints     — the text heuristics re-derived with python
                          str ops, re.findall, hashlib, and an ord()
                          loop for the polynomial fold.

Brute force ON PURPOSE; sf0.001 keeps the quadratic bits sub-second.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.operators.dedup import EDIT_NEAR_DIST
from duckdb_redis_olap_scanner_spark.operators.text import (
    HASH_P,
    LANG_MARKERS,
    STOPWORDS,
)
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR
from .third_opinion_refs import _canon, _md5_64, _shingles, _tokens

_WS_CLASS = " \t\n\x0b\f\r"
BPEISH = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]"  # ASCII \s spelled out


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


@pytest.fixture(scope="module")
def orders_pd():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def _levenshtein(a: str, b: str) -> int:
    """Textbook Wagner-Fischer DP, rolling row."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lsh_candidates(docs_pd):
    """Band-collision candidate pairs, re-derived with hashlib (the
    pre-Jaccard candidate set shared by the Levenshtein verifier)."""
    from duckdb_redis_olap_scanner_spark.operators.dedup import (
        BAND_ROWS,
        MINHASH_A,
        MINHASH_B,
        N_MINHASH,
    )

    buckets: dict = defaultdict(set)
    for r in docs_pd.itertuples(index=False):
        s = {_md5_64(x) for x in _shingles(r.text)}
        if not s:
            continue
        m = [min((a * h + b) % HASH_P for h in s)
             for a, b in zip(MINHASH_A, MINHASH_B)]
        for j in range(N_MINHASH // BAND_ROWS):
            buckets[(j, m[BAND_ROWS * j] * HASH_P
                     + m[BAND_ROWS * j + 1])].add(int(r.doc_id))
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cand.add((a, b))
    return cand


def test_edit_distance_matches_own_dp(spark, reg, docs_pd):
    got = sorted(
        (int(r.doc_a), int(r.doc_b), int(r.edit_dist), bool(r.is_near))
        for r in reg["dedup_edit_distance"].fn(spark, SF_DIR).collect()
    )
    canon = {int(r.doc_id): _canon(r.text)
             for r in docs_pd.itertuples(index=False)}
    ref = []
    for a, b in sorted(_lsh_candidates(docs_pd)):
        d = _levenshtein(canon[a], canon[b])
        ref.append((a, b, d, d <= EDIT_NEAR_DIST))
    assert got == ref and len(got) > 0


def test_range_frame_matches_bruteforce_count(spark, reg, orders_pd):
    got = {
        int(r.o_orderkey): int(r.n_within_10k)
        for r in reg["window_range_frame"].fn(spark, SF_DIR).collect()
    }
    o = orders_pd.copy()
    o["cents"] = np.floor(o["o_totalprice"].values * 100).astype("int64")
    ref = {}
    for _, grp in o.groupby("o_custkey"):
        cents = grp["cents"].tolist()
        for key, c in zip(grp["o_orderkey"].tolist(), cents):
            ref[int(key)] = sum(
                1 for x in cents if c - 1_000_000 <= x <= c + 1_000_000
            )
    assert got == ref and len(got) == len(orders_pd)


def test_moving_avg_matches_python_loop(spark, reg):
    got = {
        int(r.event_id): float(r.moving_avg)
        for r in reg["window_moving_avg"].fn(spark, SF_DIR).collect()
    }
    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    ref = {}
    for _, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        cents = grp["cents"].tolist()
        for i, eid in enumerate(grp["event_id"].tolist()):
            win = cents[max(0, i - 2): i + 1]
            ref[int(eid)] = float(sum(win)) / (100.0 * len(win))
    assert got == ref and len(got) == len(e)


def test_percent_rank_matches_definitions(spark, reg):
    """percent_rank = (rank-1)/(n-1) (0 for a 1-row partition),
    cume_dist = rows-ordered-<=-current / n, nth_value(2) over the
    full frame — each from its definition."""
    got = {
        int(r.c_custkey): (float(r.pct_rank), float(r.cume),
                           None if r.second_poorest is None
                           else int(r.second_poorest))
        for r in reg["window_percent_rank"].fn(spark, SF_DIR).collect()
    }
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    ref = {}
    for _, grp in c.groupby("c_nationkey"):
        rows = sorted(
            grp.itertuples(index=False),
            key=lambda r: (r.c_acctbal, r.c_custkey),
        )
        n = len(rows)
        second = int(rows[1].c_custkey) if n >= 2 else None
        for i, r in enumerate(rows):
            pct = 0.0 if n == 1 else i / (n - 1)
            ref[int(r.c_custkey)] = (pct, (i + 1) / n, second)
    assert got == ref and len(got) > 0


def test_second_max_matches_python_sort(spark, reg, orders_pd):
    got = {
        int(r.o_custkey): (None if r.second_best_cents is None
                           else int(r.second_best_cents))
        for r in reg["udaf_second_max"].fn(spark, SF_DIR).collect()
    }
    o = orders_pd.copy()
    o["cents"] = np.floor(o["o_totalprice"].values * 100).astype("int64")
    ref = {}
    for ck, grp in o.groupby("o_custkey"):
        distinct = sorted(set(grp["cents"].tolist()), reverse=True)
        ref[int(ck)] = int(distinct[1]) if len(distinct) >= 2 else None
    assert got == ref and len(got) > 0


def test_agg_stats_matches_python(spark, reg):
    got = {
        r.l_returnflag: (float(r.min_qty), float(r.max_qty),
                         r.first_ship_ts, int(r.n_rows),
                         float(r.mean_qty))
        for r in reg["agg_stats"].fn(spark, SF_DIR).collect()
    }
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_shipdate"],
    )
    ref = {}
    for flag, grp in li.groupby("l_returnflag"):
        q = grp["l_quantity"]
        cents = int(np.floor(q.values * 100).astype("int64").sum())
        ref[flag] = (
            float(q.min()), float(q.max()),
            grp["l_shipdate"].min().to_pydatetime(),
            len(grp), cents / (100.0 * len(grp)),
        )
    assert got == ref and len(got) >= 2


def test_agg_bitwise_matches_python_fold(spark, reg):
    got = {
        r.l_returnflag: (int(r.all_and), int(r.all_or), int(r.keys_xor))
        for r in reg["agg_bitwise"].fn(spark, SF_DIR).collect()
    }
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_linenumber", "l_orderkey"],
    )
    ref = {}
    for flag, grp in li.groupby("l_returnflag"):
        a = o = None
        x = 0
        for ln, ok in zip(grp["l_linenumber"].tolist(),
                          grp["l_orderkey"].tolist()):
            a = ln if a is None else a & ln
            o = ln if o is None else o | ln
            x ^= ok % 4096
        ref[flag] = (a, o, x)
    assert got == ref and len(got) >= 2


def test_median_cents_matches_numpy(spark, reg):
    """numpy arranges the p*(n-1) linear interpolation as
    lo + (hi-lo)*g while the engines compute lo*(1-g) + hi*g — a
    legitimate last-ulp difference — so the float compare allows
    1e-12 relative drift. An index-formula misreading (ceil vs
    round, p*n vs p*(n-1)) is whole interpolation steps away and
    still fails."""
    import math

    got = {
        int(r.c_nationkey): (float(r.median_cents), float(r.p90_cents))
        for r in reg["agg_median_cents"].fn(spark, SF_DIR).collect()
    }
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )
    c["cents"] = np.floor(c["c_acctbal"].values * 100).astype("int64")
    assert len(got) > 0
    seen = set()
    for nk, grp in c.groupby("c_nationkey"):
        v = grp["cents"].values
        g = got[int(nk)]
        assert math.isclose(
            g[0], float(np.percentile(v, 50, method="linear")),
            rel_tol=1e-12,
        ), nk
        assert math.isclose(
            g[1], float(np.percentile(v, 90, method="linear")),
            rel_tol=1e-12,
        ), nk
        seen.add(int(nk))
    assert seen == set(got)


def test_order_gaps_match_python_loop(spark, reg, orders_pd):
    got = {
        int(r.custkey): (int(r.n_orders), int(r.n_gaps),
                         int(r.total_gap_days), None
                         if r.max_gap_days is None else int(r.max_gap_days),
                         int(r.mean_gap_milli))
        for r in reg["customer_order_gaps"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for ck, grp in orders_pd.sort_values(
        ["o_orderdate", "o_orderkey"], kind="stable"
    ).groupby("o_custkey"):
        days = [pd.Timestamp(d) for d in grp["o_orderdate"]]
        gaps = [(b - a).days for a, b in zip(days, days[1:])]
        ref[int(ck)] = (
            len(days), len(gaps), sum(gaps),
            max(gaps) if gaps else None,
            1000 * sum(gaps) // len(gaps) if gaps else 0,
        )
    assert got == ref and len(got) > 0


def test_value_histogram_matches_python_buckets(spark, reg):
    got = {
        (r.event_type, int(r.bucket)): (int(r.n_events), int(r.sum_cents),
                                        int(r.min_cents), int(r.max_cents))
        for r in reg["events_value_histogram"].fn(spark, SF_DIR).collect()
    }
    e = pd.read_parquet(f"{SF_DIR}/events.parquet",
                        columns=["event_type", "value"])
    agg: dict = {}
    for et, v in zip(e["event_type"].tolist(), e["value"].tolist()):
        cents = int(np.floor(v * 100.0))
        b = max(min(cents // 2500, 19), 0)
        ne, s, lo, hi = agg.get((et, b), (0, 0, cents, cents))
        agg[(et, b)] = (ne + 1, s + cents, min(lo, cents), max(hi, cents))
    assert got == agg and len(got) > 0


def test_quality_score_matches_python(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (int(r.token_cnt), int(r.stop_cnt),
                        int(r.punct_cnt), float(r.stop_ratio),
                        float(r.chars_per_token), bool(r.len_ok))
        for r in reg["text_quality_score"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for r in docs_pd.itertuples(index=False):
        toks = _tokens(r.text)
        n = len(toks)
        stop = sum(1 for t in toks if t in STOPWORDS)
        punct = sum(1 for ch in r.text if ch in ".,;:!?")
        ref[int(r.doc_id)] = (
            n, stop, punct, stop / n, len(r.text) / n,
            20 <= n <= 2000,
        )
    assert got == ref and len(got) == len(docs_pd)


def test_lang_guess_matches_python_priority(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (int(r.c_en), int(r.c_de), int(r.c_fr),
                        int(r.c_es), r.lang_guess, bool(r.label_match))
        for r in reg["text_lang_guess"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for r in docs_pd.itertuples(index=False):
        toks = _tokens(r.text)
        c = {lang: sum(1 for t in toks if t in m)
             for lang, m in LANG_MARKERS.items()}
        if c["en"] >= c["de"] and c["en"] >= c["fr"] and c["en"] >= c["es"]:
            g = "en"
        elif c["de"] >= c["fr"] and c["de"] >= c["es"]:
            g = "de"
        elif c["fr"] >= c["es"]:
            g = "fr"
        else:
            g = "es"
        ref[int(r.doc_id)] = (c["en"], c["de"], c["fr"], c["es"], g,
                              g == r.lang)
    assert got == ref and len(got) == len(docs_pd)


def test_token_stats_match_python_regex(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (int(r.ws_tokens), int(r.bpeish_tokens),
                        int(r.n_chars_measured), int(r.n_bytes))
        for r in reg["text_token_stats"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for r in docs_pd.itertuples(index=False):
        ref[int(r.doc_id)] = (
            len(_tokens(r.text)),
            len(re.findall(BPEISH, r.text)),
            len(r.text),
            len(r.text.encode("utf-8")),
        )
    assert got == ref and len(got) == len(docs_pd)


def test_fingerprints_match_hashlib_and_ord_loop(spark, reg, docs_pd):
    """SHA-256/MD5 hex from hashlib; the polynomial fold re-run as a
    literal ord() loop over the canonical text."""
    got = {
        int(r.doc_id): (r.sha256_fp, r.md5_fp, int(r.poly_fp))
        for r in reg["text_fingerprints"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for r in docs_pd.itertuples(index=False):
        ct = _canon(r.text)
        acc = 0
        for ch in ct:
            acc = (acc * 31 + ord(ch)) % HASH_P
        ref[int(r.doc_id)] = (
            hashlib.sha256(ct.encode("utf-8")).hexdigest(),
            hashlib.md5(ct.encode("utf-8")).hexdigest(),
            acc,
        )
    assert got == ref and len(got) == len(docs_pd)
