"""Third-opinion audit, adversarial corpus (r16).

The sf0.001 corpus leaves several fence-post branches IDLE — facts the
fixed-corpus audits had to note as relaxed assertions: every user has
every event type (pivot's fill(0) never fires), no (user, type,
minute) key repeats (watermark dedup is a no-op), no odd-id document
exactly duplicates an even-id one (the incremental anti-join removes
nothing), no user has a >6-day activity gap (the DAU/WAU wau>0
emission rule never excludes a day), and no negative event values
reach the histogram clamps.

This file builds a small HANDCRAFTED corpus in a tmp dir that
activates each of those branches — plus tokenizer edge content the
generator never emits (empty text, whitespace-only text, a NO-BREAK
SPACE pinning ASCII-\\s vs unicode-\\s tokenization, 1- and 2-token
docs) — runs the REAL entries against it (entries only take an sf
dir, so the corpus is written as events.parquet / documents.parquet),
and compares with the same independent python re-derivations used by
the fixed-corpus audits. Each test asserts BOTH agreement and that
the branch it exists for actually fired.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from fractions import Fraction

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog

from .third_opinion_refs import _canon, _md5_64, _tokens

T0 = pd.Timestamp("2024-03-01 00:00:00")


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


def _mk_events() -> pd.DataFrame:
    rows = []

    def ev(eid, uid, etype, dt, value):
        rows.append((eid, T0 + dt, uid, etype, value, "{}"))

    # u1: single event — no TWA segment, 1 SCD2 version
    ev(1, 1, "view", pd.Timedelta(0), 10.0)
    # u2: exactly 7 days apart — WAU window boundary + segment split
    ev(10, 2, "click", pd.Timedelta(0), 1.0)
    ev(11, 2, "click", pd.Timedelta(days=7), 2.0)
    # u3: two events at the IDENTICAL timestamp — event_id tie-break
    ev(20, 3, "view", pd.Timedelta(hours=1), 3.0)
    ev(21, 3, "purchase", pd.Timedelta(hours=1), 4.0)
    # u4: negative / zero / fractional values — floor-of-negative cents
    ev(30, 4, "purchase", pd.Timedelta(hours=2), -0.015)
    ev(31, 4, "purchase", pd.Timedelta(hours=3), 0.0)
    ev(32, 4, "purchase", pd.Timedelta(hours=4), -123.456)
    ev(33, 4, "error", pd.Timedelta(hours=5), 99.995)
    # u5: duplicate (user, type, minute) keys — watermark dedup fires
    ev(40, 5, "view", pd.Timedelta(minutes=90), 1.0)
    ev(41, 5, "view", pd.Timedelta(minutes=90, seconds=20), 2.0)
    ev(42, 5, "view", pd.Timedelta(minutes=90, seconds=40), 3.0)
    # u6: a 10-day silence INSIDE the corpus span — with every other
    # user quiet after day 8, days 15..17 have an EMPTY 7-day window,
    # so the wau>0 emission rule must drop them
    ev(50, 6, "signup", pd.Timedelta(days=8), 5.0)
    ev(51, 6, "signup", pd.Timedelta(days=18), 6.0)
    return pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    ).astype({"event_id": "int64", "user_id": "int64"})


def _mk_docs() -> pd.DataFrame:
    texts = {
        0: "the quick brown fox jumps over the lazy dog again today",
        1: "the quick brown fox jumps over the lazy dog again today",
        2: "",
        3: " \t\n ",
        4: "foo\u00a0bar baz",  # NBSP is NOT ASCII \s — one token
        5: "solo",
        6: "two tokens",
        7: "Hello, World! HELLO... world?",
        8: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        9: "alpha beta gamma delta epsilon zeta eta theta iota lambda",
    }
    return pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": [texts[k] for k in texts],
            "lang": ["en"] * 10,
            "source": ["srcA" if k % 2 == 0 else "srcB" for k in texts],
            "n_chars": [len(texts[k]) for k in texts],
        }
    ).astype({"doc_id": "int64", "n_chars": "int64"})


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_sf")
    _mk_events().to_parquet(d / "events.parquet", index=False)
    _mk_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_pivot_fill_zero_fires(spark, reg, adv_dir):
    got = {
        int(r.user_id): (int(r["click"]), int(r["error"]),
                         int(r["purchase"]), int(r["signup"]),
                         int(r["view"]))
        for r in reg["pivot_event_types"].fn(spark, adv_dir).collect()
    }
    e = _mk_events()
    c = Counter(zip(e["user_id"], e["event_type"]))
    types = ("click", "error", "purchase", "signup", "view")
    ref = {
        int(u): tuple(c.get((u, t), 0) for t in types)
        for u in set(e["user_id"])
    }
    assert got == ref
    assert all(0 in v for v in ref.values())  # fill(0) genuinely fired


def test_watermark_dedup_fires(spark, reg, adv_dir):
    got = sorted(
        (int(r.user_id), r.event_type, r.minute_start)
        for r in reg["stream_dedup_watermark"].fn(spark, adv_dir).collect()
    )
    e = _mk_events()
    ref = sorted({
        (int(r.user_id), r.event_type,
         r.ts.strftime("%Y-%m-%d %H:%M:00"))
        for r in e.itertuples(index=False)
    })
    assert got == ref
    assert len(ref) < len(e)  # the distinct actually removed rows


def test_incremental_dedup_removal_fires(spark, reg, adv_dir):
    from .third_opinion_refs import incremental_dedup_ref

    got = {
        r.content_fp: (int(r.keep_id), int(r.batch_dup_cnt))
        for r in reg["pipeline_incremental_dedup"].fn(spark, adv_dir)
        .collect()
    }
    docs = _mk_docs()
    ref = incremental_dedup_ref(docs)
    assert got == ref
    # doc 1 duplicates doc 0 (history side); "" and whitespace-only
    # canonicalize identically, so doc 3 (odd) collides with doc 2 —
    # the anti-join removal branch genuinely fires (there are odd-id
    # batch fingerprints, but fewer survivors)
    n_batch_fps = len({
        hashlib.sha256(_canon(r.text).encode("utf-8")).hexdigest()
        for r in docs.itertuples(index=False) if r.doc_id % 2 == 1
    })
    assert len(ref) < n_batch_fps


def test_dau_wau_empty_window_days_excluded(spark, reg, adv_dir):
    got = {
        r.day: (int(r.dau), int(r.wau), int(r.stickiness_milli))
        for r in reg["events_dau_wau"].fn(spark, adv_dir).collect()
    }
    e = _mk_events()
    e["day"] = e["ts"].dt.normalize()
    active: dict = defaultdict(set)
    for r in e.itertuples(index=False):
        active[r.day].add(r.user_id)
    d0, d1 = min(active), max(active)
    ref = {}
    d = d0
    excluded = 0
    while d <= d1:
        wau_users: set = set()
        for off in range(7):
            wau_users |= active.get(d - pd.Timedelta(days=off), set())
        if wau_users:
            dau = len(active.get(d, set()))
            ref[d.strftime("%Y-%m-%d")] = (
                dau, len(wau_users), 1000 * dau // len(wau_users)
            )
        else:
            excluded += 1
        d += pd.Timedelta(days=1)
    assert got == ref
    assert excluded >= 1  # the wau>0 rule genuinely dropped spine days


def test_time_weighted_avg_single_event_user_absent(spark, reg, adv_dir):
    import numpy as np

    got = {
        int(r.user_id): (int(r.weighted_area), int(r.total_span_us))
        for r in reg["events_time_weighted_avg"].fn(spark, adv_dir)
        .collect()
    }
    e = _mk_events()
    e["us"] = e["ts"].astype("datetime64[us]").astype("int64")
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    ref = {}
    for uid, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        ts, v = grp["us"].tolist(), grp["cents"].tolist()
        if len(ts) < 2:
            continue
        ref[int(uid)] = (
            sum(v[i] * (ts[i + 1] - ts[i]) for i in range(len(ts) - 1)),
            ts[-1] - ts[0],
        )
    assert got == ref
    assert 1 not in got  # the single-event user produced no row


def test_rolling_anomaly_negative_cents(spark, reg, adv_dir):
    import numpy as np

    got = {
        int(r.event_id): (int(r.x_cents), int(r.win_n), int(r.win_sum),
                          int(r.win_sumsq), bool(r.is_anomaly))
        for r in reg["events_rolling_anomaly"].fn(spark, adv_dir).collect()
    }
    e = _mk_events()
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    # floor of negative fractions rounds AWAY from zero
    assert set(e.loc[e.event_id.isin([30, 32]), "cents"]) == {-2, -12346}
    ref = {}
    for _, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        xs, ids = grp["cents"].tolist(), grp["event_id"].tolist()
        for i, (eid, x) in enumerate(zip(ids, xs)):
            win = xs[max(0, i - 19): i + 1]
            n, s, q = len(win), sum(win), sum(w * w for w in win)
            mean = Fraction(s, n)
            var = Fraction(q, n) - mean * mean
            flag = n >= 5 and (Fraction(x) - mean) ** 2 > 4 * var
            ref[int(eid)] = (int(x), n, s, q, flag)
    assert got == ref


def test_value_histogram_negative_clamp_fires(spark, reg, adv_dir):
    import numpy as np

    got = {
        (r.event_type, int(r.bucket)): (int(r.n_events), int(r.sum_cents),
                                        int(r.min_cents), int(r.max_cents))
        for r in reg["events_value_histogram"].fn(spark, adv_dir).collect()
    }
    e = _mk_events()
    agg: dict = {}
    for et, v in zip(e["event_type"], e["value"]):
        cents = int(np.floor(v * 100.0))
        b = max(min(cents // 2500, 19), 0)
        ne, s, lo, hi = agg.get((et, b), (0, 0, cents, cents))
        agg[(et, b)] = (ne + 1, s + cents, min(lo, cents), max(hi, cents))
    assert got == agg
    # the negative values landed in the clamped bucket 0 with min < 0
    assert agg[("purchase", 0)][2] < 0


def test_token_stats_on_edge_texts(spark, reg, adv_dir):
    import re

    got = {
        int(r.doc_id): (int(r.ws_tokens), int(r.bpeish_tokens),
                        int(r.n_chars_measured), int(r.n_bytes))
        for r in reg["text_token_stats"].fn(spark, adv_dir).collect()
    }
    bpeish = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]"
    ref = {}
    for r in _mk_docs().itertuples(index=False):
        ref[int(r.doc_id)] = (
            len(_tokens(r.text)),
            len(re.findall(bpeish, r.text)),
            len(r.text),
            len(r.text.encode("utf-8")),
        )
    assert got == ref
    # the NBSP doc: "foo\xa0bar baz" splits on the SPACE only — two
    # whitespace tokens, because \s is ASCII in both engines
    assert ref[4][0] == 2
    # empty text tokenizes to [''] (split('') == ['']) — size 1
    assert ref[2][0] == 1 and ref[2][2] == 0


def test_repetition_stats_short_doc_branch(spark, reg, adv_dir):
    got = {
        int(r.doc_id): (int(r.n_tok), int(r.n_distinct),
                        int(r.top_bigram_cnt),
                        None if r.top_bigram_frac is None
                        else float(r.top_bigram_frac),
                        bool(r.rep_ok))
        for r in reg["text_repetition_stats"].fn(spark, adv_dir).collect()
    }
    from duckdb_redis_olap_scanner_spark.operators.text import (
        MAX_DUP_TOKEN_FRAC,
        MAX_TOP_BIGRAM_FRAC,
    )

    ref = {}
    for r in _mk_docs().itertuples(index=False):
        toks = _tokens(r.text)
        n, nd = len(toks), len(set(toks))
        bg = Counter(zip(toks, toks[1:]))
        top = max(bg.values()) if bg else 0
        frac = top / (n - 1) if n >= 2 else None
        ok = (n - nd) / n <= MAX_DUP_TOKEN_FRAC and (
            n < 2 or frac <= MAX_TOP_BIGRAM_FRAC
        )
        ref[int(r.doc_id)] = (n, nd, top, frac, ok)
    assert got == ref
    assert ref[5][3] is None  # 1-token doc: the NULL frac branch fired
    assert ref[6][2] == 1  # 2-token doc: exactly one bigram


def test_exact_dedup_groups_edge_texts(spark, reg, adv_dir):
    got = {
        r.content_fp: (int(r.keep_id), int(r.dup_cnt))
        for r in reg["dedup_exact"].fn(spark, adv_dir).collect()
    }
    ref: dict = {}
    for r in _mk_docs().itertuples(index=False):
        fp = hashlib.sha256(_canon(r.text).encode("utf-8")).hexdigest()
        keep, cnt = ref.get(fp, (int(r.doc_id), 0))
        ref[fp] = (min(keep, int(r.doc_id)), cnt + 1)
    assert got == ref
    empty_fp = hashlib.sha256(b"").hexdigest()
    # "" and whitespace-only collapse to the same (empty) canonical form
    assert ref[empty_fp] == (2, 2)
    dup_fp = hashlib.sha256(
        _canon(_mk_docs()["text"][0]).encode("utf-8")
    ).hexdigest()
    assert ref[dup_fp] == (0, 2)


def test_minhash_lsh_finds_the_near_dup_pair(spark, reg, adv_dir):
    """Docs 8/9 share 7 of their 8 3-gram shingles (Jaccard 7/9); the
    exact-dup pair 0/1 collides at Jaccard 1.0. Both must surface, and
    the whole output must match the hashlib re-derivation."""
    from .test_third_opinion3 import _python_lsh_pairs

    got = sorted(
        (int(r.doc_a), int(r.doc_b), int(r.common), float(r.jaccard))
        for r in reg["dedup_minhash_lsh"].fn(spark, adv_dir).collect()
    )
    ref = _python_lsh_pairs(_mk_docs())
    assert got == sorted(ref)
    pairs = {(a, b) for a, b, _, _ in got}
    assert (0, 1) in pairs and (8, 9) in pairs


def test_scd2_and_sessionize_identical_timestamps(spark, reg, adv_dir):
    """u3's two events share one timestamp: SCD2 must still emit one
    current version and a zero-length closed interval, ordered by the
    event_id tie-break."""
    got = {
        int(r.user_id): (int(r.n_versions), int(r.n_current),
                         int(r.closed_span_us))
        for r in reg["events_scd2_intervals"].fn(spark, adv_dir).collect()
    }
    e = _mk_events()
    e["us"] = e["ts"].astype("datetime64[us]").astype("int64")
    ref = {}
    for uid, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        ts = grp["us"].tolist()
        ref[int(uid)] = (len(ts), 1,
                         sum(b - a for a, b in zip(ts, ts[1:])))
    assert got == ref
    assert got[3] == (2, 1, 0)  # zero-length closed interval
