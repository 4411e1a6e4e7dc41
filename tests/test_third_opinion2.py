"""Third-opinion audit, batch 3 (r16): temporal / window / agg specs.

Same rationale as tests/test_third_opinion.py — the oracle gate proves
Spark == DuckDB, but both sides are written by the same hand, so a
spec MISREADING passes the gate in both engines. Each test here is an
INDEPENDENT re-derivation of an entry's semantics from its definition
(plain python loops, exact ``fractions.Fraction`` arithmetic, pandas
only for parquet IO), over the sf0.001 tables.

Chosen entries and the misreading each would catch:

* events_dau_wau           — the interval-delta WAU rewrite vs a naive
                             per-day rolling 7-day distinct count (the
                             DEFINITION of WAU); window bounds, segment
                             splitting, and the wau>0 emission rule.
* events_time_weighted_avg — LOCF segment integral re-derived with a
                             per-user loop (last observation carries NO
                             area; total span excludes the open tail).
* events_rolling_anomaly   — |x-mean| > K*stddev_pop re-checked in
                             EXACT rational arithmetic from the
                             textbook definition, not the cleared-
                             denominator int64 form both engines share
                             (an algebra slip in the clearing would
                             pass the gate; Fractions cannot drift).
* events_running_distinct  — the first-occurrence-flag rewrite vs a
                             literal per-user running set.
* events_scd2_intervals    — validity intervals from a per-user loop.
* events_gapfill_locf      — hour spine fence-posts + LOCF by loop.
* events_type_transitions  — Markov bigram counts + int/int p_next.
* events_equidepth_histogram — bucket assignment re-derived with
                             INTEGER // (the oracle's arithmetic; the
                             Spark side floors a double division).
* window_ntile_first_last  — NTILE(4) from the SQL-standard bucket-
                             size rule (first n%k buckets one larger).
* parts_pareto             — the two-pass range-partitioned prefix sum
                             vs a single python sort+cumsum.
* orders_rfm               — recency/frequency/monetary by loop.

Everything is brute force ON PURPOSE; sf0.001 keeps it sub-second.
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

import numpy as np
import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _us(ts: pd.Series) -> pd.Series:
    return ts.astype("datetime64[us]").astype("int64")


def test_dau_wau_matches_rolling_distinct(spark, reg, events_pd):
    """WAU per its DEFINITION — distinct users active in [d-6, d] —
    computed day by day with python sets, against the entry's
    interval-delta rewrite (segments, +1/-1 deltas, prefix sum)."""
    got = {
        r.day: (int(r.dau), int(r.wau), int(r.stickiness_milli))
        for r in reg["events_dau_wau"].fn(spark, SF_DIR).collect()
    }
    e = events_pd.copy()
    e["day"] = e["ts"].dt.normalize()
    active: dict = defaultdict(set)  # day -> {user}
    for r in e.itertuples(index=False):
        active[r.day].add(r.user_id)
    d0, d1 = min(active), max(active)
    ref = {}
    d = d0
    while d <= d1:
        wau_users: set = set()
        for off in range(7):
            wau_users |= active.get(d - pd.Timedelta(days=off), set())
        if wau_users:
            dau = len(active.get(d, set()))
            ref[d.strftime("%Y-%m-%d")] = (
                dau, len(wau_users), 1000 * dau // len(wau_users)
            )
        d += pd.Timedelta(days=1)
    assert got == ref and len(got) >= 7


def test_time_weighted_avg_matches_python_integral(spark, reg, events_pd):
    """Σ value·Δt per user from a literal loop over the (ts, event_id)
    -ordered stream: the LAST observation contributes NO area, and the
    span is the closed segments only."""
    got = {
        r.user_id: (int(r.weighted_area), int(r.total_span_us))
        for r in reg["events_time_weighted_avg"].fn(spark, SF_DIR).collect()
    }
    e = events_pd.copy()
    e["us"] = _us(e["ts"])
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    ref = {}
    for uid, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        ts = grp["us"].tolist()
        v = grp["cents"].tolist()
        if len(ts) < 2:
            continue  # no closed segment -> user absent
        area = sum(v[i] * (ts[i + 1] - ts[i]) for i in range(len(ts) - 1))
        span = ts[-1] - ts[0]
        ref[uid] = (area, span)
    assert got == ref and len(got) > 0


def test_rolling_anomaly_matches_fraction_zscore(spark, reg, events_pd):
    """The anomaly rule from its textbook definition — |x - mean| >
    K*stddev over the trailing 20-row window, population variance —
    evaluated in EXACT rational arithmetic (squared on both sides:
    (x-mean)^2 > K^2 * var). The entry and its oracle share the
    cleared-denominator int64 form (n*x-s)^2 > K^2*(n*q-s^2); an
    algebra error there would pass the gate, but not this."""
    got = {
        r.event_id: (int(r.x_cents), int(r.win_n), int(r.win_sum),
                     int(r.win_sumsq), bool(r.is_anomaly))
        for r in reg["events_rolling_anomaly"].fn(spark, SF_DIR).collect()
    }
    e = events_pd.copy()
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    ref = {}
    for _, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        xs = grp["cents"].tolist()
        ids = grp["event_id"].tolist()
        for i, (eid, x) in enumerate(zip(ids, xs)):
            win = xs[max(0, i - 19): i + 1]
            n, s, q = len(win), sum(win), sum(w * w for w in win)
            mean = Fraction(s, n)
            var = Fraction(q, n) - mean * mean
            flag = n >= 5 and (Fraction(x) - mean) ** 2 > 4 * var
            ref[eid] = (x, n, s, q, flag)
    assert got == ref and len(got) == len(events_pd)


def test_running_distinct_matches_python_sets(spark, reg, events_pd):
    """Running COUNT(DISTINCT event_type) per user from a literal
    running set, against the first-occurrence-flag rewrite."""
    got = {
        r.event_id: (bool(r.is_first_of_type),
                     int(r.distinct_types_so_far))
        for r in reg["events_running_distinct"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for _, grp in events_pd.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        seen: set = set()
        for r in grp.itertuples(index=False):
            first = r.event_type not in seen
            seen.add(r.event_type)
            ref[r.event_id] = (first, len(seen))
    assert got == ref and len(got) == len(events_pd)


def test_scd2_intervals_matches_python_loop(spark, reg, events_pd):
    """SCD2 validity intervals per user from a loop: n_versions,
    exactly one open (current) version, closed span = sum of
    consecutive deltas = last_from - first_from on a contiguous
    timeline."""
    got = {
        r.user_id: (int(r.n_versions), int(r.n_current),
                    int(r.closed_span_us), int(r.first_from_us),
                    int(r.last_from_us))
        for r in reg["events_scd2_intervals"].fn(spark, SF_DIR).collect()
    }
    e = events_pd.copy()
    e["us"] = _us(e["ts"])
    ref = {}
    for uid, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        ts = grp["us"].tolist()
        closed = sum(b - a for a, b in zip(ts, ts[1:]))
        ref[uid] = (len(ts), 1, closed, ts[0], ts[-1])
    assert got == ref and len(got) > 0


def test_gapfill_locf_matches_python_loop(spark, reg, events_pd):
    """Hourly gap-fill fence-posts from a loop: spine is h0..h1
    INCLUSIVE per user, the per-hour value is the LAST event's (by ts
    then event_id), gaps carry the previous value forward, and the
    first spine hour is never a gap."""
    got = {
        (r.user_id, r.hour): (
            None if r.value_cents is None else int(r.value_cents),
            bool(r.is_gap),
        )
        for r in reg["events_gapfill_locf"].fn(spark, SF_DIR).collect()
    }
    e = events_pd.copy()
    e["hour"] = e["ts"].dt.floor("h")
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    ref = {}
    for uid, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        by_hour = {}  # hour -> last value in (ts, event_id) order
        for r in grp.itertuples(index=False):
            by_hour[r.hour] = int(r.cents)
        h, h1 = min(by_hour), max(by_hour)
        carried = None
        while h <= h1:
            if h in by_hour:
                carried = by_hour[h]
                gap = False
            else:
                gap = True
            ref[(uid, h.strftime("%Y-%m-%d %H"))] = (carried, gap)
            h += pd.Timedelta(hours=1)
    assert got == ref and len(got) > 0


def test_type_transitions_matches_python_bigrams(spark, reg, events_pd):
    """Markov transition matrix from literal per-user bigram counting;
    p_next re-derived as the same int/int double division."""
    got = {
        (r.prev_type, r.next_type): (int(r.n), float(r.p_next))
        for r in reg["events_type_transitions"].fn(spark, SF_DIR).collect()
    }
    counts: dict = defaultdict(int)
    for _, grp in events_pd.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            counts[(a, b)] += 1
    per_prev: dict = defaultdict(int)
    for (a, _), n in counts.items():
        per_prev[a] += n
    ref = {
        pair: (n, n / per_prev[pair[0]]) for pair, n in counts.items()
    }
    assert got == ref and len(got) > 0


def test_equidepth_histogram_matches_python_integer_div(spark, reg,
                                                        events_pd):
    """Equi-depth buckets re-derived with INTEGER floor division
    (min(8*cum_before // total, 7)) over the sorted distinct cent
    values — the oracle's arithmetic; the Spark side floors a DOUBLE
    division, so this also pins that the two round identically on
    this domain."""
    got = {
        int(r.bucket): (int(r.n_events), int(r.lo_cents),
                        int(r.hi_cents), int(r.n_distinct))
        for r in reg["events_equidepth_histogram"].fn(spark, SF_DIR)
        .collect()
    }
    cents = np.floor(events_pd["value"].values * 100).astype("int64")
    vals, counts = np.unique(cents, return_counts=True)
    total = int(counts.sum())
    agg: dict = {}
    cum_before = 0
    for v, n in zip(vals.tolist(), counts.tolist()):
        b = min(8 * cum_before // total, 7)
        ne, lo, hi, nd = agg.get(b, (0, v, v, 0))
        agg[b] = (ne + n, min(lo, v), max(hi, v), nd + 1)
        cum_before += n
    assert got == agg and len(got) == 8


def test_ntile_matches_sql_standard_rule(spark, reg):
    """NTILE(4) from the SQL-standard definition — n rows split into
    4 buckets, the first n%4 buckets one row larger — plus first/last
    over the full frame, all re-derived per nation with a loop."""
    got = {
        r.c_custkey: (int(r.quartile), int(r.poorest_in_nation),
                      int(r.richest_in_nation))
        for r in reg["window_ntile_first_last"].fn(spark, SF_DIR).collect()
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
        n, k = len(rows), 4
        base, extra = divmod(n, k)
        first, last = rows[0].c_custkey, rows[-1].c_custkey
        i = 0
        for b in range(1, k + 1):
            size = base + (1 if b <= extra else 0)
            for _ in range(size):
                if i < n:
                    ref[rows[i].c_custkey] = (b, int(first), int(last))
                    i += 1
    assert got == ref and len(got) > 0


def test_pareto_matches_python_cumsum(spark, reg):
    """The scale-safe two-pass range-partitioned prefix sum vs one
    python sort+cumsum: rank, running total, and the integer-exact
    80% flag must all agree — this independently verifies the whole
    distributed prefix-sum machinery (slice offsets, checkpointed
    pids, broadcast-join merge)."""
    got = {
        int(r.l_partkey): (int(r.rev_cents), int(r.rnk),
                           int(r.cum_cents), bool(r.in_top80))
        for r in reg["parts_pareto"].fn(spark, SF_DIR).collect()
    }
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice"],
    )
    li["cents"] = np.floor(li["l_extendedprice"].values * 100).astype(
        "int64"
    )
    rev = li.groupby("l_partkey")["cents"].sum().to_dict()
    order = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(rev.values())
    ref = {}
    cum = 0
    for rnk, (pk, rc) in enumerate(order, start=1):
        cum += rc
        ref[int(pk)] = (int(rc), rnk, cum, cum * 100 <= total * 80)
    assert got == ref and len(got) > 0


def test_rfm_matches_python_loop(spark, reg):
    """RFM per customer from a loop: days since last order against
    the corpus max date, order count, exact cents total, and the
    <=30d & >=3 orders flag."""
    got = {
        int(r.custkey): (int(r.recency_days), int(r.frequency),
                         int(r.monetary_cents), bool(r.is_active_repeat))
        for r in reg["orders_rfm"].fn(spark, SF_DIR).collect()
    }
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    dmax = o["o_orderdate"].max()
    ref = {}
    for ck, grp in o.groupby("o_custkey"):
        rec = (pd.Timestamp(dmax) - pd.Timestamp(grp["o_orderdate"].max()))
        rec_days = rec.days
        freq = len(grp)
        mon = int(np.floor(grp["o_totalprice"].values * 100).sum())
        ref[int(ck)] = (rec_days, freq, mon,
                        rec_days <= 30 and freq >= 3)
    assert got == ref and len(got) > 0
