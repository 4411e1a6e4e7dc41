"""Third-opinion audit, adversarial corpus batch 2 (r16): exact-
boundary matches, singleton partitions, and degenerate groups over
handcrafted events / customer / orders tables.

Branches the synthetic corpus cannot be relied on to exercise:

* as-of join with a purchase at EXACTLY the click's timestamp
  (allow_exact_matches — backward-inclusive) and a purchase one
  microsecond later (must NOT match).
* range join with pairs at exactly 0 and exactly 1 hour apart (both
  IN) and one microsecond past (OUT).
* sessionize with consecutive events exactly 1800 s apart (same
  session) and 1801 s apart (split).
* funnel with a user whose purchase PRECEDES the first view (must not
  convert) and a click-without-purchase user.
* percent_rank on a single-row partition (the 0/0 -> 0 branch) and
  NTILE over a partition smaller than the bucket count.
* customer_order_gaps for a single-order customer (mean = 0 branch,
  NULL max gap) and two same-day orders (gap 0).
* udaf_second_max with one distinct value (NULL branch).
* events_equidepth_histogram when EVERY value ties — one bucket takes
  everything (ties share a bucket by construction).
* window_moving_avg windows shorter than 3 rows.

All compared against the same style of independent python loops.
"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction  # noqa: F401 — parity with batch 1 style

import numpy as np
import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog

T0 = pd.Timestamp("2024-04-01 00:00:00")
US = pd.Timedelta(microseconds=1)
H = pd.Timedelta(hours=1)


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


def _mk_events() -> pd.DataFrame:
    rows = []

    def ev(eid, uid, etype, dt, value=1.0):
        rows.append((eid, T0 + dt, uid, etype, value, "{}"))

    # u1: purchase EXACTLY at the click ts (inclusive backward match),
    # and a later click whose nearest purchase is 1 us in the future
    # (must not match backward)
    ev(100, 1, "purchase", H, 5.0)
    ev(101, 1, "click", H)  # same timestamp as purchase 100
    ev(102, 1, "click", 3 * H)
    ev(103, 1, "purchase", 3 * H + US, 7.0)
    # u2: range-join fence-posts — pairs at exactly 0 s, exactly 1 h,
    # and 1 h + 1 us apart
    ev(200, 2, "view", 10 * H)
    ev(201, 2, "view", 10 * H)  # dt == 0
    ev(202, 2, "view", 11 * H)  # dt == exactly 1 h from 200/201
    ev(203, 2, "view", 12 * H + US)  # 1 h + 1 us from 202 -> OUT
    # u3: sessionize — exactly 1800 s continues, 1801 s splits
    ev(300, 3, "view", 20 * H)
    ev(301, 3, "view", 20 * H + pd.Timedelta(seconds=1800))
    ev(302, 3, "view", 20 * H + pd.Timedelta(seconds=3601))
    # u4: purchase BEFORE the first view — funnel must not convert it
    ev(400, 4, "purchase", 30 * H, 9.0)
    ev(401, 4, "view", 31 * H)
    ev(402, 4, "click", 32 * H)
    # u5: click but never a purchase
    ev(500, 5, "view", 40 * H)
    ev(501, 5, "click", 41 * H)
    return pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    ).astype({"event_id": "int64", "user_id": "int64"})


def _mk_customer() -> pd.DataFrame:
    # nation 0: ONE customer (singleton partition); nation 1: three
    # customers (< 4 buckets for NTILE); nation 2: six, with an
    # acctbal tie.
    rows = [
        (1, "a", 0, 100.00, "AUTOMOBILE"),
        (2, "b", 1, 10.00, "BUILDING"),
        (3, "c", 1, 20.00, "BUILDING"),
        (4, "d", 1, 30.00, "MACHINERY"),
        (5, "e", 2, 5.00, "HOUSEHOLD"),
        (6, "f", 2, 5.00, "HOUSEHOLD"),  # tie on acctbal
        (7, "g", 2, 7.50, "FURNITURE"),
        (8, "h", 2, -2.25, "FURNITURE"),
        (9, "i", 2, 0.00, "AUTOMOBILE"),
        (10, "j", 2, 11.00, "BUILDING"),
    ]
    return pd.DataFrame(
        rows,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    ).astype({"c_custkey": "int64", "c_nationkey": "int32"})


def _mk_orders() -> pd.DataFrame:
    d = pd.Timestamp("2024-04-10")
    rows = [
        # cust 1: single order — n_gaps 0, mean 0, NULL max gap;
        # second_max NULL (one distinct value)
        (1, 1, "O", 100.00, d, "1-URGENT"),
        # cust 2: two orders same day — gap exactly 0
        (2, 2, "F", 200.00, d, "2-HIGH"),
        (3, 2, "O", 200.00, d, "2-HIGH"),  # same price: 1 distinct
        # cust 3: three orders, distinct prices
        (4, 3, "O", 50.00, d, "3-MEDIUM"),
        (5, 3, "F", 75.00, d + pd.Timedelta(days=3), "3-MEDIUM"),
        (6, 3, "O", 60.00, d + pd.Timedelta(days=10), "4-NOT SPECIFIED"),
    ]
    df = pd.DataFrame(
        rows,
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"],
    ).astype({"o_orderkey": "int64", "o_custkey": "int64"})
    # match the driver corpus dtype exactly (an object column of
    # Timestamps round-trips through parquet as int64 otherwise)
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"]).astype(
        "datetime64[us]"
    )
    return df


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_sf2")
    _mk_events().to_parquet(d / "events.parquet", index=False)
    _mk_customer().to_parquet(d / "customer.parquet", index=False)
    _mk_orders().to_parquet(d / "orders.parquet", index=False)
    return str(d)


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def test_asof_exact_match_boundary(spark, reg, adv_dir):
    got = {
        int(r.click_id): (None if r.purchase_id is None
                          else int(r.purchase_id),
                          None if r.purchase_us is None
                          else int(r.purchase_us))
        for r in reg["asof_join_clicks_purchases"].fn(spark, adv_dir)
        .collect()
    }
    # click 101 matches purchase 100 at the SAME timestamp (inclusive);
    # click 102 must NOT see purchase 103 (1 us in the future) and
    # falls back to purchase 100; clicks of u5 have no purchase at all
    assert got[101] == (100, _us(T0 + H))
    assert got[102] == (100, _us(T0 + H))
    assert got[501] == (None, None)
    assert set(got) == {101, 102, 402, 501}
    # u4's click at +32h: the earlier (out-of-funnel-order) purchase
    # at +30h is still a valid as-of match — as-of is order-free
    assert got[402] == (400, _us(T0 + 30 * H))


def test_range_join_boundaries(spark, reg, adv_dir):
    got = sorted(
        (int(r.a_id), int(r.b_id), int(r.micros_apart))
        for r in reg["range_join_events_1h"].fn(spark, adv_dir).collect()
        if r.user_id == 2
    )
    # (200,201) dt=0 IN; (200,202),(201,202) dt=1h exactly IN;
    # (202,203) dt=1h+1us OUT; (200,203),(201,203) dt>2h OUT
    assert got == [
        (200, 201, 0),
        (200, 202, 3_600_000_000),
        (201, 202, 3_600_000_000),
    ]


def test_sessionize_exact_gap_boundary(spark, reg, adv_dir):
    got = {
        int(r.user_id): (int(r.n_sessions), int(r.n_events))
        for r in reg["events_sessionize"].fn(spark, adv_dir).collect()
    }
    # u3: 1800 s continues (300->301 same session), then 1801 s splits
    assert got[3] == (2, 3)
    # u2: events at +10h, +10h, +11h, +12h+1us -> second-truncated
    # gaps 0 s, 3600 s, 3600 s; both 3600 s gaps SPLIT (> 1800), so
    # exactly THREE sessions over four events (review finding r16:
    # asserting only n_events let a merge-at-3600s bug pass)
    assert got[2] == (3, 4)


def test_funnel_order_gating(spark, reg, adv_dir):
    got = {
        int(r.user_id): (
            None if r.view_id is None else int(r.view_id),
            None if r.click_id is None else int(r.click_id),
            None if r.purchase_id is None else int(r.purchase_id),
        )
        for r in reg["events_funnel"].fn(spark, adv_dir).collect()
    }
    # u4: purchase (400) precedes the first view (401) — click 402
    # converts but NO purchase follows it, so purchase stays None
    assert got[4] == (401, 402, None)
    # u5: view -> click, never a purchase
    assert got[5] == (500, 501, None)
    # u2/u3: views only — no click stage
    assert got[2][1] is None and got[3][1] is None
    # u1 has clicks and purchases but NO view: the funnel is view-
    # gated, so the user must be absent entirely
    assert 1 not in got and set(got) == {2, 3, 4, 5}


def test_percent_rank_singleton_partition(spark, reg, adv_dir):
    got = {
        int(r.c_custkey): (float(r.pct_rank), float(r.cume),
                           None if r.second_poorest is None
                           else int(r.second_poorest))
        for r in reg["window_percent_rank"].fn(spark, adv_dir).collect()
    }
    # nation 0 has ONE customer: percent_rank 0.0 (the 0/0 branch),
    # cume_dist 1.0, and nth_value(2) NULL
    assert got[1] == (0.0, 1.0, None)
    # nation 2's acctbal tie (custkeys 5, 6 both 5.00): unique order
    # comes from the custkey tie-break
    c = _mk_customer()
    grp = sorted(
        c[c.c_nationkey == 2].itertuples(index=False),
        key=lambda r: (r.c_acctbal, r.c_custkey),
    )
    n = len(grp)
    for i, r in enumerate(grp):
        assert got[int(r.c_custkey)] == (
            i / (n - 1), (i + 1) / n, int(grp[1].c_custkey)
        )


def test_ntile_partition_smaller_than_buckets(spark, reg, adv_dir):
    got = {
        int(r.c_custkey): int(r.quartile)
        for r in reg["window_ntile_first_last"].fn(spark, adv_dir)
        .collect()
    }
    # nation 1 has 3 rows for NTILE(4): buckets 1,2,3 — never 4
    assert [got[k] for k in (2, 3, 4)] == [1, 2, 3]
    # nation 0 singleton: bucket 1
    assert got[1] == 1


def test_order_gaps_degenerate_customers(spark, reg, adv_dir):
    got = {
        int(r.custkey): (int(r.n_orders), int(r.n_gaps),
                         int(r.total_gap_days),
                         None if r.max_gap_days is None
                         else int(r.max_gap_days),
                         int(r.mean_gap_milli))
        for r in reg["customer_order_gaps"].fn(spark, adv_dir).collect()
    }
    assert got[1] == (1, 0, 0, None, 0)  # single order: NULL max, mean 0
    assert got[2] == (2, 1, 0, 0, 0)  # same-day pair: gap exactly 0
    assert got[3] == (3, 2, 10, 7, 5000)  # gaps 3 and 7 -> mean 5.000


def test_second_max_single_distinct_value(spark, reg, adv_dir):
    got = {
        int(r.o_custkey): (None if r.second_best_cents is None
                           else int(r.second_best_cents))
        for r in reg["udaf_second_max"].fn(spark, adv_dir).collect()
    }
    assert got[1] is None  # one order
    assert got[2] is None  # two orders, ONE distinct price
    assert got[3] == 6000  # distinct cents {5000, 6000, 7500} -> 6000


def test_equidepth_all_ties_single_bucket(spark, reg, adv_dir,
                                          tmp_path_factory):
    """A corpus where EVERY value is identical: ties share a bucket,
    so bucket 0 takes everything and buckets 1..7 are empty."""
    d = tmp_path_factory.mktemp("adversarial_ties")
    e = _mk_events()
    e["value"] = 42.0
    e.to_parquet(d / "events.parquet", index=False)
    got = {
        int(r.bucket): (int(r.n_events), int(r.lo_cents),
                        int(r.hi_cents), int(r.n_distinct))
        for r in reg["events_equidepth_histogram"].fn(spark, str(d))
        .collect()
    }
    assert got == {0: (len(e), 4200, 4200, 1)}


def test_moving_avg_short_windows(spark, reg, adv_dir):
    got = {
        int(r.event_id): float(r.moving_avg)
        for r in reg["window_moving_avg"].fn(spark, adv_dir).collect()
    }
    e = _mk_events()
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    ref = {}
    for _, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        cents = grp["cents"].tolist()
        for i, eid in enumerate(grp["event_id"].tolist()):
            win = cents[max(0, i - 2): i + 1]
            ref[int(eid)] = float(sum(win)) / (100.0 * len(win))
    assert got == ref
    # each user's FIRST event has a 1-row window: avg == its own value
    assert got[100] == 5.0 and got[200] == 1.0


def test_running_distinct_multiple_types_same_user(spark, reg, adv_dir):
    got = {
        int(r.event_id): (bool(r.is_first_of_type),
                          int(r.distinct_types_so_far))
        for r in reg["events_running_distinct"].fn(spark, adv_dir)
        .collect()
    }
    e = _mk_events()
    ref = {}
    for _, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        seen: set = set()
        for r in grp.itertuples(index=False):
            first = r.event_type not in seen
            seen.add(r.event_type)
            ref[int(r.event_id)] = (first, len(seen))
    assert got == ref
    # u1 (view, purchase at the same ts, then click...): check u4's
    # purchase->view->click ordering yields 1,2,3 distinct
    assert [got[i][1] for i in (400, 401, 402)] == [1, 2, 3]


def test_listagg_segments_per_nation(spark, reg, adv_dir):
    got = {
        int(r.c_nationkey): (r.segments, int(r.n_segments))
        for r in reg["agg_string_listagg"].fn(spark, adv_dir).collect()
    }
    c = _mk_customer()
    ref = {}
    for nk, grp in c.groupby("c_nationkey"):
        segs = sorted(set(grp["c_mktsegment"]))
        ref[int(nk)] = (",".join(segs), len(segs))
    assert got == ref
    assert got[0] == ("AUTOMOBILE", 1)  # singleton nation
