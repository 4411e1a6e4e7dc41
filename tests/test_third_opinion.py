"""Third-opinion audit of spec-level semantics (r16).

The oracle gate proves Spark == DuckDB, but both sides of every entry
were written by the same hand: a MISREADING of an operator's semantics
would be implemented consistently in both engines and sail through the
hash compare. These tests add an INDEPENDENT implementation of the
trickiest specs — pandas.merge_asof (the public canonical as-of join),
numpy percentiles, hashlib, and hand-rolled brute force — over the
sf0.001 parquet, so a shared misunderstanding has a third party to
disagree with. Chosen entries: as-of join (tie and NULL rules), banded
range join (bound inclusivity), recursive date spine (fence-posts),
SQL-standard percentile_disc/cont (index formulae), IGNORE NULLS
window navigation (strictly-before vs including-current), and exact
dedup (canonicalization + SHA-256 bytes).

Everything here is brute force ON PURPOSE — the point is a different
algorithm, not a fast one; sf0.001 keeps it sub-second.
"""

from __future__ import annotations

import hashlib
import math
import re

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
    """datetime64 → epoch microseconds (matching Spark unix_micros)."""
    return ts.astype("datetime64[us]").astype("int64")


def test_asof_join_matches_pandas_merge_asof(spark, reg, events_pd):
    """pandas.merge_asof(direction='backward', allow_exact_matches) is
    the public reference implementation of the as-of join our operator
    and the DuckDB ASOF oracle both claim to compute. Per-click the
    matched purchase TIMESTAMP must agree everywhere; the matched
    purchase IDENTITY is only well-defined when the user has a single
    purchase at that timestamp (both engines may break exact-ts ties
    arbitrarily), so the id compare is restricted to unique-ts
    matches."""
    got = (
        reg["asof_join_clicks_purchases"].fn(spark, SF_DIR)
        .toPandas()
        .sort_values("click_id")
        .reset_index(drop=True)
    )
    clicks = (
        events_pd[events_pd.event_type == "click"]
        [["event_id", "user_id", "ts"]].sort_values("ts", kind="stable")
    )
    purchases = (
        events_pd[events_pd.event_type == "purchase"]
        [["event_id", "user_id", "ts", "value"]]
        .sort_values("ts", kind="stable")
    )
    # merge_asof keeps only the LEFT 'on' column; carry the matched
    # purchase timestamp as an explicit payload column
    purchases = purchases.assign(ts_p=purchases["ts"])
    ref = pd.merge_asof(
        clicks, purchases, on="ts", by="user_id",
        direction="backward", allow_exact_matches=True,
        suffixes=("_c", "_p"),
    ).sort_values("event_id_c").reset_index(drop=True)

    assert len(got) == len(ref) > 0
    assert got["click_id"].tolist() == ref["event_id_c"].tolist()
    got_p_us = got["purchase_us"].astype("float64")
    ref_p_us = pd.Series(
        np.where(ref["ts_p"].notna(), _us(ref["ts_p"].fillna(ref["ts"])),
                 np.nan)
    )
    assert np.array_equal(got_p_us.values, ref_p_us.values, equal_nan=True)
    # identity compare where the matched (user, ts) purchase is unique
    p_counts = purchases.groupby(["user_id", "ts"]).size()
    for i in range(len(got)):
        if pd.isna(ref.loc[i, "ts_p"]):
            assert pd.isna(got.loc[i, "purchase_id"])
            continue
        key = (ref.loc[i, "user_id"], ref.loc[i, "ts_p"])
        if p_counts[key] == 1:
            assert got.loc[i, "purchase_id"] == ref.loc[i, "event_id_p"], i


def test_range_join_matches_bruteforce(spark, reg, events_pd):
    """Bound inclusivity fence-posts: pairs with dt == 0 and
    dt == exactly 1 hour must both be IN (the oracle's >= and <=).
    Reference is a plain per-user cross product."""
    got = sorted(
        map(
            tuple,
            reg["range_join_events_1h"].fn(spark, SF_DIR)
            .toPandas()[["user_id", "a_id", "b_id", "micros_apart"]]
            .itertuples(index=False),
        )
    )
    e = events_pd[["event_id", "user_id", "ts"]].copy()
    e["us"] = _us(e["ts"])
    m = e.merge(e, on="user_id", suffixes=("_a", "_b"))
    m = m[
        (m.event_id_a < m.event_id_b)
        & (m.us_b >= m.us_a)
        & (m.us_b <= m.us_a + 3_600_000_000)
    ]
    ref = sorted(
        (int(r.user_id), int(r.event_id_a), int(r.event_id_b),
         int(r.us_b - r.us_a))
        for r in m.itertuples(index=False)
    )
    assert got == ref and len(got) > 0


def test_date_spine_matches_python(spark, reg, events_pd):
    """Fence-posts of the recursive spine: exactly the 30 days of
    2024-01-01..2024-01-30, zero-filled, counts from a hand loop."""
    got = {
        r.day: int(r.n_events)
        for r in reg["recursive_date_spine"].fn(spark, SF_DIR).collect()
    }
    by_day = events_pd["ts"].dt.strftime("%Y-%m-%d").value_counts()
    ref = {}
    for off in range(30):
        d = (pd.Timestamp("2024-01-01") + pd.Timedelta(days=off))
        key = d.strftime("%Y-%m-%d")
        ref[key] = int(by_day.get(key, 0))
    assert got == ref
    assert len(got) == 30


def test_percentiles_match_numpy(spark, reg):
    """PERCENTILE_DISC per the SQL standard (smallest value whose
    cume_dist >= q: sorted[ceil(q*n)-1]) and PERCENTILE_CONT(0.5) as
    numpy's linear interpolation — implemented from the definitions,
    not from either engine."""
    got = {
        r.l_returnflag: (int(r.p25_cents), float(r.median_cents),
                         int(r.p90_cents))
        for r in reg["agg_percentile_standard"].fn(spark, SF_DIR).collect()
    }
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    )
    li["cents"] = np.floor(li["l_extendedprice"].values * 100).astype(
        "int64"
    )

    def disc(vals: np.ndarray, q: float) -> int:
        s = np.sort(vals)
        return int(s[math.ceil(q * len(s)) - 1])

    ref = {}
    for flag, grp in li.groupby("l_returnflag"):
        v = grp["cents"].values
        ref[flag] = (
            disc(v, 0.25),
            float(np.percentile(v, 50, method="linear")),
            disc(v, 0.9),
        )
    assert got == ref and len(got) >= 2


def test_ignore_nulls_window_matches_pandas_ffill(spark, reg, events_pd):
    """lag(v) IGNORE NULLS == previous non-null STRICTLY BEFORE the
    row (shift-then-ffill); last_value IGNORE NULLS including the
    current row == plain ffill. The strictly-before/inclusive split is
    exactly the off-by-one a shared misreading would get wrong in both
    engines."""
    got = (
        reg["window_ignore_nulls"].fn(spark, SF_DIR)
        .toPandas().set_index("event_id").sort_index()
    )
    e = events_pd[events_pd.event_id < 2000][
        ["event_id", "user_id", "event_type", "value"]
    ].copy()
    v = np.where(
        e["event_type"] == "purchase",
        np.floor(e["value"].values * 100),
        np.nan,
    )
    e["v"] = v
    e = e.sort_values(["user_id", "event_id"], kind="stable")
    e["prev_val"] = e.groupby("user_id")["v"].transform(
        lambda s: s.shift(1).ffill()
    )
    e["last_seen"] = e.groupby("user_id")["v"].transform("ffill")
    ref = e.set_index("event_id").sort_index()
    for col in ("prev_val", "last_seen"):
        assert np.array_equal(
            got[col].astype("float64").values,
            ref[col].astype("float64").values,
            equal_nan=True,
        ), col
    assert len(got) > 0


def test_exact_dedup_matches_python_hashlib(spark, reg):
    """Canonicalization spec re-implemented from its English
    description (ASCII-\\s collapse — Java and RE2 \\s are ASCII-only —
    then trim, then lowercase) and hashed with hashlib: fingerprints,
    keep ids, and dup counts must all agree. NULL texts hash to NULL
    and group together, matching GROUP BY semantics in both engines."""
    got = {
        r.content_fp: (r.keep_id, int(r.dup_cnt))
        for r in reg["dedup_exact"].fn(spark, SF_DIR).collect()
    }
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    ref: dict = {}
    for r in docs.itertuples(index=False):
        if r.text is None or (isinstance(r.text, float) and pd.isna(r.text)):
            fp = None
        else:
            canon = re.sub(
                r"[ \t\n\x0b\f\r]+", " ", str(r.text)
            ).strip(" ").lower()
            fp = hashlib.sha256(canon.encode("utf-8")).hexdigest()
        keep, cnt = ref.get(fp, (None, 0))
        keep = r.doc_id if keep is None else min(keep, r.doc_id)
        ref[fp] = (keep, cnt + 1)
    assert got == ref and len(got) > 0


def test_funnel_matches_python_loop(spark, reg, events_pd):
    """The funnel's ORDERED gating (first view → first click strictly
    AFTER it → first purchase strictly AFTER that, event_id as the
    total order) re-derived with a per-user python loop; outer-join
    semantics keep users who fell out mid-funnel."""
    got = {
        r.user_id: (r.view_id, r.click_id, r.purchase_id)
        for r in reg["events_funnel"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for uid, grp in events_pd.groupby("user_id"):
        views = grp[grp.event_type == "view"]["event_id"]
        if views.empty:
            continue
        view_id = int(views.min())
        clicks = grp[
            (grp.event_type == "click") & (grp.event_id > view_id)
        ]["event_id"]
        click_id = int(clicks.min()) if not clicks.empty else None
        purchase_id = None
        if click_id is not None:
            ps = grp[
                (grp.event_type == "purchase") & (grp.event_id > click_id)
            ]["event_id"]
            purchase_id = int(ps.min()) if not ps.empty else None
        ref[uid] = (view_id, click_id, purchase_id)
    assert got == ref and len(got) > 0


def test_sessionize_matches_python_loop(spark, reg, events_pd):
    """The 30-minute gap rule's fence-post (> 1800 s on SECOND-
    truncated epochs — 1800 exactly continues the session) re-derived
    with a per-user loop over (ts, event_id)-sorted events."""
    got = {
        r.user_id: (int(r.n_sessions), int(r.n_events))
        for r in reg["events_sessionize"].fn(spark, SF_DIR).collect()
    }
    e = events_pd[["user_id", "ts", "event_id"]].copy()
    e["sec"] = _us(e["ts"]) // 1_000_000  # floor to whole seconds
    ref = {}
    for uid, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        secs = grp["sec"].tolist()
        n_sessions = 1 + sum(
            1 for a, b in zip(secs, secs[1:]) if b - a > 1800
        )
        ref[uid] = (n_sessions, len(secs))
    assert got == ref and len(got) > 0


def test_hypertable_rollup_matches_direct_daily(spark, reg, events_pd):
    """The cascading hourly→daily rollup must equal a DIRECT daily
    aggregation (count/sum associativity is the whole premise of the
    continuous-aggregate design) — computed here without the hourly
    layer at all."""
    got = {
        r.day: (int(r.n_events), int(r.sum_value_cents))
        for r in reg["hypertable_rollup"].fn(spark, SF_DIR).collect()
    }
    e = events_pd.copy()
    e["day"] = e["ts"].dt.strftime("%Y-%m-%d")
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    ref = {
        day: (int(len(g)), int(g["cents"].sum()))
        for day, g in e.groupby("day")
    }
    assert got == ref and len(got) > 0


def test_ann_cosine_topk_matches_numpy(spark, reg):
    """Brute-force cosine top-10 re-derived in numpy with the entry's
    own documented math (floor(x*1000) int64 quantization — dot and
    norms exact in int64 — then cos = dot / (sqrt(na)*sqrt(nb)) in
    double): neighbors, ranks, AND bit-exact cos values must agree.
    Tie rank is (cos desc, neighbor asc), deterministic on both
    sides."""
    got = sorted(
        (int(r.query_id), int(r.rank), int(r.neighbor_id),
         float(r.cos_sim))
        for r in reg["ann_cosine_topk"].fn(spark, SF_DIR).collect()
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    v = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype("float64") * 1000
    ).astype("int64")
    norms = (v * v).sum(axis=1)
    ref = []
    for qpos in np.where(ids < 5)[0]:
        qid = int(ids[qpos])
        dots = v @ v[qpos]
        cos = dots.astype("float64") / (
            np.sqrt(norms.astype("float64"))
            * math.sqrt(float(norms[qpos]))
        )
        order = sorted(
            (i for i in range(len(ids)) if int(ids[i]) != qid),
            key=lambda i: (-cos[i], int(ids[i])),
        )[:10]
        ref.extend(
            (qid, rank + 1, int(ids[i]), float(cos[i]))
            for rank, i in enumerate(order)
        )
    assert got == sorted(ref) and len(got) == 50


def test_session_window_matches_python_interval_merge(spark, reg,
                                                      events_pd):
    """Spark's session_window gap rule, settled EMPIRICALLY (r16):
    two events exactly gap apart MERGE (the boundary is inclusive —
    new session iff gap > 30 min, matching the oracle's strict >).
    The docs' half-open [start, start+gap) notation suggests the
    opposite, so the boundary is pinned here with a two-row probe,
    and the whole entry re-derived with a python interval merge at
    microsecond precision."""
    from pyspark.sql import functions as F

    # the boundary probe: exactly-1800s apart -> ONE session
    probe = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00.000000"),
         (1, "2024-01-01 00:30:00.000000")],
        "user_id int, s string",
    ).select("user_id", F.to_timestamp("s").alias("ts"))
    merged = (
        probe.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count().collect()
    )
    assert len(merged) == 1 and merged[0]["count"] == 2

    got = sorted(
        (r.user_id, r.session_start, int(r.n_events))
        for r in reg["stream_session_window"].fn(spark, SF_DIR).collect()
    )
    e = events_pd[["user_id", "ts", "event_id"]].copy()
    e["us"] = _us(e["ts"])
    ref = []
    for uid, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        us = grp["us"].tolist()
        start, n = us[0], 1
        for prev, cur in zip(us, us[1:]):
            if cur - prev > 1_800_000_000:  # strict >: 1800s merges
                ref.append((uid, start, n))
                start, n = cur, 1
            else:
                n += 1
        ref.append((uid, start, n))
    ref = sorted(
        (uid,
         pd.Timestamp(start, unit="us").strftime("%Y-%m-%d %H:%M:%S.%f"),
         n)
        for uid, start, n in ref
    )
    assert got == ref and len(got) > 0


def test_tumbling_window_matches_python_bucketing(spark, reg, events_pd):
    """Tumbling 1h windows re-derived with integer floor-bucketing of
    epoch microseconds — alignment (epoch-anchored starts) and the
    per-bucket count/sum both pinned from the definition."""
    got = sorted(
        (r.win_start, r.event_type, int(r.n_events), int(r.value_cents))
        for r in reg["stream_tumbling_window"].fn(spark, SF_DIR).collect()
    )
    e = events_pd.copy()
    us = _us(e["ts"])
    e["win"] = ((us - us % 3_600_000_000) // 1_000_000).map(
        lambda s: pd.Timestamp(s, unit="s").strftime("%Y-%m-%d %H:%M:%S")
    )
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    ref = sorted(
        (win, et, int(len(g)), int(g["cents"].sum()))
        for (win, et), g in e.groupby(["win", "event_type"])
    )
    assert got == ref and len(got) > 0


def test_sliding_window_matches_python_two_starts(spark, reg, events_pd):
    """Sliding 1h/30min: every event lands in EXACTLY the two
    30-min-aligned window starts within its preceding hour — derived
    here by explicit enumeration of both starts per event."""
    got = sorted(
        (r.win_start, int(r.n_events))
        for r in reg["stream_sliding_window"].fn(spark, SF_DIR).collect()
    )
    us = _us(events_pd["ts"])
    buckets: dict = {}
    for u in us:
        aligned = u - u % 1_800_000_000
        for start in (aligned, aligned - 1_800_000_000):
            key = pd.Timestamp(start // 1_000_000, unit="s").strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            buckets[key] = buckets.get(key, 0) + 1
    ref = sorted(buckets.items())
    assert got == [(w, int(n)) for w, n in ref] and len(got) > 0
