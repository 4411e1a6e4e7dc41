"""Third-opinion audit, batch 17 (r17): the TPC-H adaptation suite
(q1–q22) re-derived in plain python over the parquet files.

The q* entries' oracle IS the published TPC-H spec adapted to the
sandbox schema, so Spark and DuckDB share one SQL reading; these
audits add a third, SQL-free reading: every query re-implemented as
dict/loop aggregation over pandas-read parquet (no Spark expressions,
no DuckDB, no product helpers). All money math is integer cents via
floor(x*100) — IEEE float64 multiply then floor, the same exactly-
rounded ops in the same association order — so every comparison is
exact except q1's two averages (a single division of two exact
integers, still deterministic in float64).

Entries audited here: q1_pricing_summary .. q22_global_sales_
opportunity (all 22).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR, SF_DIR_ORACLE

TS = pd.Timestamp


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401

    return catalog.registry()


@pytest.fixture(scope="module")
def T():
    return {
        t: pd.read_parquet(f"{SF_DIR}/{t}.parquet")
        for t in ("lineitem", "orders", "customer", "supplier",
                  "nation", "region", "part")
    }


def cents(x: float) -> int:
    return math.floor(x * 100)


def _got(reg, spark, name: str, cols: list[str]) -> list[tuple]:
    df = reg[name].fn(spark, SF_DIR).select(*cols)
    return [tuple(r) for r in df.collect()]


def test_q1(reg, spark, T):
    acc: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        if r.l_shipdate > TS("1999-12-01"):
            continue
        k = (r.l_returnflag, r.l_linestatus)
        a = acc.setdefault(k, [0, 0, 0, 0, 0])
        a[0] += cents(r.l_quantity)
        a[1] += cents(r.l_extendedprice)
        a[2] += math.floor(r.l_extendedprice * (1.0 - r.l_discount) * 100)
        a[3] += math.floor(
            r.l_extendedprice * (1.0 - r.l_discount) * (1.0 + r.l_tax) * 100
        )
        a[4] += 1
    want = sorted(
        (rf, ls, a[0], a[1], a[2], a[3],
         a[0] / (100.0 * a[4]), a[1] / (100.0 * a[4]), a[4])
        for (rf, ls), a in acc.items()
    )
    got = sorted(_got(reg, spark, "q1_pricing_summary", [
        "l_returnflag", "l_linestatus", "sum_qty_cents",
        "sum_base_price_cents", "sum_disc_price_cents",
        "sum_charge_cents", "avg_qty", "avg_price", "count_order",
    ]))
    assert got == want


def test_q2(reg, spark, T):
    # min lineitem cost per (part, supp), restricted to EUROPE supps,
    # then per-part minimum cost rows over LARGE small parts
    costs: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        k = (r.l_partkey, r.l_suppkey)
        c = cents(r.l_extendedprice)
        costs[k] = min(costs.get(k, c), c)
    nat = {r.n_nationkey: (r.n_name, r.n_regionkey)
           for r in T["nation"].itertuples(index=False)}
    reg_name = {r.r_regionkey: r.r_name
                for r in T["region"].itertuples(index=False)}
    supp = {r.s_suppkey: r for r in T["supplier"].itertuples(index=False)}
    eu = []  # (partkey, cost, s_acctbal, s_name, n_name, s_suppkey)
    for (pk, sk), c in costs.items():
        s = supp[sk]
        n_name, rk = nat[s.s_nationkey]
        if reg_name[rk] != "EUROPE":
            continue
        eu.append((pk, c, s.s_acctbal, s.s_name, n_name))
    min_cost: dict = {}
    for pk, c, *_rest in eu:
        min_cost[pk] = min(min_cost.get(pk, c), c)
    parts = {r.p_partkey: r for r in T["part"].itertuples(index=False)}
    want = []
    for pk, c, bal, sname, nname in eu:
        p = parts.get(pk)
        if p is None or p.p_size > 10 or p.p_type != "LARGE":
            continue
        if c != min_cost[pk]:
            continue
        want.append((bal, sname, nname, pk, p.p_name, c))
    want.sort(key=lambda t: (-t[0], t[2], t[1], t[3]))
    got = _got(reg, spark, "q2_min_cost_supplier", [
        "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
        "cost_cents",
    ])
    assert got == want


def test_q3(reg, spark, T):
    bld = {r.c_custkey for r in T["customer"].itertuples(index=False)
           if r.c_mktsegment == "BUILDING"}
    od = {r.o_orderkey: r.o_orderdate
          for r in T["orders"].itertuples(index=False)
          if r.o_custkey in bld and r.o_orderdate < TS("1998-03-15")}
    acc: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        if r.l_orderkey in od and r.l_shipdate > TS("1998-03-15"):
            acc[r.l_orderkey] = acc.get(r.l_orderkey, 0) + math.floor(
                r.l_extendedprice * (1.0 - r.l_discount) * 100
            )
    rows = sorted(
        ((ok, v, od[ok].strftime("%Y-%m-%d")) for ok, v in acc.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = _got(reg, spark, "q3_shipping_priority",
               ["o_orderkey", "revenue_cents", "orderdate"])
    assert got == rows


def test_q4(reg, spark, T):
    ship = {}
    for r in T["lineitem"].itertuples(index=False):
        ship.setdefault(r.l_orderkey, []).append(r.l_shipdate)
    acc: dict = {}
    for o in T["orders"].itertuples(index=False):
        if not (TS("1996-07-01") <= o.o_orderdate < TS("1996-10-01")):
            continue
        late = o.o_orderdate + pd.Timedelta(days=60)
        if any(sd > late for sd in ship.get(o.o_orderkey, [])):
            acc[o.o_orderpriority] = acc.get(o.o_orderpriority, 0) + 1
    got = sorted(_got(reg, spark, "q4_order_priority",
                      ["o_orderpriority", "order_count"]))
    assert got == sorted(acc.items())


def test_q5(reg, spark, T):
    nat = {r.n_nationkey: (r.n_name, r.n_regionkey)
           for r in T["nation"].itertuples(index=False)}
    asia = {k for k, (_n, rk) in nat.items()
            if {r.r_regionkey: r.r_name
                for r in T["region"].itertuples(index=False)}[rk] == "ASIA"}
    cust_nat = {r.c_custkey: r.c_nationkey
                for r in T["customer"].itertuples(index=False)}
    supp_nat = {r.s_suppkey: r.s_nationkey
                for r in T["supplier"].itertuples(index=False)}
    ord_cust = {r.o_orderkey: r.o_custkey
                for r in T["orders"].itertuples(index=False)
                if TS("1995-01-01") <= r.o_orderdate < TS("1997-01-01")}
    acc: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        ck = ord_cust.get(r.l_orderkey)
        if ck is None:
            continue
        cn = cust_nat[ck]
        if cn not in asia or supp_nat.get(r.l_suppkey) != cn:
            continue
        name = nat[cn][0]
        acc[name] = acc.get(name, 0) + math.floor(
            r.l_extendedprice * (1.0 - r.l_discount) * 100
        )
    got = sorted(_got(reg, spark, "q5_local_supplier_volume",
                      ["n_name", "revenue_cents"]))
    assert got == sorted(acc.items())


def test_q6(reg, spark, T):
    rev = n = 0
    for r in T["lineitem"].itertuples(index=False):
        if (TS("1996-01-01") <= r.l_shipdate < TS("1997-01-01")
                and 0.03 <= r.l_discount <= 0.07 and r.l_quantity < 24.0):
            rev += math.floor(r.l_extendedprice * r.l_discount * 100)
            n += 1
    assert _got(reg, spark, "q6_forecast_revenue",
                ["revenue_cents", "n_rows"]) == [(rev, n)]


def test_q7(reg, spark, T):
    nat = {r.n_nationkey: r.n_name
           for r in T["nation"].itertuples(index=False)}
    supp_nat = {r.s_suppkey: nat[r.s_nationkey]
                for r in T["supplier"].itertuples(index=False)}
    cust_nat = {r.c_custkey: nat[r.c_nationkey]
                for r in T["customer"].itertuples(index=False)}
    ord_cust = {r.o_orderkey: r.o_custkey
                for r in T["orders"].itertuples(index=False)}
    acc: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        sn = supp_nat.get(r.l_suppkey)
        cn = cust_nat.get(ord_cust.get(r.l_orderkey))
        if {sn, cn} != {"NATION_1", "NATION_2"}:
            continue
        k = (sn, cn, r.l_shipdate.year)
        acc[k] = acc.get(k, 0) + math.floor(
            r.l_extendedprice * (1.0 - r.l_discount) * 100
        )
    want = sorted((sn, cn, y, v) for (sn, cn, y), v in acc.items())
    got = _got(reg, spark, "q7_volume_shipping",
               ["supp_nation", "cust_nation", "l_year", "revenue_cents"])
    assert got == want


def test_q8(reg, spark, T):
    nat = {r.n_nationkey: (r.n_name, r.n_regionkey)
           for r in T["nation"].itertuples(index=False)}
    regn = {r.r_regionkey: r.r_name
            for r in T["region"].itertuples(index=False)}
    promo = {r.p_partkey for r in T["part"].itertuples(index=False)
             if r.p_type == "PROMO"}
    cust_ok = {r.c_custkey for r in T["customer"].itertuples(index=False)
               if regn[nat[r.c_nationkey][1]] == "AMERICA"}
    orders = {r.o_orderkey: (r.o_custkey, r.o_orderdate.year)
              for r in T["orders"].itertuples(index=False)}
    supp_nat = {r.s_suppkey: nat[r.s_nationkey][0]
                for r in T["supplier"].itertuples(index=False)}
    acc: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        if r.l_partkey not in promo or r.l_orderkey not in orders:
            continue
        ck, yr = orders[r.l_orderkey]
        if ck not in cust_ok:
            continue
        v = math.floor(r.l_extendedprice * (1.0 - r.l_discount) * 100)
        a = acc.setdefault(yr, [0, 0])
        if supp_nat.get(r.l_suppkey) == "NATION_5":
            a[0] += v
        a[1] += v
    want = sorted((y, a[0], a[1]) for y, a in acc.items())
    got = _got(reg, spark, "q8_market_share",
               ["o_year", "nation_cents", "total_cents"])
    assert got == want


def test_q9(reg, spark, T):
    red = {r.p_partkey: r.p_retailprice
           for r in T["part"].itertuples(index=False)
           if r.p_name.startswith("red")}
    nat = {r.n_nationkey: r.n_name
           for r in T["nation"].itertuples(index=False)}
    supp_nat = {r.s_suppkey: nat[r.s_nationkey]
                for r in T["supplier"].itertuples(index=False)}
    ord_year = {r.o_orderkey: r.o_orderdate.year
                for r in T["orders"].itertuples(index=False)}
    acc: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        rp = red.get(r.l_partkey)
        if rp is None or r.l_orderkey not in ord_year:
            continue
        k = (supp_nat[r.l_suppkey], ord_year[r.l_orderkey])
        acc[k] = acc.get(k, 0) + math.floor(
            (r.l_extendedprice * (1.0 - r.l_discount)
             - rp * r.l_quantity) * 100
        )
    want = sorted(((n, y, v) for (n, y), v in acc.items()),
                  key=lambda t: (t[0], -t[1]))
    got = _got(reg, spark, "q9_product_type_profit",
               ["nation", "o_year", "profit_cents"])
    assert got == want


def test_q10(reg, spark, T):
    cust = {r.c_custkey: r for r in T["customer"].itertuples(index=False)}
    nat = {r.n_nationkey: r.n_name
           for r in T["nation"].itertuples(index=False)}
    ord_cust = {r.o_orderkey: r.o_custkey
                for r in T["orders"].itertuples(index=False)}
    acc: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        if r.l_returnflag != "R" or r.l_orderkey not in ord_cust:
            continue
        c = cust[ord_cust[r.l_orderkey]]
        k = (c.c_custkey, c.c_name, nat[c.c_nationkey])
        acc[k] = acc.get(k, 0) + math.floor(
            r.l_extendedprice * (1.0 - r.l_discount) * 100
        )
    rows = sorted(((ck, cn, nn, v) for (ck, cn, nn), v in acc.items()),
                  key=lambda t: (-t[3], t[0]))[:20]
    got = _got(reg, spark, "q10_returned_items",
               ["c_custkey", "c_name", "n_name", "revenue_cents"])
    assert got == rows


def test_q11(reg, spark, T):
    nat = {r.n_nationkey: r.n_name
           for r in T["nation"].itertuples(index=False)}
    n3 = {r.s_suppkey for r in T["supplier"].itertuples(index=False)
          if nat[r.s_nationkey] == "NATION_3"}
    val: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        if r.l_suppkey in n3:
            val[r.l_partkey] = val.get(r.l_partkey, 0) + cents(
                r.l_extendedprice
            )
    total = sum(val.values())
    rows = sorted(((pk, v) for pk, v in val.items() if v * 500 > total),
                  key=lambda t: (-t[1], t[0]))
    got = _got(reg, spark, "q11_important_stock",
               ["l_partkey", "value_cents"])
    assert got == rows


def test_q12(reg, spark, T):
    pri = {r.o_orderkey: r.o_orderpriority
           for r in T["orders"].itertuples(index=False)}
    acc: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        if (r.l_returnflag in ("R", "A")
                and TS("1996-01-01") <= r.l_shipdate < TS("1997-01-01")
                and r.l_orderkey in pri):
            a = acc.setdefault(r.l_linestatus, [0, 0])
            hi = pri[r.l_orderkey] in ("1-URGENT", "2-HIGH")
            a[0 if hi else 1] += 1
    got = sorted(_got(reg, spark, "q12_shipmode",
                      ["l_linestatus", "high_line_count",
                       "low_line_count"]))
    assert got == sorted((k, a[0], a[1]) for k, a in acc.items())


def test_q13(reg, spark, T):
    per_cust: dict = {r.c_custkey: 0
                      for r in T["customer"].itertuples(index=False)}
    for o in T["orders"].itertuples(index=False):
        if o.o_orderpriority != "1-URGENT" and o.o_custkey in per_cust:
            per_cust[o.o_custkey] += 1
    dist: dict = {}
    for n in per_cust.values():
        dist[n] = dist.get(n, 0) + 1
    want = sorted(dist.items(), key=lambda t: (-t[1], -t[0]))
    want = [(c, d) for c, d in want]
    got = _got(reg, spark, "q13_customer_distribution",
               ["c_count", "custdist"])
    assert got == want


def test_q14(reg, spark, T):
    ptype = {r.p_partkey: r.p_type
             for r in T["part"].itertuples(index=False)}
    promo = total = 0
    for r in T["lineitem"].itertuples(index=False):
        if not (TS("1996-09-01") <= r.l_shipdate < TS("1996-10-01")):
            continue
        t = ptype.get(r.l_partkey)
        if t is None:
            continue
        v = math.floor(r.l_extendedprice * (1.0 - r.l_discount) * 100)
        if t.startswith("PROMO"):
            promo += v
        total += v
    assert _got(reg, spark, "q14_promo_effect",
                ["promo_cents", "total_cents"]) == [(promo, total)]


def test_q15(reg, spark, T):
    rev: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        if TS("1996-01-01") <= r.l_shipdate < TS("1996-04-01"):
            rev[r.l_suppkey] = rev.get(r.l_suppkey, 0) + math.floor(
                r.l_extendedprice * (1.0 - r.l_discount) * 100
            )
    top = max(rev.values())
    sname = {r.s_suppkey: r.s_name
             for r in T["supplier"].itertuples(index=False)}
    want = sorted((sk, sname[sk], v) for sk, v in rev.items()
                  if v == top and sk in sname)
    got = _got(reg, spark, "q15_top_supplier",
               ["s_suppkey", "s_name", "total_revenue_cents"])
    assert got == want


def test_q16(reg, spark, T):
    bad_supp = {r.s_suppkey for r in T["supplier"].itertuples(index=False)
                if r.s_acctbal < 0.0}
    parts = {r.p_partkey: r for r in T["part"].itertuples(index=False)}
    pairs = {(r.l_partkey, r.l_suppkey)
             for r in T["lineitem"].itertuples(index=False)}
    acc: dict = {}
    for pk, sk in pairs:
        p = parts.get(pk)
        if (p is None or p.p_brand == "Brand#1" or p.p_type == "PROMO"
                or p.p_size not in (1, 4, 9, 14, 19, 23, 36, 45)
                or sk in bad_supp):
            continue
        acc.setdefault((p.p_brand, p.p_type, p.p_size), set()).add(sk)
    want = sorted(((b, t, s, len(v)) for (b, t, s), v in acc.items()),
                  key=lambda r: (-r[3], r[0], r[1], r[2]))
    got = _got(reg, spark, "q16_parts_supplier_counts",
               ["p_brand", "p_type", "p_size", "supplier_cnt"])
    assert got == want


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_q17(reg, spark, sf_dir):
    """Runs at BOTH scale factors: at sf0.001 the filter matches zero
    rows (pinning SUM-over-empty = NULL); the oracle sf has real
    matches."""
    T = {
        t: pd.read_parquet(f"{sf_dir}/{t}.parquet")
        for t in ("lineitem", "part")
    }
    qty: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        a = qty.setdefault(r.l_partkey, [0.0, 0])
        a[0] += r.l_quantity
        a[1] += 1
    sel = {r.p_partkey for r in T["part"].itertuples(index=False)
           if r.p_brand == "Brand#23" and r.p_type == "MEDIUM"}
    rev, matched = 0, 0
    for r in T["lineitem"].itertuples(index=False):
        if r.l_partkey not in sel:
            continue
        s, n = qty[r.l_partkey]
        if r.l_quantity < 0.2 * (s / n):
            rev += cents(r.l_extendedprice)
            matched += 1
    # SQL SUM over zero rows is NULL, not 0
    got = [
        tuple(r)
        for r in reg["q17_small_quantity_revenue"]
        .fn(spark, sf_dir).select("revenue_cents").collect()
    ]
    assert got == [(rev if matched else None,)]


def test_q18(reg, spark, T):
    qsum: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        qsum[r.l_orderkey] = qsum.get(r.l_orderkey, 0) + cents(
            r.l_quantity
        )
    big = {ok for ok, v in qsum.items() if v > 21200}
    ord_cust = {r.o_orderkey: r.o_custkey
                for r in T["orders"].itertuples(index=False)}
    rows = sorted(
        ((ord_cust[ok], ok, qsum[ok]) for ok in big if ok in ord_cust),
        key=lambda t: (-t[2], t[1]),
    )[:20]
    got = _got(reg, spark, "q18_large_orders",
               ["c_custkey", "o_orderkey", "qty_cents"])
    assert got == rows


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_q19(reg, spark, sf_dir):
    """Both scale factors, for the same reason as test_q17."""
    T = {
        t: pd.read_parquet(f"{sf_dir}/{t}.parquet")
        for t in ("lineitem", "part")
    }
    parts = {r.p_partkey: r for r in T["part"].itertuples(index=False)}
    rev, matched = 0, 0
    for r in T["lineitem"].itertuples(index=False):
        p = parts.get(r.l_partkey)
        if p is None:
            continue
        q, rf = r.l_quantity, r.l_returnflag
        if ((p.p_brand == "Brand#12" and 1 <= p.p_size <= 5
             and 1 <= q <= 11 and rf == "N")
                or (p.p_brand == "Brand#23" and 1 <= p.p_size <= 10
                    and 10 <= q <= 20 and rf == "N")
                or (p.p_brand == "Brand#34" and 1 <= p.p_size <= 15
                    and 20 <= q <= 30)):
            rev += math.floor(
                r.l_extendedprice * (1.0 - r.l_discount) * 100
            )
            matched += 1
    # SQL SUM over zero rows is NULL, not 0
    got = [
        tuple(r)
        for r in reg["q19_discounted_revenue"]
        .fn(spark, sf_dir).select("revenue_cents").collect()
    ]
    assert got == [(rev if matched else None,)]


def test_q20(reg, spark, T):
    red = {r.p_partkey for r in T["part"].itertuples(index=False)
           if r.p_name.startswith("red")}
    qsum: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        if (r.l_partkey in red
                and TS("1996-01-01") <= r.l_shipdate < TS("1997-01-01")):
            qsum[r.l_suppkey] = qsum.get(r.l_suppkey, 0) + cents(
                r.l_quantity
            )
    heavy = {sk for sk, v in qsum.items() if v > 20000}
    nat = {r.n_nationkey: r.n_name
           for r in T["nation"].itertuples(index=False)}
    want = sorted(
        (r.s_name, r.s_acctbal)
        for r in T["supplier"].itertuples(index=False)
        if nat[r.s_nationkey] == "NATION_2" and r.s_suppkey in heavy
    )
    got = _got(reg, spark, "q20_promotion_suppliers",
               ["s_name", "s_acctbal"])
    assert got == want


def test_q21(reg, spark, T):
    by_order: dict = {}
    for r in T["lineitem"].itertuples(index=False):
        by_order.setdefault(r.l_orderkey, []).append(
            (r.l_suppkey, r.l_returnflag)
        )
    status = {r.o_orderkey: r.o_orderstatus
              for r in T["orders"].itertuples(index=False)}
    nat = {r.n_nationkey: r.n_name
           for r in T["nation"].itertuples(index=False)}
    s1 = {r.s_suppkey: r.s_name
          for r in T["supplier"].itertuples(index=False)
          if nat[r.s_nationkey] == "NATION_1"}
    acc: dict = {}
    for ok, lines in by_order.items():
        if status.get(ok) != "F":
            continue
        for sk, rf in lines:
            if rf != "R" or sk not in s1:
                continue
            others = [(s2, r2) for s2, r2 in lines if s2 != sk]
            if not others:
                continue
            if any(r2 == "R" for _s2, r2 in others):
                continue
            acc[s1[sk]] = acc.get(s1[sk], 0) + 1
    want = sorted(acc.items(), key=lambda t: (-t[1], t[0]))
    want = [(n, c) for n, c in want]
    got = _got(reg, spark, "q21_waiting_suppliers", ["s_name", "numwait"])
    assert got == want


def test_q22(reg, spark, T):
    keys = {1, 3, 5, 7, 9, 11, 13}
    pool = [cents(r.c_acctbal)
            for r in T["customer"].itertuples(index=False)
            if r.c_acctbal > 0.0 and r.c_nationkey in keys]
    avg = sum(pool) / len(pool)
    has_urgent = {r.o_custkey
                  for r in T["orders"].itertuples(index=False)
                  if r.o_orderpriority == "1-URGENT"}
    acc: dict = {}
    for r in T["customer"].itertuples(index=False):
        if (r.c_nationkey in keys and cents(r.c_acctbal) > avg
                and r.c_custkey not in has_urgent):
            a = acc.setdefault(r.c_nationkey, [0, 0])
            a[0] += 1
            a[1] += cents(r.c_acctbal)
    want = sorted((k, a[0], a[1]) for k, a in acc.items())
    got = _got(reg, spark, "q22_global_sales_opportunity",
               ["cntrycode", "numcust", "totacctbal_cents"])
    assert got == want
