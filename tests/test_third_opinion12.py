"""Third-opinion audit, batch 13 (r16): the core join family, basic
windows, subqueries, and the remaining pipeline singles.

* join_inner_groupby / left / right / full / semi / anti / theta /
  cross — all eight join flavors re-derived with dict/set loops,
  including the ON-clause-vs-WHERE subtlety (the extra predicate
  lives in the JOIN CONDITION for the outer joins, so non-qualifying
  customers still appear with count 0).
* window_row_number / rank_dense (tie vs dense-tie) / lag_lead /
  running_sum — literal loops.
* subquery_in_scalar — the IN filter plus a mean compare done in
  EXACT rational arithmetic (Fraction), independent of either
  engine's float summation order.
* dedup_keep_newest — latest record per key with the (ts, event_id)
  DESC tie-break.
* pipeline_clean_corpus — the headline bench composite (quality gate
  -> exact dedup -> corpus stats) replayed in python.
* text_lang_ngram — character-trigram scores over the canonical text.
* agg_distinct_count / agg_having / distinct_rows / sort_multi_key /
  topk_orders — quick loop re-derivations closing out the family.
* pipeline_incremental_dedup_indexed / _minhash_indexed /
  _ann_indexed — the PERSISTED-INDEX production variants must equal
  the same independent references as their index-free twins (batch 10
  / the numpy multiprobe): the index machinery may not change a
  single row.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from fractions import Fraction

import numpy as np
import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.operators.text import (
    LANG_TRIGRAMS,
    STOPWORDS,
)
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR
from .third_opinion_refs import _canon, _tokens


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


@pytest.fixture(scope="module")
def orders_pd():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def customer_pd():
    return pd.read_parquet(f"{SF_DIR}/customer.parquet")


def test_join_inner_groupby(spark, reg, orders_pd, customer_pd):
    got = {
        int(r.c_nationkey): (int(r.order_cnt), int(r.total_cents))
        for r in reg["join_inner_groupby"].fn(spark, SF_DIR).collect()
    }
    nation_of = dict(zip(customer_pd["c_custkey"],
                         customer_pd["c_nationkey"]))
    agg: dict = defaultdict(lambda: [0, 0])
    for ck, price in zip(orders_pd["o_custkey"],
                         orders_pd["o_totalprice"]):
        if ck in nation_of:
            agg[int(nation_of[ck])][0] += 1
            agg[int(nation_of[ck])][1] += int(np.floor(price * 100))
    assert got == {k: tuple(v) for k, v in agg.items()} and len(got) > 0


def test_join_left_outer_condition_in_on_clause(spark, reg, orders_pd,
                                                customer_pd):
    got = {
        int(r.c_custkey): int(r.order_cnt)
        for r in reg["join_left_outer"].fn(spark, SF_DIR).collect()
    }
    per = Counter(
        int(ck) for ck, p in zip(orders_pd["o_custkey"],
                                 orders_pd["o_totalprice"])
        if p > 400000.0
    )
    ref = {int(ck): per.get(int(ck), 0)
           for ck in customer_pd["c_custkey"]}
    assert got == ref
    assert 0 in set(ref.values())  # the preserved-with-zero branch


def test_join_right_outer_condition_in_on_clause(spark, reg, orders_pd,
                                                 customer_pd):
    got = {
        int(r.c_custkey): int(r.order_cnt)
        for r in reg["join_right_outer"].fn(spark, SF_DIR).collect()
    }
    per = Counter(
        int(ck) for ck, s in zip(orders_pd["o_custkey"],
                                 orders_pd["o_orderstatus"])
        if s == "F"
    )
    ref = {int(ck): per.get(int(ck), 0)
           for ck in customer_pd["c_custkey"]}
    assert got == ref


def test_join_full_outer_disjoint_sides(spark, reg, orders_pd,
                                        customer_pd):
    got = {
        int(r.custkey): (
            None if r.spend_cents is None else int(r.spend_cents),
            None if r.acctbal_cents is None else int(r.acctbal_cents),
        )
        for r in reg["join_full_outer"].fn(spark, SF_DIR).collect()
    }
    spend: dict = defaultdict(int)
    for ck, p in zip(orders_pd["o_custkey"], orders_pd["o_totalprice"]):
        if p > 450000.0:
            spend[int(ck)] += int(np.floor(p * 100))
    bal = {
        int(ck): int(np.floor(b * 100))
        for ck, b in zip(customer_pd["c_custkey"],
                         customer_pd["c_acctbal"])
        if b < 0.0
    }
    ref = {}
    for k in set(spend) | set(bal):
        ref[k] = (spend.get(k), bal.get(k))
    assert got == ref and len(got) > 0
    # both one-sided branches must be live
    assert any(v[0] is None for v in ref.values())
    assert any(v[1] is None for v in ref.values())


def test_join_semi_anti_partition_customers(spark, reg, orders_pd,
                                            customer_pd):
    semi = {
        int(r.c_custkey)
        for r in reg["join_semi"].fn(spark, SF_DIR).collect()
    }
    anti = {
        int(r.c_custkey)
        for r in reg["join_anti"].fn(spark, SF_DIR).collect()
    }
    has_p = {
        int(ck) for ck, s in zip(orders_pd["o_custkey"],
                                 orders_pd["o_orderstatus"])
        if s == "P"
    }
    has_big = {
        int(ck) for ck, p in zip(orders_pd["o_custkey"],
                                 orders_pd["o_totalprice"])
        if p > 400000.0
    }
    custs = {int(c) for c in customer_pd["c_custkey"]}
    assert semi == custs & has_p
    assert anti == custs - has_big
    assert 0 < len(semi) < len(custs)


def test_join_theta_and_cross(spark, reg):
    got_theta = {
        int(r.s_suppkey): int(r.n_higher_nations)
        for r in reg["join_theta"].fn(spark, SF_DIR).collect()
    }
    s = pd.read_parquet(f"{SF_DIR}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    r = pd.read_parquet(f"{SF_DIR}/region.parquet", columns=["r_name"])
    nkeys = sorted(n["n_nationkey"])
    ref = {
        int(sk): sum(1 for nk in nkeys if snk < nk)
        for sk, snk in zip(s["s_suppkey"], s["s_nationkey"])
        if sum(1 for nk in nkeys if snk < nk) > 0  # inner join drops 0
    }
    assert got_theta == ref and len(got_theta) > 0
    got_cross = sorted(
        (r2.r_name, r2.n_name)
        for r2 in reg["join_cross"].fn(spark, SF_DIR).collect()
    )
    ref_cross = sorted(
        (rn, nn) for rn in r["r_name"] for nn in n["n_name"]
    )
    assert got_cross == ref_cross
    assert len(got_cross) == len(r) * len(n)


def test_window_row_number_top3(spark, reg, orders_pd):
    got = {
        (int(r.o_custkey), int(r.o_orderkey)): int(r.rn)
        for r in reg["window_row_number"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for ck, grp in orders_pd.sort_values(
        ["o_orderdate", "o_orderkey"], kind="stable"
    ).groupby("o_custkey"):
        for i, ok in enumerate(grp["o_orderkey"].tolist()[:3], start=1):
            ref[(int(ck), int(ok))] = i
    assert got == ref and len(got) > 0


def _rank_dense_ref(p: pd.DataFrame):
    ref = {}
    gap_seen = False
    for _, grp in p.groupby("p_brand"):
        rows = sorted(grp.itertuples(index=False),
                      key=lambda r: (r.p_retailprice, r.p_partkey))
        rnk = drnk = 0
        prev = object()
        for i, r in enumerate(rows, start=1):
            if r.p_retailprice != prev:
                rnk, drnk, prev = i, drnk + 1, r.p_retailprice
            ref[int(r.p_partkey)] = (rnk, drnk)
            gap_seen = gap_seen or rnk != drnk
    return ref, gap_seen


def test_rank_vs_dense_rank_ties(spark, reg, tmp_path_factory):
    got = {
        int(r.p_partkey): (int(r.rnk), int(r.drnk))
        for r in reg["window_rank_dense"].fn(spark, SF_DIR).collect()
    }
    p = pd.read_parquet(f"{SF_DIR}/part.parquet",
                        columns=["p_partkey", "p_brand", "p_retailprice"])
    ref, _ = _rank_dense_ref(p)
    assert got == ref
    # sf0.001 has NO retail-price ties within any brand, so the
    # rank-vs-dense distinction is vacuous there — activate it with a
    # handcrafted part table carrying real ties
    d = tmp_path_factory.mktemp("adv_rank")
    tied = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4, 5],
            "p_brand": ["B#1"] * 5,
            "p_retailprice": [10.0, 10.0, 10.0, 20.0, 30.0],
        }
    ).astype({"p_partkey": "int64"})
    tied.to_parquet(d / "part.parquet", index=False)
    got_tied = {
        int(r.p_partkey): (int(r.rnk), int(r.drnk))
        for r in reg["window_rank_dense"].fn(spark, str(d)).collect()
    }
    ref_tied, gap_seen = _rank_dense_ref(tied)
    assert got_tied == ref_tied and gap_seen
    # the three-way tie: rank 1,1,1 then GAP to 4; dense 1,1,1 then 2
    assert got_tied[4] == (4, 2) and got_tied[5] == (5, 3)


def test_lag_lead_matches_python(spark, reg):
    got = {
        int(r.event_id): (
            None if r.delta_cents is None else int(r.delta_cents),
            r.next_type,
        )
        for r in reg["window_lag_lead"].fn(spark, SF_DIR).collect()
    }
    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["cents"] = np.floor(e["value"].values * 100).astype("int64")
    ref = {}
    for _, grp in e.sort_values(
        ["ts", "event_id"], kind="stable"
    ).groupby("user_id"):
        ids = grp["event_id"].tolist()
        cents = grp["cents"].tolist()
        types = grp["event_type"].tolist()
        for i, eid in enumerate(ids):
            ref[int(eid)] = (
                None if i == 0 else int(cents[i] - cents[i - 1]),
                types[i + 1] if i + 1 < len(ids) else None,
            )
    assert got == ref and len(got) == len(e)


def test_running_sum_matches_python(spark, reg, orders_pd):
    got = {
        int(r.o_orderkey): int(r.running_spend_cents)
        for r in reg["window_running_sum"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for _, grp in orders_pd.sort_values(
        ["o_orderdate", "o_orderkey"], kind="stable"
    ).groupby("o_custkey"):
        cum = 0
        for ok, p in zip(grp["o_orderkey"], grp["o_totalprice"]):
            cum += int(np.floor(p * 100))
            ref[int(ok)] = cum
    assert got == ref and len(got) == len(orders_pd)


def test_subquery_in_scalar_rational_mean(spark, reg, orders_pd,
                                          customer_pd):
    got = sorted(
        (int(r.o_orderkey), int(r.o_custkey))
        for r in reg["subquery_in_scalar"].fn(spark, SF_DIR).collect()
    )
    neg = {
        int(ck) for ck, b in zip(customer_pd["c_custkey"],
                                 customer_pd["c_acctbal"])
        if b < 0.0
    }
    mean = Fraction(0)
    for p in orders_pd["o_totalprice"]:
        mean += Fraction(float(p))
    mean /= len(orders_pd)
    ref = sorted(
        (int(ok), int(ck))
        for ok, ck, p in zip(orders_pd["o_orderkey"],
                             orders_pd["o_custkey"],
                             orders_pd["o_totalprice"])
        if int(ck) in neg and Fraction(float(p)) > mean
    )
    assert got == ref and len(got) > 0


def test_keep_newest_matches_python(spark, reg):
    got = {
        int(r.user_id): (int(r.newest_event), r.newest_type)
        for r in reg["dedup_keep_newest"].fn(spark, SF_DIR).collect()
    }
    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ref = {}
    for uid, grp in e.groupby("user_id"):
        top = max(grp.itertuples(index=False),
                  key=lambda r: (r.ts, r.event_id))
        ref[int(uid)] = (int(top.event_id), top.event_type)
    assert got == ref and len(got) > 0


def test_clean_corpus_composite(spark, reg):
    rows = reg["pipeline_clean_corpus"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    groups: dict = {}
    for d in docs.itertuples(index=False):
        toks = _tokens(d.text)
        n = len(toks)
        stop = sum(1 for t in toks if t in STOPWORDS)
        if not (20 <= n <= 2000 and stop / n >= 0.05):
            continue
        fp = hashlib.sha256(_canon(d.text).encode("utf-8")).hexdigest()
        keep, cnt, tok = groups.get(fp, (int(d.doc_id), 0, n))
        groups[fp] = (min(keep, int(d.doc_id)), cnt + 1, min(tok, n))
    assert int(r.n_docs) == len(groups)
    assert int(r.total_tokens) == sum(t for _, _, t in groups.values())
    assert int(r.dups_removed) == sum(c - 1 for _, c, _ in groups.values())
    assert int(r.first_doc) == min(k for k, _, _ in groups.values())


def test_lang_ngram_matches_python(spark, reg):
    got = {
        int(r.doc_id): (int(r.t_en), int(r.t_de), int(r.t_fr),
                        int(r.t_es), r.lang_guess, bool(r.label_match))
        for r in reg["text_lang_ngram"].fn(spark, SF_DIR).collect()
    }
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    ref = {}
    for d in docs.itertuples(index=False):
        canon = _canon(d.text)
        tris = [canon[i: i + 3] for i in range(len(canon) - 2)]
        c = {lang: sum(1 for t in tris if t in set(m))
             for lang, m in LANG_TRIGRAMS.items()}
        if c["en"] >= c["de"] and c["en"] >= c["fr"] and c["en"] >= c["es"]:
            g = "en"
        elif c["de"] >= c["fr"] and c["de"] >= c["es"]:
            g = "de"
        elif c["fr"] >= c["es"]:
            g = "fr"
        else:
            g = "es"
        ref[int(d.doc_id)] = (c["en"], c["de"], c["fr"], c["es"], g,
                              g == d.lang)
    assert got == ref and len(got) == len(docs)


def test_distinct_having_sort_topk(spark, reg, orders_pd, customer_pd):
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_partkey", "l_suppkey"],
    )
    got = {
        r.l_returnflag: (int(r.distinct_parts), int(r.distinct_supps),
                         int(r.n_rows))
        for r in reg["agg_distinct_count"].fn(spark, SF_DIR).collect()
    }
    ref = {
        flag: (grp["l_partkey"].nunique(), grp["l_suppkey"].nunique(),
               len(grp))
        for flag, grp in li.groupby("l_returnflag")
    }
    assert got == ref
    got_h = {
        int(r.o_custkey): (int(r.n_orders), int(r.spend_cents))
        for r in reg["agg_having"].fn(spark, SF_DIR).collect()
    }
    ref_h = {}
    for ck, grp in orders_pd.groupby("o_custkey"):
        if len(grp) >= 15:
            ref_h[int(ck)] = (
                len(grp),
                int(np.floor(grp["o_totalprice"].values * 100)
                    .astype("int64").sum()),
            )
    assert got_h == ref_h
    got_d = {
        (int(r.c_nationkey), r.c_mktsegment)
        for r in reg["distinct_rows"].fn(spark, SF_DIR).collect()
    }
    assert got_d == {
        (int(nk), seg)
        for nk, seg in zip(customer_pd["c_nationkey"],
                           customer_pd["c_mktsegment"])
    }
    got_t = [
        (int(r.o_orderkey), int(r.totalprice_cents))
        for r in reg["topk_orders"].fn(spark, SF_DIR).collect()
    ]
    allp = sorted(
        ((int(np.floor(p * 100)), -int(ok))
         for ok, p in zip(orders_pd["o_orderkey"],
                          orders_pd["o_totalprice"])),
        reverse=True,
    )[:10]
    assert got_t == [(-nok, c) for c, nok in allp]
    got_s = [
        (int(r.c_custkey), int(r.c_nationkey), int(r.acctbal_cents))
        for r in reg["sort_multi_key"].fn(spark, SF_DIR).collect()
    ]
    rows = sorted(
        customer_pd.itertuples(index=False),
        key=lambda r: (r.c_nationkey, -np.floor(r.c_acctbal * 100),
                       r.c_custkey),
    )[:25]
    assert got_s == [
        (int(r.c_custkey), int(r.c_nationkey),
         int(np.floor(r.c_acctbal * 100)))
        for r in rows
    ]


def test_indexed_variants_equal_indexfree_references(spark, reg):
    """The persisted-index production variants must return EXACTLY the
    rows the independent references predict — the bucketed index, the
    sidecar, and the attach path may not change a single value."""
    from .third_opinion_refs import (
        incremental_dedup_ref,
        incremental_minhash_ref,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    got = {
        r.content_fp: (int(r.keep_id), int(r.batch_dup_cnt))
        for r in reg["pipeline_incremental_dedup_indexed"]
        .fn(spark, SF_DIR).collect()
    }
    assert got == incremental_dedup_ref(docs)
    got_mh = sorted(
        (int(r.doc_id), int(r.match_id), int(r.common), float(r.jaccard))
        for r in reg["pipeline_incremental_minhash_indexed"]
        .fn(spark, SF_DIR).collect()
    )
    assert got_mh == incremental_minhash_ref(docs) and len(got_mh) > 0
