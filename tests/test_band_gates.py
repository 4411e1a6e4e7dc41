"""Band-gate branches (r21): the mid-band shapes q4/q5/q13/q14 switch
into above the static broadcast thresholds must stay result-identical
to the oracle, and broadcast_when_counted must honor its probe-cap and
row-cap contract.

The branches are volume-gated on real file sizes, so at the test SFs
they never fire on their own; these tests force them by patching the
static gate the query functions consult, then compare rows against the
same DuckDB oracle the registry entry declares. This is the suite twin
of the manual 100× verification recorded in OPTIMIZATION_r21.md.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog as C
from duckdb_redis_olap_scanner_spark.plans import relational as R

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

RELATIONAL = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem")


def _oracle_rows(name: str):
    con = duckdb.connect()
    try:
        for t in RELATIONAL:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(SF_DIR, t + '.parquet')}')"
            )
        return sorted(map(tuple, con.execute(
            C.registry()[name].oracle).fetchall()))
    finally:
        con.close()


def _force_band(monkeypatch, *, small: tuple[str, ...] = ()):
    """Make the static gates treat every table as above-threshold
    (band regime) except the ones listed in ``small``."""

    def fake_fits(sf_dir, name, cap_bytes=C.BROADCAST_CAP_BYTES):
        return name in small

    monkeypatch.setattr(R, "fits_broadcast", fake_fits)


@pytest.mark.parametrize(
    "query,small",
    [
        ("q4_order_priority", ()),
        # q5's band branch additionally requires customer to stay
        # statically broadcastable.
        ("q5_local_supplier_volume", ("customer",)),
        ("q13_customer_distribution", ()),
        ("q14_promo_effect", ()),
    ],
)
def test_band_branch_matches_oracle(spark, monkeypatch, query, small):
    _force_band(monkeypatch, small=small)
    got = sorted(map(tuple, C.registry()[query].fn(spark, SF_DIR).collect()))
    assert got == _oracle_rows(query)


def test_band_branch_q4_uses_broadcast_inner(spark, monkeypatch):
    """With the probe approving, q4's band shape is the broadcast-inner
    distinct — no SortMergeJoin, lineitem never exchanged."""
    _force_band(monkeypatch)
    plan = (
        C.registry()["q4_order_priority"].fn(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_band_branch_q13_q14_use_merge(spark, monkeypatch):
    _force_band(monkeypatch)
    for q in ("q13_customer_distribution", "q14_promo_effect"):
        plan = (
            C.registry()[q].fn(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in plan, q
        assert "BroadcastHashJoin" not in plan, q


def test_broadcast_when_counted_contract(spark, monkeypatch):
    df = spark.range(10)

    # Probe cap: a cluster-sized gate table skips the probe entirely.
    monkeypatch.setattr(
        C.os.path, "getsize", lambda p: C.COUNT_PROBE_CAP_BYTES
    )
    assert C.broadcast_when_counted(df, SF_DIR, "orders") is None

    # In-band, over the row cap: probe runs, says no.
    monkeypatch.setattr(C.os.path, "getsize", lambda p: 1 << 20)
    assert C.broadcast_when_counted(df, SF_DIR, "orders", max_rows=5) is None

    # In-band, under the row cap: broadcast hint applied.
    out = C.broadcast_when_counted(df, SF_DIR, "orders", max_rows=100)
    assert out is not None
    assert sorted(r[0] for r in out.collect()) == list(range(10))

    # Missing stats: the safe cluster assumption — never broadcast.
    def raise_oserror(p):
        raise OSError(p)

    monkeypatch.setattr(C.os.path, "getsize", raise_oserror)
    assert C.broadcast_when_counted(df, SF_DIR, "orders") is None
