"""Session-order independence for the redis catalog entries.

R10's only correctness red (`redis_cluster_scan`) was an ordering bug:
the entry read `spark.read.format("redis_scan")` without registering the
Python data source, so it only worked when a sibling `_engine()`-using
entry had already run in the same session. These tests make that bug
class impossible to reintroduce:

1. `test_redis_entries_survive_fresh_session` runs every redis-tagged
   entry against `spark.newSession()` — a brand-new session state with
   no data sources registered and no conf carried over — exactly what
   the driver's gate presents when the entry runs first.
2. `test_direct_format_reads_register_first` is the static guard: any
   entry whose source reads a `redis_*` format string directly must
   also call `register_datasources` (or go through `_engine`/`Engine`,
   which registers in `Engine.__init__` — engine.py:155).
"""

from __future__ import annotations

import inspect

import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR


def _redis_entries():
    return [
        e for e in catalog.registry().values() if "redis" in e.tags
    ]


def test_redis_entries_exist():
    assert len(_redis_entries()) >= 10


@pytest.fixture
def _quarantined_table_cache():
    """Cache-poisoning quarantine (r16 audit finding): `newSession()`
    shares the applicationId, so `catalog._session_key` gives a FRESH
    session the SAME cache key as the main session. A `table()` call
    on the fresh session then stores a fresh-session-bound DataFrame
    that later MAIN-session entries receive from the cache — and
    `createOrReplaceTempView` on that DataFrame registers the view in
    the FRESH session's namespace, so a main-session `spark.sql`
    entry silently resolves the view name to whatever an earlier test
    left in the main namespace (observed: subquery entries at sf0.001
    returning sf0.01 rows after oracle-parity ran). Until the cache
    key is session-unique (a `table()`/`_session_key` edit — in every
    entry's dirty closure, so deferred with gate arithmetic), every
    fresh-session test must drop the table-cache entries it created."""
    before = set(catalog._TABLE_CACHE)
    yield
    for k in set(catalog._TABLE_CACHE) - before:
        del catalog._TABLE_CACHE[k]


@pytest.mark.parametrize(
    "name", [e.name for e in _redis_entries()]
)
def test_redis_entries_survive_fresh_session(
    spark, name, monkeypatch, _quarantined_table_cache
):
    """Each redis entry must bootstrap its own session state: a fresh
    `newSession()` shares the SparkContext (no JVM restart) but has
    empty session-local data source registrations and conf — the same
    blank slate a fresh driver session gives the first gate entry.
    Env is cleared so the entries take the same golden-server path the
    driver's gate takes.

    `raw_fn`, not `entry.fn`: the registry memo shares the fresh
    session's cache key (see _quarantined_table_cache), so going
    through `fn` would ALSO pin fresh-session DataFrames into the
    memo that later main-session callers receive."""
    monkeypatch.delenv("SPARK_GRAFT_REDIS_ADDR", raising=False)
    fresh = spark.newSession()
    entry = catalog.registry()[name]
    df = (entry.raw_fn or entry.fn)(fresh, SF_DIR)
    assert df.count() >= 0  # executes without DATA_SOURCE_NOT_FOUND


def test_direct_format_reads_register_first():
    """Static guard: a plans/ entry reading a redis format string
    directly must register data sources in its own body."""
    for e in catalog.registry().values():
        src = inspect.getsource(e.raw_fn or e.fn)
        if 'read.format("redis' not in src:
            continue
        assert (
            "register_datasources" in src
            or "_engine(" in src
            or "Engine(" in src
        ), f"{e.name} reads a redis_* format without registering it"


@pytest.mark.parametrize(
    "name",
    [
        "pipeline_incremental_dedup_indexed",
        "pipeline_incremental_minhash_indexed",
    ],
)
def test_indexed_entries_survive_fresh_session_twice(
    spark, name, _quarantined_table_cache
):
    """The r12 indexed-dedup entries create catalog tables as part of
    their build — the same session-state bug class the redis entries
    had: they must work in a blank `newSession()` (first gate entry
    position) AND on a SECOND fresh session where the external
    catalog/paths already hold a previous run's index (the overwrite
    path the driver's repeated gate runs exercise)."""
    n_rows = []
    for _ in range(2):
        fresh = spark.newSession()
        # raw_fn bypasses the registry's per-(app, sf_dir) plan memo —
        # newSession() shares the applicationId, so entry.fn would
        # serve iteration 1's DataFrame and never rebuild the index.
        df = catalog.registry()[name].raw_fn(fresh, SF_DIR)
        n_rows.append(df.count())
    assert n_rows[0] == n_rows[1] >= 0


@pytest.mark.xfail(
    strict=True,
    reason="catalog._session_key keys caches by applicationId, which "
    "newSession() shares: a fresh-session table() poisons the cache "
    "for main-session callers, whose createOrReplaceTempView then "
    "registers in the FRESH session's namespace so spark.sql resolves "
    "the view to stale main-session state (r16 audit finding — the "
    "subquery third-opinion tests caught sf0.01 rows at sf0.001). "
    "Strict xfail = the r17 session-unique-key fix flips this to "
    "XPASS and forces removing the marker.",
)
def test_table_cache_is_session_unique(spark, _quarantined_table_cache):
    """THE poisoning scenario, reproduced deterministically: after a
    fresh-session table() touch and a stale main-session view, a
    view-based entry rebuilt on the MAIN session at sf0.001 must
    still return sf0.001 rows."""
    sf_small = SF_DIR
    sf_big = "/root/testdata/sf0.01"
    entry = catalog.registry()["subquery_correlated"]
    truth = (entry.raw_fn or entry.fn)(spark, sf_small).count()
    import os

    key = (
        catalog._session_key(spark),
        os.path.abspath(sf_small),
        "customer",
    )
    try:
        # 0) the poisoning requires the FRESH session to be the first
        # owner of the cache key — evict the main-session entry the
        # truth computation just created
        catalog._TABLE_CACHE.pop(key, None)
        # 1) any fresh-session code path touching the dim table now
        # stores a FRESH-session-bound DataFrame under the shared key
        catalog.table(spark.newSession(), sf_small, "customer")
        # 2) an earlier test left the main-session view at another sf
        catalog.table(spark, sf_big, "customer").createOrReplaceTempView(
            "customer"
        )
        # 3) a main-session rebuild must be immune to both
        got = (entry.raw_fn or entry.fn)(spark, sf_small).count()
        assert got == truth
    finally:
        # drop the poisoned cache row and restore the main-session
        # view for any later view-based test
        catalog._TABLE_CACHE.pop(key, None)
        catalog.table(spark, sf_small, "customer").createOrReplaceTempView(
            "customer"
        )
