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


@pytest.mark.parametrize(
    "name", [e.name for e in _redis_entries()]
)
def test_redis_entries_survive_fresh_session(spark, name, monkeypatch):
    """Each redis entry must bootstrap its own session state: a fresh
    `newSession()` shares the SparkContext (no JVM restart) but has
    empty session-local data source registrations and conf — the same
    blank slate a fresh driver session gives the first gate entry.
    Env is cleared so the entries take the same golden-server path the
    driver's gate takes."""
    monkeypatch.delenv("SPARK_GRAFT_REDIS_ADDR", raising=False)
    fresh = spark.newSession()
    entry = catalog.registry()[name]
    df = entry.fn(fresh, SF_DIR)
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
def test_indexed_entries_survive_fresh_session_twice(spark, name):
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
