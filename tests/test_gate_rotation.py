"""The driver's correctness gate checks the FIRST 50 registry entries;
``registry()`` must rotate the unverified frontier into that window
each round by reading the recorded CORRECTNESS_r*.json files."""

from __future__ import annotations

import json

from duckdb_redis_olap_scanner_spark.plans import catalog


def test_frontier_orders_before_verified():
    names = list(catalog.registry())
    prior = catalog._prior_verified()
    frontier = [n for n in names if n not in prior]
    # Every frontier entry precedes every prior-verified entry.
    assert names[: len(frontier)] == frontier


def test_rotation_advances_with_new_correctness_file(tmp_path, monkeypatch):
    baseline = catalog._prior_verified()
    names = list(catalog.registry())
    frontier = [n for n in names if n not in baseline]
    assert frontier, "nothing left to rotate"
    newly = frontier[:3]
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps(
            {
                n: {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": None,
                }
                for n in newly
            }
        )
    )
    monkeypatch.setattr(catalog, "_repo_root", lambda: str(tmp_path))
    rotated = list(catalog.registry())
    head = rotated[: len(frontier) - len(newly)]
    assert not set(newly) & set(head)  # newly-verified left the frontier
    assert set(newly) < set(rotated)  # but are still registered


def test_errored_rows_do_not_count_as_verified(tmp_path, monkeypatch):
    baseline = catalog._prior_verified()
    names = list(catalog.registry())
    frontier = [n for n in names if n not in baseline]
    victim = frontier[0]
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps(
            {victim: {"rows_match": True, "hash_match": True, "err": "boom"}}
        )
    )
    monkeypatch.setattr(catalog, "_repo_root", lambda: str(tmp_path))
    assert victim not in catalog._prior_verified()
