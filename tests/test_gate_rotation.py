"""The driver's correctness gate checks the FIRST 50 registry entries;
``registry()`` must (a) rotate the unverified frontier into that window
each round by reading the recorded CORRECTNESS_r*.json files, and
(b) once the frontier is empty, cycle verified entries through the gate
least-recently-verified first so old verifications keep getting
re-checked by the driver.

All CORRECTNESS state is synthesized under a tmp repo root
(``_repo_root`` monkeypatch): the real repo now has every entry
driver-verified, so tests that relied on a live unverified frontier
would otherwise vacuously fail/pass depending on driver history.
"""

from __future__ import annotations

import json

from duckdb_redis_olap_scanner_spark.plans import catalog


def _green(names):
    return {
        n: {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        }
        for n in names
    }


def test_frontier_orders_before_verified():
    names = list(catalog.registry())
    prior = catalog._prior_verified()
    frontier = [n for n in names if n not in prior]
    # Every frontier entry precedes every prior-verified entry.
    assert names[: len(frontier)] == frontier


def test_rotation_advances_with_new_correctness_file(tmp_path, monkeypatch):
    # Point at an EMPTY repo root first: only the baseline set counts as
    # verified, so a synthetic frontier exists even when the real repo
    # has every entry driver-verified.
    monkeypatch.setattr(catalog, "_repo_root", lambda: str(tmp_path))
    baseline = catalog._prior_verified()
    names = list(catalog.registry())
    frontier = [n for n in names if n not in baseline]
    assert frontier, "baseline covers the whole registry?"
    newly = frontier[:3]
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(_green(newly)))
    rotated = list(catalog.registry())
    head = rotated[: len(frontier) - len(newly)]
    assert not set(newly) & set(head)  # newly-verified left the frontier
    assert set(newly) < set(rotated)  # but are still registered


def test_errored_rows_do_not_count_as_verified(tmp_path, monkeypatch):
    monkeypatch.setattr(catalog, "_repo_root", lambda: str(tmp_path))
    baseline = catalog._prior_verified()
    frontier = [n for n in catalog.registry() if n not in baseline]
    victim = frontier[0]
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps(
            {victim: {"rows_match": True, "hash_match": True, "err": "boom"}}
        )
    )
    assert victim not in catalog._prior_verified()


def test_verified_entries_cycle_least_recently_verified_first(
    tmp_path, monkeypatch
):
    """With the frontier empty, an entry whose newest green row is r2
    must sort before one re-verified in r98 — so the 50-entry gate
    window sweeps all verified entries across rounds."""
    monkeypatch.setattr(catalog, "_repo_root", lambda: str(tmp_path))
    all_names = list(catalog.registry())
    old, recent = all_names[0], all_names[1]
    # Verify the whole registry in r2, then re-verify everything except
    # `old` in r98: `old` becomes the least-recently-verified entry.
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(_green(all_names)))
    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps(_green(n for n in all_names if n != old))
    )
    rotated = list(catalog.registry())
    assert not [n for n in rotated if n not in catalog._prior_verified()]
    assert rotated[0] == old  # oldest verification leads the gate window
    assert rotated.index(old) < rotated.index(recent)


def test_gate_window_covers_everything_within_three_rounds(
    tmp_path, monkeypatch
):
    """Simulate the driver loop: each round verifies the first 50
    registry entries. Starting from everything-verified-in-r2, every
    entry must re-enter the window within ceil(N/50) rounds."""
    monkeypatch.setattr(catalog, "_repo_root", lambda: str(tmp_path))
    all_names = list(catalog.registry())
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(_green(all_names)))
    seen: set[str] = set()
    rounds_needed = -(-len(all_names) // 50)
    for r in range(3, 3 + rounds_needed):
        window = list(catalog.registry())[:50]
        seen.update(window)
        (tmp_path / f"CORRECTNESS_r{r:02d}.json").write_text(
            json.dumps(_green(window))
        )
    assert seen == set(all_names)
