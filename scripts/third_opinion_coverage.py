#!/usr/bin/env python
"""Report which catalog entries have an independent third-opinion
re-derivation (tests/test_third_opinion*.py) and which do not.

The oracle gate proves Spark == DuckDB; the third-opinion tests prove
the shared SPEC reading against an independent implementation. This
script scans the audit files for quoted entry names (any quoting or
access spelling — `reg["x"]`, `registry()["x"]`, `ENTRIES["x"]`,
parametrize lists) and intersects them with the registry, printing a
JSON summary:

    {"entries_total": N, "with_third_opinion": K,
     "without": [names...], "detection": "quoted-name heuristic"}

Detection is a HEURISTIC (ADVICE r16): any registry entry name quoted
anywhere in an audit file counts as covered — it can over-count a
name mentioned in a comment string, and under-counting is only
possible for an entry exercised without its name ever appearing
quoted (none of the audit files do that).

Entries listed under `without` fall into documented classes (see
COVERAGE.md "Third-opinion audit, session 2"): engine-builtin scalar
wrappers, the TPC-H suite (the oracle IS the published spec),
multimodal codecs (hypothesis round-trips + external vectors), archive
ingest (stdlib vs closed-form), redis entries (transport tests + the
fake-fidelity audit), and skew (invariance-tested).
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    sys.path.insert(0, str(ROOT))
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401
    from duckdb_redis_olap_scanner_spark.plans import catalog

    names = set(catalog.registry())
    covered: set[str] = set()
    for f in sorted((ROOT / "tests").glob("test_third_opinion*.py")):
        # Any quoted identifier, whatever the access spelling around
        # it (reg["x"], registry()["x"], ENTRIES["x"], parametrize
        # lists, f-string lookups) — the registry intersection below
        # filters non-entry strings.
        covered.update(
            re.findall(r'''["']([a-z0-9_]+)["']''', f.read_text())
        )
    covered &= names
    print(
        json.dumps(
            {
                "entries_total": len(names),
                "with_third_opinion": len(covered),
                "without": sorted(names - covered),
                "detection": "quoted-name heuristic over "
                "tests/test_third_opinion*.py",
            },
            indent=2,
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
