"""Static broadcast-hazard guard.

Doctrine (plans/catalog.py — maybe_broadcast): a HARD ``F.broadcast``
hint is only safe on frames whose size does NOT scale with the data —
fixed dimensions (nation/region), ≤1-row aggregates, P-row
(partition-count-bounded) frames, or bounded query/vocabulary sets.
Anything SF-scaling must go through ``maybe_broadcast``, which keys the
hint on the real on-disk size: at cluster volume a hard hint on a
scaling frame collects the whole frame to the driver and OOMs it.

Round 7 reintroduced this hazard class (q14's part-filter hint) after
round 6 had cleaned it, so the doctrine is now self-enforcing: this
test enumerates every ``F.broadcast(`` call site in the package via
AST and fails on any site not in the reviewed allowlist below. Adding
a new hard hint requires adding it here WITH its boundedness argument.
"""

from __future__ import annotations

import ast
import os

import duckdb_redis_olap_scanner_spark as pkg

PKG_DIR = os.path.dirname(os.path.abspath(pkg.__file__))

# (relative file, root name of the broadcast argument) → why it is
# size-bounded independent of SF. The ROOT NAME is the leftmost
# identifier in the argument expression, so renaming or re-deriving a
# frame re-triggers review.
ALLOWED: dict[tuple[str, str], str] = {
    # The cost-based gate itself — the one place a data frame may pass
    # through, guarded by the on-disk size estimate.
    ("plans/catalog.py", "df"): "inside maybe_broadcast, size-gated",
    # Fixed dimensions: 25 nations / 5 regions at every SF.
    ("plans/relational.py", "n"): "nation dim, 25 rows",
    ("plans/relational.py", "r"): "region dim, 5 rows",
    ("plans/relational2.py", "n"): "nation dim (and nation⋈region)",
    ("plans/relational2.py", "r"): "region dim, 5 rows",
    # ≤1-row aggregates (global totals / maxima / averages).
    ("plans/relational2.py", "total"): "1-row global sum (q11)",
    ("plans/relational2.py", "avg_bal"): "1-row global avg (q22)",
    ("plans/pipeline_ops3.py", "tot"): "1-row corpus total",
    ("plans/pipeline_ops5.py", "fk"): "1-row fold constant",
    ("plans/pipeline_ops5.py", "mx"): "1-row global max",
    ("operators/retrieval.py", "stats"): "1-row corpus stats (BM25)",
    ("operators/retrieval.py", "n_docs"): "1-row corpus count",
    # Partition-count-bounded frames (P rows, P = shuffle partitions).
    ("plans/pipeline_ops5.py", "offs"): "P-row prefix offsets (pareto)",
    # Bounded small sets: top-k outputs, per-group shares, query sets,
    # trained vocabularies — cardinality fixed by an operator
    # parameter (k, margin buckets, vocab size), not by SF.
    ("plans/relational2.py", "top"): "1-row max-revenue agg (q15)",
    ("plans/pipeline_ops5.py", "sh"): "margin-bucket shares, ≤#buckets",
    ("operators/similarity.py", "q"): "query-vector set, ≤k·probes",
    ("operators/retrieval.py", "vocab"): "trained vocab, ≤vocab_size",
}


def _broadcast_sites() -> list[tuple[str, str, int]]:
    """(relative file, argument root name, line) for every
    ``*.broadcast(...)`` / ``broadcast(...)`` call in the package."""
    sites = []
    for dirpath, _dirs, files in os.walk(PKG_DIR):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG_DIR).replace(os.sep, "/")
            with open(path) as f:
                tree = ast.parse(f.read(), filename=path)
            for node in ast.walk(tree):
                if not isinstance(node, ast.Call):
                    continue
                fn = node.func
                name = (
                    fn.attr if isinstance(fn, ast.Attribute)
                    else fn.id if isinstance(fn, ast.Name) else ""
                )
                if name != "broadcast" or not node.args:
                    continue
                root: ast.AST = node.args[0]
                while True:
                    if isinstance(root, ast.Attribute):
                        root = root.value
                    elif isinstance(root, ast.Call):
                        root = root.func
                    elif isinstance(root, ast.Subscript):
                        root = root.value
                    else:
                        break
                root_name = root.id if isinstance(root, ast.Name) else (
                    ast.dump(root)[:40]
                )
                sites.append((rel, root_name, node.lineno))
    return sites


def test_every_hard_broadcast_is_on_a_bounded_frame():
    sites = _broadcast_sites()
    assert sites, "no broadcast sites found — walker broken?"
    unreviewed = [
        f"{rel}:{line} F.broadcast({root}...) — not in the reviewed "
        "allowlist; prove the frame is SF-independent (fixed dim, "
        "≤1-row agg, P-row frame, bounded set) or use maybe_broadcast"
        for rel, root, line in sites
        if (rel, root) not in ALLOWED
    ]
    assert not unreviewed, "\n".join(unreviewed)


def test_allowlist_has_no_stale_entries():
    """Every allowlist entry must still correspond to a live site —
    dead entries hide re-introductions under a previously-blessed
    name."""
    live = {(rel, root) for rel, root, _ in _broadcast_sites()}
    stale = [k for k in ALLOWED if k not in live]
    assert not stale, f"stale allowlist entries: {stale}"
