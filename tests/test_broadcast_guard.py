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

# (relative file, enclosing-function qualname, root name of the
# broadcast argument) → why it is size-bounded independent of SF. The
# qualname pins each CALL SITE: a new unsafe ``F.broadcast`` in the
# same file that happens to reuse an allowlisted variable name (another
# ``df`` or ``n``) still re-triggers review because it lives in a
# different function (round-9 ADVICE). The root name still guards
# against re-deriving a frame inside the blessed function.
ALLOWED: dict[tuple[str, str, str], str] = {
    # The cost-based gate itself — the one place a data frame may pass
    # through, guarded by the on-disk size estimate.
    ("plans/catalog.py", "maybe_broadcast", "df"):
        "inside maybe_broadcast, size-gated",
    # The runtime-statistics gate (r21): reached only above the static
    # cap, in the band below COUNT_PROBE_CAP_BYTES, and the broadcast
    # fires only after a real count job proves the frame holds at most
    # COUNTED_BROADCAST_MAX_ROWS rows.
    ("plans/catalog.py", "broadcast_when_counted", "df"):
        "inside broadcast_when_counted, row-count-gated",
    # Fixed dimensions: 25 nations / 5 regions at every SF.
    ("plans/relational.py", "q5_local_supplier_volume", "n"):
        "nation dim, 25 rows",
    ("plans/relational.py", "q5_local_supplier_volume", "r"):
        "region dim, 5 rows",
    ("plans/relational.py", "q10_returned_items", "n"):
        "nation dim, 25 rows",
    ("plans/relational.py", "join_theta", "n"):
        "nation dim, 25 rows",
    ("plans/relational.py", "agg_rollup", "n"):
        "nation dim, 25 rows",
    ("plans/relational.py", "agg_rollup", "r"):
        "region dim, 5 rows",
    ("plans/relational2.py", "q2_min_cost_supplier", "n"):
        "nation dim (⋈region), 25 rows",
    ("plans/relational2.py", "q2_min_cost_supplier", "r"):
        "region dim, 5 rows",
    ("plans/relational2.py", "q8_market_share", "n"):
        "nation dim, 25 rows (two sites: cust + supp nation)",
    ("plans/relational2.py", "q8_market_share", "r"):
        "region dim, 5 rows",
    ("plans/relational2.py", "q9_product_type_profit", "n"):
        "nation dim, 25 rows",
    ("plans/relational2.py", "q11_important_stock", "n"):
        "nation dim, 25 rows",
    ("plans/relational2.py", "q20_promotion_suppliers", "n"):
        "nation dim, 25 rows",
    ("plans/relational2.py", "q21_waiting_suppliers", "n"):
        "nation dim, 25 rows",
    # ≤1-row aggregates (global totals / maxima / averages).
    ("plans/relational2.py", "q11_important_stock", "total"):
        "1-row global sum (q11)",
    ("plans/relational2.py", "q22_global_sales_opportunity", "avg_bal"):
        "1-row global avg (q22)",
    ("plans/pipeline_ops3.py", "pipeline_source_mix", "tot"):
        "1-row corpus total",
    ("plans/pipeline_ops5.py", "pipeline_quality_checks", "fk"):
        "1-row fold constant",
    ("plans/pipeline_ops5.py", "orders_rfm", "mx"):
        "1-row global max",
    ("operators/retrieval.py", "bm25_topk", "stats"):
        "1-row corpus stats (BM25)",
    ("operators/retrieval.py", "vocabulary_topk", "n_docs"):
        "1-row corpus count",
    # Partition-count-bounded frames (P rows, P = shuffle partitions).
    ("plans/pipeline_ops5.py", "parts_pareto", "offs"):
        "P-row prefix offsets (pareto)",
    # Bounded small sets: top-k outputs, per-group shares, query sets,
    # trained vocabularies — cardinality fixed by an operator
    # parameter (k, margin buckets, vocab size), not by SF.
    ("plans/relational2.py", "q15_top_supplier", "top"):
        "1-row max-revenue agg (q15)",
    ("plans/relational.py", "agg_approx_percentile", "gk"):
        "per-returnflag GK-sketch agg, ≤3 rows (l_returnflag domain "
        "A/N/R at every SF)",
    ("plans/pipeline_ops5.py", "pipeline_curriculum_shards", "sh"):
        "margin-bucket shares, ≤#buckets",
    ("operators/similarity.py", "brute_force_topk", "q"):
        "query-vector set, ≤n_queries (operator parameter)",
    ("operators/similarity.py", "range_search", "q"):
        "query-vector set, ≤n_queries",
    ("operators/similarity.py", "lsh_bucketed_topk", "q"):
        "query-vector set, ≤n_queries·bands",
    ("operators/similarity.py", "ivf_topk", "q"):
        "query-vector set, ≤n_queries·probes",
    ("operators/similarity.py", "ivf_multiprobe_topk", "q"):
        "query-vector set, ≤n_queries·probes",
    ("operators/similarity.py", "pq_adc_topk", "qlut"):
        "Q-row query LUT frame, ≤query_max_id rows (m·ks ints each)",
    ("operators/similarity.py", "ivf_pq_topk", "qf"):
        "Q-row query frame (probed cells + LUT), ≤query_max_id rows",
    ("operators/similarity.py", "ivf_pq_residual_topk", "qf2"):
        "Q-row query frame (probed cells + per-cell LUTs), "
        "≤query_max_id rows",
    ("operators/retrieval.py", "oov_stats", "vocab"):
        "trained vocab, ≤vocab_size",
    ("operators/ann_index.py", "_bounded_topk", "q"):
        "query-probe frame, ≤MAX_DRIVER_QUERY_ROWS enforced at the "
        "collect that produces it (probed cells must be plan-time "
        "bucket-pruning literals; r17 moved the site from "
        "ann_indexed_topk into the extracted _bounded_topk core)",
    ("operators/ann_index.py", "ivf_pq_indexed_topk", "qf"):
        "Q-row query frame (probed cells + m·ks ADC LUT), "
        "≤MAX_DRIVER_QUERY_ROWS enforced by LIMIT-before-collect at "
        "the raw_q materialization directly above the site",
}


def _qualname_index(tree: ast.AST) -> dict[int, str]:
    """line → dotted qualname of the innermost enclosing function
    (``<module>`` at top level), built by walking def/class nesting."""
    spans: list[tuple[int, int, str]] = []

    def visit(node: ast.AST, stack: tuple[str, ...]) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(
                child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                sub = stack + (child.name,)
                spans.append(
                    (child.lineno, child.end_lineno or child.lineno,
                     ".".join(sub))
                )
                visit(child, sub)
            else:
                visit(child, stack)

    visit(tree, ())
    # innermost wins: later (narrower) spans override on lookup
    index: dict[int, str] = {}
    for lo, hi, qn in sorted(spans, key=lambda t: (t[0], -t[1])):
        for ln in range(lo, hi + 1):
            index[ln] = qn
    return index


def _broadcast_sites() -> list[tuple[str, str, str, int]]:
    """(relative file, enclosing qualname, argument root name, line)
    for every ``*.broadcast(...)`` / ``broadcast(...)`` call in the
    package."""
    sites = []
    for dirpath, _dirs, files in os.walk(PKG_DIR):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG_DIR).replace(os.sep, "/")
            with open(path) as f:
                tree = ast.parse(f.read(), filename=path)
            qualnames = _qualname_index(tree)
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
                qual = qualnames.get(node.lineno, "<module>")
                sites.append((rel, qual, root_name, node.lineno))
    return sites


def test_every_hard_broadcast_is_on_a_bounded_frame():
    sites = _broadcast_sites()
    assert sites, "no broadcast sites found — walker broken?"
    unreviewed = [
        f"{rel}:{line} [{qual}] F.broadcast({root}...) — not in the "
        "reviewed allowlist; prove the frame is SF-independent (fixed "
        "dim, ≤1-row agg, P-row frame, bounded set) or use "
        "maybe_broadcast"
        for rel, qual, root, line in sites
        if (rel, qual, root) not in ALLOWED
    ]
    assert not unreviewed, "\n".join(unreviewed)


def test_allowlist_has_no_stale_entries():
    """Every allowlist entry must still correspond to a live site —
    dead entries hide re-introductions under a previously-blessed
    name."""
    live = {(rel, qual, root) for rel, qual, root, _ in _broadcast_sites()}
    stale = [k for k in ALLOWED if k not in live]
    assert not stale, f"stale allowlist entries: {stale}"
