#!/usr/bin/env python
"""Capture .explain('formatted') for every bench-tagged query into
plans/r21/<query>_<tag>.txt (tag = before/after), plus a one-line
summary of exchange / python-stage counts per query on stdout.

Usage: python scripts/r21_plans.py before|after [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_redis_olap_scanner_spark.engine import get_spark  # noqa: E402
from duckdb_redis_olap_scanner_spark.plans.catalog import registry  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", "r21")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(
        app_name="r21plans",
        shuffle_partitions=bench._shuffle_partitions(sf_dir),
    )
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        runtime_replan_worth_it,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set(
        "spark.sql.adaptive.enabled",
        str(runtime_replan_worth_it(sf_dir, cpus)).lower(),
    )
    entries = registry()
    names = sorted(n for n, e in entries.items() if "bench" in e.tags)
    for name in names:
        df = (entries[name].raw_fn or entries[name].fn)(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        ex = (
            plan.count(" Exchange")
            - plan.count("BroadcastExchange")
            - plan.count("ReusedExchange")
        )
        bx = plan.count("BroadcastExchange") - plan.count(
            "ReusedExchange [Reuses operator id"
        ) * 0
        py = sum(
            plan.count(t)
            for t in ("MapInArrow", "MapInPandas", "EvalPython",
                      "FlatMapGroupsInPandas")
        )
        smj = plan.count("SortMergeJoin")
        bhj = plan.count("BroadcastHashJoin")
        print(
            f"{name}: shuffle_ex={ex} bcast_ex={bx} py_stages={py} "
            f"smj={smj} bhj={bhj}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
