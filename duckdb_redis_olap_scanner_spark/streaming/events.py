"""Structured Streaming surface over the events stream.

The reference is strictly batch-pull (SURVEY.md §2.B: "Streaming —
none"), so nothing here is required for fidelity; this module is the
engine's streaming growth path for the training-data pipeline: the same
declarative transformations run

* in BATCH mode (``transform(batch_events_df)``) — used by the query
  catalog so every operator is DuckDB-oracle-checkable, and
* in STREAMING mode (``transform(read_events_stream(...))`` →
  ``run_stream_to_memory``) — exercised by tests with an
  ``availableNow`` trigger, proving stream/batch equivalence.

Operators:

* ``tumbling_window_counts``  — watermarked fixed windows (`F.window`).
* ``sliding_window_counts``   — overlapping windows (window > slide).
* ``session_window_stats``    — data-driven session windows
  (`F.session_window`, 30-min inactivity gap).
* ``running_user_state``      — custom stateful operator via
  ``applyInPandasWithState`` (per-user running count/sum with explicit
  GroupState), the escape hatch for semantics windows can't express.

Scale notes: all window aggregations shuffle once on (key, window);
watermarks bound state size — without them a 100 TB stream's window
state grows forever. ``applyInPandasWithState`` keeps state per
grouping key in the state store; key cardinality (users), not event
volume, bounds memory.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _events_raw_schema(ts_is_nanos: bool) -> StructType:
    """File-source schema for events.parquet. The ``ts`` field depends on
    the file's physical type (see ``plans.catalog.table``): TIMESTAMP(NANOS)
    must be read as raw ``bigint`` nanos (Spark's reader rejects nanos as a
    timestamp), TIMESTAMP(MICROS) directly as TIMESTAMP."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType() if ts_is_nanos else TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet. The file source needs an
    explicit schema, and the sandbox has shipped ``ts`` as both
    TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across generations — probe
    the parquet footer (one metadata read, no data scan) and branch:
    nanos arrive as raw ``bigint`` and are integer-divided to a µs
    timestamp (the same truncation DuckDB applies, see
    ``plans.catalog.table``); micros are read as TIMESTAMP as-is."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file stream source requires a DIRECTORY; the testdata tables are
    # single files (and read-only), so stage a symlink in a temp dir.
    import hashlib
    import os
    import tempfile

    # Absolute target (a relative sf_dir would resolve relative to the
    # STAGE dir — a dangling link), probed with lexists (exists()
    # follows a broken link and then symlink() raises FileExistsError
    # forever), racing creators tolerated. The stage tag hashes the
    # ABSOLUTE target, not the raw sf_dir string: two sessions passing
    # the same relative path from different CWDs are different
    # datasets and must not share (and unlink/retarget) one live
    # link (r14 review).
    target = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    tag = hashlib.md5(target.encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"events-stream-{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if os.path.lexists(link) and not os.path.islink(link):
        # A NON-symlink at the staging path is not ours: this module
        # only ever creates symlinks here, and recursively deleting a
        # foreign file/directory at a predictable shared $TMPDIR path
        # is a TOCTOU hazard (ADVICE r16 — the old code rmtree'd it).
        # Fail loudly and let the operator inspect it.
        raise RuntimeError(
            f"streaming stage path {link!r} is occupied by a "
            "non-symlink this engine did not create; remove it "
            "manually or set TMPDIR to a private directory"
        )
    if os.path.islink(link) and os.readlink(link) != target:
        # Stale link from a moved/removed sf_dir: unlink removes only
        # the link itself, never what it points at.
        os.unlink(link)
    if not os.path.lexists(link):
        try:
            os.symlink(target, link)
        except FileExistsError:
            pass  # a concurrent session staged the same target
    import pyarrow.parquet as pq

    ts_type = pq.read_schema(
        os.path.join(sf_dir, "events.parquet")
    ).field("ts").type
    ts_is_nanos = str(ts_type) == "timestamp[ns]"
    raw = spark.readStream.schema(_events_raw_schema(ts_is_nanos)).parquet(stage)
    if ts_is_nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


# ---------------------------------------------------------------------------
# window aggregations (batch- and stream-applicable)
# ---------------------------------------------------------------------------


def tumbling_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Fixed-window counts+sums per event_type. The watermark lets the
    engine finalize windows and evict their state once event time has
    passed window_end + 30 min; late rows beyond that are dropped."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Overlapping windows (each event lands in window/slide windows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Data-driven session windows per user: a session extends while
    events arrive within `gap` of the previous one. Streaming needs the
    watermark to know when a session can no longer grow."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# stream-stream join + watermark-bounded dedup
# ---------------------------------------------------------------------------


def clicks_purchases_join(
    events: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner equi-join with a time-range bound: each click
    pairs with the same user's purchases within ``max_lag`` after it.

    In streaming mode BOTH sides carry watermarks and the join has a
    time-range condition — exactly what Structured Streaming requires
    to bound join state: a click's state is evictable once the purchase
    watermark passes click_ts + max_lag, so state size tracks the lag
    window, not the stream length. In batch mode the same plan is a
    banded self-join. Lag is reported in exact integer µs (both
    engines' timestamps are µs-truncated — see ``read_events_stream``),
    so results hash-match the DuckDB oracle."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {max_lag}")
            ),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
                "lag_us"
            ),
        )
    )


def dedup_events_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Distinct (user_id, event_type, minute) keys — the streaming form
    via ``dropDuplicatesWithinWatermark``: state for a key is dropped
    once the watermark passes its event time plus the delay, so dedup
    state is bounded by the watermark horizon instead of growing with
    the stream (the streaming analog of the batch exact-dedup
    operator). Duplicates arriving later than the horizon would
    re-emit — the documented watermark trade-off. The batch twin is a
    plain DISTINCT over the same keys, so outputs (keys only) are
    identical whenever all duplicates of a key fall inside the
    horizon."""
    keyed = events.withColumn("minute_ts", F.date_trunc("minute", F.col("ts")))
    if events.isStreaming:
        deduped = keyed.withWatermark(
            "ts", watermark
        ).dropDuplicatesWithinWatermark(["user_id", "event_type", "minute_ts"])
    else:
        deduped = keyed.dropDuplicates(["user_id", "event_type", "minute_ts"])
    return deduped.select(
        "user_id",
        "event_type",
        F.date_format("minute_ts", "yyyy-MM-dd HH:mm:ss").alias("minute_start"),
    )


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_USER_STATE_SCHEMA = "user_id long, n_events long, total_cents long"
_STATE_SCHEMA = "n long, cents long"


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user (count, cents-sum) across micro-batches."""
    import numpy as np

    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # floor(value*100) summed as exact ints — same quantization as the
        # batch/window operators (F.floor(value * 100)). NULL values
        # arrive as NaN and must be skipped exactly as F.sum skips
        # SQL NULLs (while count(*) above still counts the row) —
        # int(NaN-sum) would crash the task (r14 review).
        vals = pdf["value"].to_numpy()
        vals = vals[~np.isnan(vals)]
        if len(vals):
            cents += int(np.floor(vals * 100).sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def running_user_state(events: DataFrame) -> DataFrame:
    """Per-user running totals with explicit GroupState — the custom
    stateful-operator surface (semantics no built-in window expresses:
    monotone running totals that survive across micro-batches)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=_USER_STATE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# stream runner (tests / demos)
# ---------------------------------------------------------------------------


def run_stream_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory table and return it as a batch DataFrame."""
    writer = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return df.sparkSession.table(name)


# ---------------------------------------------------------------------------
# streaming rolling anomaly (stateful twin of events_rolling_anomaly)
# ---------------------------------------------------------------------------

_ANOMALY_OUT_SCHEMA = (
    "event_id long, user_id long, x_cents long, win_n int, "
    "win_sum long, win_sumsq long, is_anomaly boolean"
)
_ANOMALY_STATE_SCHEMA = (
    "xs array<long>, last_ts long, last_event long, regressions long"
)


def _sorted_batch(batches) -> pd.DataFrame | None:
    """One key's micro-batch, materialized and sorted by
    (ts, event_id), or None when empty. The fold's math is order-
    sensitive, and a key's batch may arrive as several Arrow chunks
    with no cross-chunk ordering — shared by BOTH stateful twins so
    an ordering fix can never land in one and miss the other
    (r14 review)."""
    chunks = [pdf for pdf in batches if len(pdf)]
    if not chunks:
        return None
    pdf = (
        pd.concat(chunks, ignore_index=True)
        if len(chunks) > 1
        else chunks[0]
    )
    return pdf.sort_values(["ts", "event_id"])


def _anomaly_fold(
    key: tuple[Any, ...],
    pdf: pd.DataFrame,
    xs: list[int],
) -> pd.DataFrame:
    """Fold one (already fully sorted) micro-batch of a single user's
    events into the trailing window ``xs`` (mutated in place) and
    return the per-event output rows. Shared by the
    applyInPandasWithState and transformWithStateInPandas twins so
    their math cannot drift apart."""
    import numpy as np

    from ..plans.pipeline_ops3 import (
        ANOMALY_K,
        ANOMALY_MIN_N,
        ANOMALY_WINDOW,
    )

    # A NULL value (NaN here) cannot enter the rolling window — the
    # batch quantization F.floor(NULL*100) is NULL and contributes
    # nothing; int(NaN) would crash the task (r14 review). Delivery-
    # order tracking in the callers still sees the full batch.
    pdf = pdf[pdf["value"].notna()]
    out = []
    for ev, v in zip(pdf["event_id"], pdf["value"]):
        x = int(np.floor(v * 100.0))
        xs.append(x)
        if len(xs) > ANOMALY_WINDOW:
            xs.pop(0)
        n = len(xs)
        s = sum(xs)
        q = sum(y * y for y in xs)
        dev = n * x - s
        anom = n >= ANOMALY_MIN_N and dev * dev > (
            ANOMALY_K * ANOMALY_K
        ) * (n * q - s * s)
        out.append((int(ev), int(key[0]), x, n, s, q, bool(anom)))
    return pd.DataFrame(
        out,
        columns=[
            "event_id",
            "user_id",
            "x_cents",
            "win_n",
            "win_sum",
            "win_sumsq",
            "is_anomaly",
        ],
    )


def _update_rolling_anomaly(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Trailing-window z-score per event, with the window carried
    across micro-batches in GroupState. Same int64 cross-multiplied
    test as the batch/window twin ((n*x-s)^2 > k^2*(n*q-s^2)), so the
    two paths are value-identical.

    Ordering: ``batches`` can deliver one key's micro-batch rows as
    SEVERAL pandas chunks (Arrow ``maxRecordsPerBatch``) with no
    cross-chunk ordering guarantee after the shuffle, so the chunks
    are materialized and sorted ONCE per key per micro-batch before
    folding — sorting each chunk independently would silently process
    events out of (ts, event_id) order whenever a key spans chunks.
    Cross-micro-batch order still relies on the source delivering
    event time monotonically per user; the state tracks the last
    (ts, event_id) seen and counts regressions so a violated contract
    is observable (see :func:`rolling_anomaly_stream`)."""
    if state.exists:
        st = state.get
        xs = list(st[0])
        last_ts = int(st[1])
        last_event = int(st[2])
        regressions = int(st[3])
    else:
        xs = []
        last_ts = -(2**62)
        last_event = -(2**62)
        regressions = 0

    pdf = _sorted_batch(batches)
    if pdf is not None:
        ts_ns = pdf["ts"].astype("int64")
        first = (int(ts_ns.iloc[0]), int(pdf["event_id"].iloc[0]))
        # <= , not < : event_id is unique, so an EQUAL (ts, event_id)
        # can only be a replay of the last already-folded event — the
        # resume-from-last-acked-inclusive shape an at-least-once
        # upstream (this repo's own redis_stream sink included)
        # produces. Strict < left that double-fold invisible with the
        # counter at 0 (r14 review).
        if first <= (last_ts, last_event):
            regressions += 1
        last_ts = int(ts_ns.iloc[-1])
        last_event = int(pdf["event_id"].iloc[-1])
        yield _anomaly_fold(key, pdf, xs)
    state.update((xs, last_ts, last_event, regressions))


def rolling_anomaly_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the ``events_rolling_anomaly`` catalog entry:
    per-user trailing-window outlier flags emitted per event, window
    state surviving micro-batch boundaries — the shape a live
    metrics/abuse pipeline needs, where the batch entry is the
    backfill path. Equivalence to the batch window plan is asserted
    in tests/test_streaming.py.

    Ordering contract: within one micro-batch each user's rows are
    globally sorted by (ts, event_id) before folding (all Arrow
    chunks are materialized first, so a key spanning chunks is safe).
    ACROSS micro-batches the operator requires the source to deliver
    each user's events in non-decreasing (ts, event_id) order — the
    standard contract for per-event stateful ops. If the source can't
    guarantee it (replays, multi-partition Kafka without keyed
    ordering), pre-sort per trigger or buffer behind a watermark
    upstream::

        events.withWatermark("ts", "10 minutes")  # bound lateness
        # then a foreachBatch that sorts by (user_id, ts, event_id)

    Violations are OBSERVABLE, not silent: the group state tracks the
    last (ts, event_id) seen per user and increments a ``regressions``
    counter whenever a micro-batch starts before it; operators can
    alert on that state via the state-store reader."""
    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_rolling_anomaly,
            outputStructType=_ANOMALY_OUT_SCHEMA,
            stateStructType=_ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# rolling anomaly on the Spark 4 transformWithStateInPandas API
# ---------------------------------------------------------------------------


def rolling_anomaly_tws(events: DataFrame) -> DataFrame:
    """The rolling anomaly detector on Spark 4's arbitrary-stateful
    API (``transformWithStateInPandas`` + ``ListState``) — same
    semantics and int64 math as :func:`rolling_anomaly_stream`
    (applyInPandasWithState) and the batch window entry; all three are
    asserted row-identical in tests/test_streaming.py.

    Why both streaming APIs: transformWithState is the
    current-generation surface (typed state handles, timers, state
    TTL, RocksDB-backed at scale) and the one new pipelines should
    target; the applyInPandasWithState twin stays as the
    widely-deployed compatibility shape. The trailing window lives in
    a ListState capped at ANOMALY_WINDOW values per user.

    Environment gate: the transformWithState state protocol speaks
    protobuf (pyspark.sql.streaming.proto), so running the query
    needs ``google.protobuf`` installed and the RocksDB state store
    provider configured; this container ships neither, so the
    equivalence test skips here and the applyInPandasWithState twin
    carries the verified-streaming guarantee. Import-gated loudly at
    build time rather than failing deep inside the stream runner."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf for "
            "its state-server protocol (absent in this environment); "
            "use rolling_anomaly_stream (applyInPandasWithState) — "
            "same semantics, verified against the batch plan"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RollingAnomalyProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._xs = handle.getListState("xs", "x LONG")

        def handleInputRows(self, key, rows, timerValues):
            # Shared chunk-materialize-then-sort discipline with the
            # applyInPandasWithState twin (_sorted_batch).
            xs = [int(r[0]) for r in self._xs.get()]
            pdf = _sorted_batch(rows)
            if pdf is not None:
                yield _anomaly_fold(key, pdf, xs)
            self._xs.put([(x,) for x in xs])

        def close(self) -> None:
            pass

    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RollingAnomalyProcessor(),
            outputStructType=_ANOMALY_OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# streaming running histogram (stateful twin of events_value_histogram)
# ---------------------------------------------------------------------------

_HIST_OUT_SCHEMA = (
    "event_type string, bucket int, n_events long, sum_cents long, "
    "min_cents long, max_cents long"
)
_HIST_STATE_SCHEMA = (
    "cnts array<long>, sums array<long>, mins array<long>, "
    "maxs array<long>"
)
_HIST_SENTINEL = 1 << 62


def _update_type_histogram(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch of one event type into the running
    20-bucket histogram state (same cents quantization, bucket width,
    and clamp as the batch entry — constants imported from the plan
    module so the twins cannot drift)."""
    import numpy as np

    from ..plans.pipeline_ops5 import HIST_MAX_BUCKET, HIST_WIDTH_CENTS

    nb = HIST_MAX_BUCKET + 1
    if state.exists:
        cnts, sums, mins, maxs = (list(x) for x in state.get)
    else:
        cnts, sums = [0] * nb, [0] * nb
        mins, maxs = [_HIST_SENTINEL] * nb, [-_HIST_SENTINEL] * nb
    for pdf in batches:
        vals = pdf["value"].to_numpy()
        # NULL values (NaN) must be dropped BEFORE the int64 cast:
        # astype(int64) turns NaN into INT64_MIN, which clip silently
        # files under bucket 0 and poisons min_cents (r14 review).
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            continue
        cents = np.floor(vals * 100).astype(np.int64)
        buckets = np.clip(cents // HIST_WIDTH_CENTS, 0, HIST_MAX_BUCKET)
        for b in np.unique(buckets):
            m = cents[buckets == b]
            bi = int(b)
            cnts[bi] += len(m)
            sums[bi] += int(m.sum())
            mins[bi] = min(mins[bi], int(m.min()))
            maxs[bi] = max(maxs[bi], int(m.max()))
    state.update((cnts, sums, mins, maxs))
    rows = [
        (key[0], b, cnts[b], sums[b], mins[b], maxs[b])
        for b in range(nb)
        if cnts[b] > 0
    ]
    yield pd.DataFrame(
        rows,
        columns=[
            "event_type", "bucket", "n_events", "sum_cents",
            "min_cents", "max_cents",
        ],
    )


def running_type_histogram(events: DataFrame) -> DataFrame:
    """Per-event-type RUNNING equi-width histogram with explicit
    GroupState — the streaming twin of the ``events_value_histogram``
    batch entry: bucket counts/sums/mins/maxs accumulate across
    micro-batches and each batch emits the current non-empty buckets
    (update mode). State is a fixed 20-slot array per type — bounded
    regardless of stream length, the always-on dashboard-distribution
    shape."""
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_type_histogram,
            outputStructType=_HIST_OUT_SCHEMA,
            stateStructType=_HIST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
