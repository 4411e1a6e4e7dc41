"""Streaming execution tests: the operators in streaming/events.py run
as REAL streams (file source → availableNow trigger → memory sink) and
must produce exactly the rows their batch twins produce — plus
watermark late-data semantics and the applyInPandasWithState operator.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.plans.catalog import table
from duckdb_redis_olap_scanner_spark.streaming import events as SE

from .conftest import SF_DIR


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def events_stream(spark):
    return SE.read_events_stream(spark, SF_DIR)


@pytest.fixture()
def events_batch(spark):
    return table(spark, SF_DIR, "events")


def test_tumbling_stream_equals_batch(spark, events_stream, events_batch):
    got = SE.run_stream_to_memory(
        SE.tumbling_window_counts(events_stream), "t_tumbling"
    )
    want = SE.tumbling_window_counts(events_batch)
    cols = ["win_start", "event_type", "n_events", "value_cents"]
    assert _canon(got, cols) == _canon(want, cols)


def test_sliding_stream_equals_batch(spark, events_stream, events_batch):
    got = SE.run_stream_to_memory(
        SE.sliding_window_counts(events_stream), "t_sliding"
    )
    want = SE.sliding_window_counts(events_batch)
    cols = ["win_start", "n_events"]
    assert _canon(got, cols) == _canon(want, cols)


def test_session_stream_equals_batch(spark, events_stream, events_batch):
    got = SE.run_stream_to_memory(
        SE.session_window_stats(events_stream), "t_session"
    )
    want = SE.session_window_stats(events_batch)
    cols = ["user_id", "session_start", "n_events"]
    assert _canon(got, cols) == _canon(want, cols)


def test_stateful_running_totals(spark, events_stream, events_batch, tmp_path):
    got = SE.run_stream_to_memory(
        SE.running_user_state(events_stream),
        "t_state",
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # update-mode emits one row per user per micro-batch; the LAST row per
    # user is the final state. availableNow over one parquet file is a
    # single micro-batch here, but dedupe defensively.
    final = (
        got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_cents").alias("total_cents"),
        )
    )
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("total_cents"),
    )
    cols = ["user_id", "n_events", "total_cents"]
    assert _canon(final, cols) == _canon(want, cols)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Two availableNow runs over a shared checkpoint: batch 1 advances
    the event-time watermark to (max_ts - 10 min); batch 2's hours-late
    row must be dropped, its fresh row kept (append mode emits only
    finalized windows)."""
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src.mkdir()

    def write_batch(name, rows):
        pdf = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        pdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp" / name))
        for f in (tmp_path / "tmp" / name).glob("*.parquet"):
            shutil.copy(f, src / f"{name}.parquet")

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def run_once():
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .parquet(str(src))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Batch 1: events in hour 0 and hour 6 → watermark ≈ 05:50,
    # finalizing (and emitting) the hour-0 window.
    write_batch(
        "b1",
        [
            (1, t0, 1, 1.0),
            (2, t0 + dt.timedelta(minutes=5), 1, 1.0),
            (3, t0 + dt.timedelta(hours=6), 1, 1.0),
        ],
    )
    run_once()
    # Batch 2: one row hours behind the watermark (dropped) + one fresh
    # row in hour 8 (kept; advances the watermark to 07:50 ≥ 07:00, so
    # the hour-6 window finalizes and is emitted).
    write_batch(
        "b2",
        [
            (4, t0 + dt.timedelta(minutes=30), 1, 1.0),  # LATE → dropped
            (5, t0 + dt.timedelta(hours=8), 1, 1.0),
        ],
    )
    run_once()

    result = {
        r.win_start: r.n for r in spark.read.parquet(out).collect()
    }
    # Hour-0 window: the late row did NOT bump the count past 2.
    assert result[t0] == 2
    # Hour-6 window finalized with its single row.
    assert result[t0 + dt.timedelta(hours=6)] == 1


def test_stream_stream_join_equals_batch(spark, events_stream, events_batch):
    got = SE.run_stream_to_memory(
        SE.clicks_purchases_join(events_stream),
        "t_ssjoin",
        output_mode="append",
    )
    want = SE.clicks_purchases_join(events_batch)
    cols = ["user_id", "click_id", "purchase_id", "lag_us"]
    assert _canon(got, cols) == _canon(want, cols)


def test_dedup_watermark_equals_batch_distinct(spark, events_stream, events_batch):
    got = SE.run_stream_to_memory(
        SE.dedup_events_within_watermark(events_stream),
        "t_dedup_wm",
        output_mode="append",
    )
    want = SE.dedup_events_within_watermark(events_batch)
    cols = ["user_id", "event_type", "minute_start"]
    assert _canon(got, cols) == _canon(want, cols)


def test_dedup_watermark_suppresses_cross_batch_duplicates(spark, tmp_path):
    """Two availableNow runs over one checkpoint: run 2 re-sends a key
    already emitted in run 1 (same minute, inside the 1 h watermark
    horizon) — it must NOT re-emit; a brand-new key must."""
    import datetime as dt
    import shutil as _shutil

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_batch(name, rows):
        pdf = spark.createDataFrame(rows, schema)
        pdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp" / name))
        for f in (tmp_path / "tmp" / name).glob("*.parquet"):
            _shutil.copy(f, src / f"{name}.parquet")

    def run_once():
        stream = (
            spark.readStream.schema(schema).parquet(str(src))
        )
        deduped = SE.dedup_events_within_watermark(stream, watermark="1 hour")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    write_batch(
        "b1",
        [
            (1, t0, 1, "click", 1.0, "{}"),
            (2, t0 + dt.timedelta(minutes=10), 2, "view", 1.0, "{}"),
        ],
    )
    run_once()
    write_batch(
        "b2",
        [
            # same (user, type, minute) as event 1, 20s later → duplicate
            (3, t0 + dt.timedelta(seconds=20), 1, "click", 1.0, "{}"),
            # new key
            (4, t0 + dt.timedelta(minutes=20), 3, "purchase", 1.0, "{}"),
        ],
    )
    run_once()

    rows = sorted(
        (r.user_id, r.event_type, r.minute_start)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        (1, "click", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 00:10:00"),
        (3, "purchase", "2024-01-01 00:20:00"),
    ]


def test_stream_stream_join_across_checkpoint_restart(spark, tmp_path):
    """A click retained in join state must pair with a purchase arriving
    in a LATER micro-batch (separate availableNow run over the same
    checkpoint), and already-emitted pairs must not replay."""
    import datetime as dt
    import shutil as _shutil

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_batch(name, rows):
        pdf = spark.createDataFrame(rows, schema)
        pdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp" / name))
        for f in (tmp_path / "tmp" / name).glob("*.parquet"):
            _shutil.copy(f, src / f"{name}.parquet")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        joined = SE.clicks_purchases_join(stream)
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    write_batch(
        "b1",
        [
            (1, t0, 7, "click", 1.0, "{}"),
            (2, t0 + dt.timedelta(minutes=10), 7, "purchase", 1.0, "{}"),
        ],
    )
    run_once()
    rows1 = sorted(
        (r.click_id, r.purchase_id, r.lag_us)
        for r in spark.read.parquet(out).collect()
    )
    assert rows1 == [(1, 2, 600_000_000)]

    # Batch 2: a purchase 30 min after the retained click (inside the
    # 1 h lag bound and the watermark horizon) joins it; nothing
    # replays.
    write_batch(
        "b2",
        [(3, t0 + dt.timedelta(minutes=30), 7, "purchase", 1.0, "{}")],
    )
    run_once()
    rows2 = sorted(
        (r.click_id, r.purchase_id, r.lag_us)
        for r in spark.read.parquet(out).collect()
    )
    assert rows2 == [(1, 2, 600_000_000), (1, 3, 1_800_000_000)]


def test_rolling_anomaly_stream_equals_batch(spark, events_stream, tmp_path):
    """The stateful streaming detector must emit exactly the rows the
    batch window plan produces (same int64 math, same trailing
    window), state surviving micro-batch boundaries."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import registry

    got = SE.run_stream_to_memory(
        SE.rolling_anomaly_stream(events_stream),
        "t_roll_anom",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt_anom"),
    )
    want = registry()["events_rolling_anomaly"].fn(spark, SF_DIR)
    cols = [
        "event_id",
        "user_id",
        "x_cents",
        "win_n",
        "win_sum",
        "win_sumsq",
        "is_anomaly",
    ]
    assert _canon(got, cols) == _canon(want, cols)


def test_rolling_anomaly_tws_equals_batch(spark, events_stream, tmp_path):
    """Same detector on the Spark 4 transformWithStateInPandas API:
    typed ListState, same int64 math — must match the batch window
    plan row-for-row (and therefore the applyInPandasWithState twin).
    Skips where the protobuf state protocol isn't installed (this
    container); the applyInPandasWithState twin carries the verified
    guarantee there."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol needs protobuf",
    )
    from duckdb_redis_olap_scanner_spark.plans.catalog import registry

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = SE.run_stream_to_memory(
            SE.rolling_anomaly_tws(events_stream),
            "t_roll_anom_tws",
            output_mode="append",
            checkpoint_dir=str(tmp_path / "ckpt_tws"),
        )
        got = got.sparkSession.createDataFrame(got.collect(), got.schema)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    want = registry()["events_rolling_anomaly"].fn(spark, SF_DIR)
    cols = [
        "event_id",
        "user_id",
        "x_cents",
        "win_n",
        "win_sum",
        "win_sumsq",
        "is_anomaly",
    ]
    assert _canon(got, cols) == _canon(want, cols)


def test_rolling_anomaly_tws_import_gate(spark, events_stream):
    """Without protobuf the builder must fail loudly at build time
    with a pointer to the verified twin, not deep in the stream."""
    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present — gate inactive")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="rolling_anomaly_stream"):
        SE.rolling_anomaly_tws(events_stream)


def test_rolling_anomaly_stream_multichunk_key(
    spark, events_stream, tmp_path
):
    """One key's rows can arrive as SEVERAL Arrow chunks per
    micro-batch (arrow maxRecordsPerBatch), with no cross-chunk
    ordering after the shuffle. The operator must materialize and
    sort once per key, not per chunk. The testdata file is already
    globally ts-sorted (chunks would coincidentally arrive in order),
    so stream a deterministically SHUFFLED copy — one micro-batch,
    7-row chunks: per-chunk sorting would fold events out of order
    and diverge from the batch window plan."""
    import pandas as _pd

    from duckdb_redis_olap_scanner_spark.plans.catalog import registry

    src = _pd.read_parquet(f"{SF_DIR}/events.parquet")
    shuffled = src.sample(frac=1.0, random_state=1234).reset_index(
        drop=True
    )
    sdir = tmp_path / "shuffled_sf"
    sdir.mkdir()
    shuffled.to_parquet(sdir / "events.parquet", index=False)
    stream = SE.read_events_stream(spark, str(sdir))

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "7")
    try:
        got = SE.run_stream_to_memory(
            SE.rolling_anomaly_stream(stream),
            "t_roll_anom_chunked",
            output_mode="append",
            checkpoint_dir=str(tmp_path / "ckpt_anom_chunked"),
        )
        got = got.sparkSession.createDataFrame(got.collect(), got.schema)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    want = registry()["events_rolling_anomaly"].fn(spark, SF_DIR)
    cols = [
        "event_id",
        "user_id",
        "x_cents",
        "win_n",
        "win_sum",
        "win_sumsq",
        "is_anomaly",
    ]
    assert _canon(got, cols) == _canon(want, cols)


def test_stateful_histogram_equals_batch_entry(
    spark, events_stream, tmp_path
):
    """The running per-type histogram's final state must equal the
    events_value_histogram BATCH entry row for row (counts and sums
    are monotone non-decreasing and mins/maxs monotone in their
    direction, so max/min over the update-mode snapshots recovers the
    final state)."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import registry

    got = SE.run_stream_to_memory(
        SE.running_type_histogram(events_stream),
        "t_hist_state",
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt_hist"),
    )
    final = got.groupBy("event_type", "bucket").agg(
        F.max("n_events").alias("n_events"),
        F.max("sum_cents").alias("sum_cents"),
        F.min("min_cents").alias("min_cents"),
        F.max("max_cents").alias("max_cents"),
    )
    want = registry()["events_value_histogram"].fn(spark, SF_DIR)
    cols = [
        "event_type", "bucket", "n_events", "sum_cents",
        "min_cents", "max_cents",
    ]
    assert _canon(final, cols) == _canon(want, cols)


def test_stateful_histogram_survives_checkpoint_restart(spark, tmp_path):
    """Histogram GroupState must persist across separate availableNow
    runs over a shared checkpoint: counts from batch 1 carry into the
    state that batch 2 (a new run) folds onto, and the final emitted
    rows equal one histogram over ALL rows."""
    import datetime as dt
    import shutil as _shutil

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt_hist2")
    src.mkdir()
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def write_batch(name, rows):
        pdf = spark.createDataFrame(rows, schema)
        pdf.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "tmp" / name)
        )
        for f in (tmp_path / "tmp" / name).glob("*.parquet"):
            _shutil.copy(f, src / f"{name}.parquet")

    out = str(tmp_path / "hist_out")

    def run_once():
        # The memory sink cannot recover a checkpoint; foreachBatch
        # appending each update-mode batch to parquet can.
        stream = spark.readStream.schema(schema).parquet(str(src))
        df = SE.running_type_histogram(stream)

        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            df.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t0 = dt.datetime(2024, 1, 1)
    write_batch(
        "b1",
        [(1, t0, 1, "click", 10.0, "{}"), (2, t0, 1, "click", 30.0, "{}")],
    )
    run_once()
    # Second run: bucket 0 again (12.00 → 1200 cents, same bucket as
    # the 10.00 row) so the restored state must ACCUMULATE, not
    # restart from zero; the untouched bucket 1 (3000 cents) must
    # survive the restart intact.
    write_batch("b2", [(3, t0, 2, "click", 12.0, "{}")])
    run_once()
    got = spark.read.parquet(out)
    final = (
        got.groupBy("event_type", "bucket")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
        .collect()
    )
    rows = {
        (r.event_type, r.bucket): (
            r.n_events, r.sum_cents, r.min_cents, r.max_cents
        )
        for r in final
    }
    assert rows[("click", 0)] == (2, 2200, 1000, 1200)
    assert rows[("click", 1)] == (1, 3000, 3000, 3000)


class _StubState:
    """Minimal GroupState stand-in for driving the stateful folds
    directly (exists/get/update are all the folds touch)."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_stateful_folds_skip_null_values():
    """NULL values arrive in pandas as NaN: the user-state fold must
    count the row but skip the sum (count(*) vs F.sum semantics), the
    anomaly fold must not crash, and the histogram fold must not cast
    NaN to INT64_MIN and poison bucket 0 (r14 review)."""
    import numpy as np
    import pandas as pd

    st = _StubState()
    pdf = pd.DataFrame({"value": [1.25, np.nan, 2.0]})
    out = list(SE._update_user_state((7,), iter([pdf]), st))[0]
    assert out.n_events.iloc[0] == 3  # count(*) counts the null row
    assert out.total_cents.iloc[0] == 125 + 200  # F.sum skips it

    apdf = pd.DataFrame(
        {"event_id": [1, 2, 3], "ts": [10, 20, 30],
         "value": [1.0, np.nan, 2.0]}
    )
    folded = SE._anomaly_fold((7,), apdf, [])
    assert list(folded.event_id) == [1, 3]  # NaN row contributes nothing

    st2 = _StubState()
    hp = pd.DataFrame({"value": [np.nan, 1.0]})
    hist = list(SE._update_type_histogram(("view",), iter([hp]), st2))[0]
    assert hist.n_events.sum() == 1  # only the real value landed
    assert (hist.min_cents >= 0).all()  # no INT64_MIN poisoning


def test_anomaly_replay_of_last_event_counts_as_regression():
    """An at-least-once upstream resuming from the last acked event
    INCLUSIVE redelivers an equal (ts, event_id); event_id is unique,
    so equality can only be a replay — the observability counter must
    tick (r14 review: strict < left the double-fold invisible)."""
    import pandas as pd

    st = _StubState()
    b1 = pd.DataFrame({"event_id": [1, 2], "ts": pd.to_datetime([10, 20]),
                       "value": [1.0, 2.0]})
    list(SE._update_rolling_anomaly((7,), iter([b1]), st))
    assert st.get[3] == 0
    # replay starting at exactly the last delivered (ts, event_id)
    b2 = pd.DataFrame({"event_id": [2, 3], "ts": pd.to_datetime([20, 30]),
                       "value": [2.0, 3.0]})
    list(SE._update_rolling_anomaly((7,), iter([b2]), st))
    assert st.get[3] == 1  # regression observed, not silent


def test_events_stream_stages_absolute_symlink(spark, monkeypatch):
    """A RELATIVE sf_dir must stage an ABSOLUTE symlink target — the
    raw string would resolve relative to the stage dir and dangle
    (r14 review); re-staging after the check must not crash."""
    import os

    monkeypatch.chdir("/root")
    df = SE.read_events_stream(spark, "testdata/sf0.001")
    assert df.isStreaming
    import hashlib
    import tempfile

    # the stage tag hashes the ABSOLUTE target, so the same relative
    # string from different CWDs can never share a stage dir
    target = "/root/testdata/sf0.001/events.parquet"
    tag = hashlib.md5(target.encode()).hexdigest()[:8]
    link = os.path.join(
        tempfile.gettempdir(), f"events-stream-{tag}", "events.parquet"
    )
    assert os.readlink(link) == target
    assert os.path.exists(link)  # not dangling
    SE.read_events_stream(spark, "testdata/sf0.001")  # idempotent


def test_events_stream_never_deletes_foreign_stage_content(spark):
    """The staging path is predictable and lives in the shared
    $TMPDIR, so the cleanup must NEVER recursively delete a
    non-symlink it finds there (TOCTOU hazard, ADVICE r16): a foreign
    file or directory raises loudly and survives; a stale SYMLINK is
    still retargeted via unlink (which touches only the link)."""
    import hashlib
    import os
    import shutil
    import tempfile

    sf_dir = "/root/testdata/sf0.001"
    target = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    tag = hashlib.md5(target.encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"events-stream-{tag}")
    link = os.path.join(stage, "events.parquet")
    os.makedirs(stage, exist_ok=True)
    # clear whatever an earlier test staged
    if os.path.lexists(link):
        os.unlink(link)
    try:
        # 1) a foreign DIRECTORY with content must survive untouched
        os.makedirs(link)
        sentinel = os.path.join(link, "precious.txt")
        with open(sentinel, "w") as f:
            f.write("do not delete")
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="non-symlink"):
            SE.read_events_stream(spark, sf_dir)
        assert os.path.isfile(sentinel)  # nothing was deleted
        shutil.rmtree(link)
        # 2) a foreign plain FILE also raises and survives
        with open(link, "w") as f:
            f.write("foreign")
        with _pytest.raises(RuntimeError, match="non-symlink"):
            SE.read_events_stream(spark, sf_dir)
        assert os.path.isfile(link)
        os.unlink(link)
        # 3) a stale SYMLINK (moved dataset) is retargeted in place
        os.symlink("/nonexistent/elsewhere.parquet", link)
        df = SE.read_events_stream(spark, sf_dir)
        assert df.isStreaming
        assert os.readlink(link) == target
    finally:
        if os.path.lexists(link) and not os.path.islink(link):
            if os.path.isdir(link):
                shutil.rmtree(link)
            else:
                os.unlink(link)
