"""Redis Stream streaming source: exactly-once delivery across
checkpointed availableNow runs, plus the XADD/XRANGE client surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_redis_olap_scanner_spark.transport.resp import RedisClient


def _consume(engine, out, ckpt):
    # Parquet sink: supports checkpoint recovery (the memory sink does
    # not), so consecutive runs continue from the committed offset.
    df = engine.redis_stream(key="metrics").select(
        "entry_id",
        F.col("fields")["n"].cast("long").alias("n"),
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return engine.spark.read.parquet(out)


def test_xadd_xrange_client(redis_server):
    with RedisClient(redis_server.host, redis_server.port) as c:
        i1 = c.xadd("sensor", {"v": "1"})
        i2 = c.xadd("sensor", {"v": "2"})
        assert c.xlen("sensor") == 2
        entries = c.xrange("sensor")
        assert entries == [(i1, {"v": "1"}), (i2, {"v": "2"})]
        # Exclusive-start form pages correctly.
        assert c.xrange("sensor", f"({i1}") == [(i2, {"v": "2"})]
        assert c.xrange("sensor", "-", "+", count=1) == [(i1, {"v": "1"})]
        # Newest-first read: the COUNT-1 form latestOffset() uses.
        assert c.xrevrange("sensor", "+", "-", count=1) == [(i2, {"v": "2"})]


def test_xadd_explicit_id_semantics(redis_server):
    import pytest

    from duckdb_redis_olap_scanner_spark.transport.resp import RespError

    with RedisClient(redis_server.host, redis_server.port) as c:
        # 'ms'-only explicit ids get seq 0, like real Redis.
        assert c.xadd("mix", {"v": "a"}, entry_id="5") == "5-0"
        assert c.xadd("mix", {"v": "b"}, entry_id="5-1") == "5-1"
        # Auto ids continue strictly after the explicit last id.
        auto = c.xadd("mix", {"v": "c"})
        assert tuple(map(int, auto.split("-"))) > (5, 1)
        # Non-increasing explicit ids are rejected (keeps XRANGE paging
        # assumptions: entries always sorted).
        with pytest.raises(RespError):
            c.xadd("mix", {"v": "d"}, entry_id="5-1")
        with pytest.raises(RespError):
            c.xadd("mix", {"v": "e"}, entry_id="4")
        assert c.xlen("mix") == 3


def test_stream_source_exactly_once(engine, redis_server, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(5):
            c.xadd("metrics", {"n": str(i), "kind": "a"})

    got1 = _consume(engine, out, ckpt)
    assert sorted(r.n for r in got1.collect()) == [0, 1, 2, 3, 4]

    # New entries after the checkpointed offset: the second run must
    # deliver exactly the delta — total output is all 8, no replays.
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(5, 8):
            c.xadd("metrics", {"n": str(i), "kind": "b"})

    got2 = _consume(engine, out, ckpt)
    assert sorted(r.n for r in got2.collect()) == list(range(8))


def test_stream_fields_project_to_columns(engine, redis_server, tmp_path):
    """The raw map<string,string> projects into typed columns — the
    downstream shape for windowed aggregation over the stream."""
    with RedisClient(redis_server.host, redis_server.port) as c:
        c.xadd("metrics", {"n": "100", "kind": "c"})
    df = engine.redis_stream(key="metrics").select(
        "entry_id",
        F.col("fields")["n"].cast("long").alias("n"),
        F.col("fields")["kind"].alias("kind"),
    )
    q = (
        df.writeStream.format("memory")
        .queryName("stream_typed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = engine.spark.table("stream_typed").collect()
    assert any(r.n == 100 and r.kind == "c" for r in rows)
    assert all(isinstance(r.entry_id, str) for r in rows)


def test_stream_windowed_agg_pipeline(engine, redis_server, tmp_path):
    """Full streaming pipeline on the custom source: redis_stream →
    typed projection → watermarked tumbling-window aggregation →
    parquet sink. Results must equal the same aggregation computed in
    batch over XRANGE."""
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(60):
            ts = base + dt.timedelta(minutes=7 * i)
            c.xadd(
                "winstream",
                {"ts": ts.strftime("%Y-%m-%d %H:%M:%S"), "amt": str(i)},
            )

    stream = (
        engine.redis_stream(key="winstream")
        .select(
            F.col("fields")["ts"].cast("timestamp").alias("ts"),
            F.col("fields")["amt"].cast("long").alias("amt"),
        )
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("amt_sum"))
        .select(F.col("w.start").alias("win_start"), "n", "amt_sum")
    )
    def run_once():
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Run 1 ingests the 60 entries and advances the watermark at batch
    # end; append mode emits nothing yet. A far-future sentinel entry
    # then forces run 2 to process a batch whose watermark has passed
    # every original window, so all of them finalize and emit.
    run_once()
    with RedisClient(redis_server.host, redis_server.port) as c:
        c.xadd(
            "winstream",
            {"ts": (base + dt.timedelta(days=1)).strftime("%Y-%m-%d %H:%M:%S"),
             "amt": "0"},
        )
    run_once()

    got = {
        (r.win_start, r.n, r.amt_sum)
        for r in engine.spark.read.parquet(str(tmp_path / "out")).collect()
    }
    import collections

    agg = collections.defaultdict(lambda: [0, 0])
    for i in range(60):
        ts = base + dt.timedelta(minutes=7 * i)
        win = ts.replace(minute=0, second=0)
        agg[win][0] += 1
        agg[win][1] += i
    # Append mode emits a window once a batch runs whose STARTING
    # watermark has passed its end. Run 1 ends with watermark =
    # max_ts - 1h = 05:53, so the sentinel batch (run 2) finalizes
    # exactly the windows ending <= 05:53 — hours 0..4. Later windows
    # wait for further data; the sentinel's own window must not appear.
    wm = base + dt.timedelta(minutes=7 * 59) - dt.timedelta(hours=1)
    want = {
        (w, n, s)
        for w, (n, s) in agg.items()
        if w + dt.timedelta(hours=1) <= wm
    }
    assert got == want
    assert len(got) == 5


def test_stream_sink_roundtrip(engine, redis_server, tmp_path):
    """redis_stream SOURCE → typed projection → redis_stream SINK: the
    written stream must contain one entry per input row with the
    projected columns as fields (auto-assigned increasing ids)."""
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(6):
            c.xadd("sink_in", {"n": str(i)})

    df = engine.redis_stream(key="sink_in").select(
        F.col("fields")["n"].cast("long").alias("n"),
        (F.col("fields")["n"].cast("long") * 2).alias("doubled"),
    )
    q = (
        df.writeStream.format("redis_stream")
        .option("host", redis_server.host)
        .option("port", str(redis_server.port))
        .option("key", "sink_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    with RedisClient(redis_server.host, redis_server.port) as c:
        entries = c.xrange("sink_out")
    got = sorted((e[1]["n"], e[1]["doubled"]) for e in entries)
    assert got == [(str(i), str(i * 2)) for i in range(6)]
    # ids strictly increase (XADD auto-id contract)
    ids = [tuple(map(int, e[0].split("-"))) for e in entries]
    assert ids == sorted(set(ids))


def test_offset_regression_raises(redis_server):
    """end < start can only mean the stream was recreated or rolled
    back — return [] forever would silently drop everything below the
    old checkpoint (r14 review)."""
    import pytest as _pytest

    from duckdb_redis_olap_scanner_spark.sources.redis_stream_source import (
        RedisStreamReader,
    )

    r = RedisStreamReader(
        {"host": redis_server.host, "port": redis_server.port, "key": "s"}
    )
    assert r.partitions({"last_id": "5-0"}, {"last_id": "5-0"}) == []
    with _pytest.raises(RuntimeError, match="offset regression"):
        r.partitions({"last_id": "5-0"}, {"last_id": "3-0"})


def test_trim_loss_detected_loudly(redis_server):
    """Entries evicted past a checkpointed position must raise, not
    silently vanish from the planned XRANGE (r14 review). Initial
    0-0 batches read the surviving history by design."""
    import pytest as _pytest

    from duckdb_redis_olap_scanner_spark.sources.redis_stream_source import (
        RedisStreamReader,
        StreamRange,
    )
    from duckdb_redis_olap_scanner_spark.transport.resp import RedisClient

    key = "trimstream"
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(1, 11):
            c.xadd(key, {"v": str(i)}, entry_id=f"{i}-0")

    r = RedisStreamReader(
        {"host": redis_server.host, "port": redis_server.port, "key": key}
    )
    # checkpointed at 2-0; trim evicts up to 5-0 (keep last 5)
    part = StreamRange(
        redis_server.host, redis_server.port, key, "2-0", "10-0"
    )
    with RedisClient(redis_server.host, redis_server.port) as c:
        assert c.command("XTRIM", key, "MAXLEN", "5") == 5
    with _pytest.raises(RuntimeError, match="data loss"):
        list(r.read(part))
    # an initial batch (start 0-0) accepts the surviving history
    init = StreamRange(
        redis_server.host, redis_server.port, key, "0-0", "10-0"
    )
    assert len(list(r.read(init))) == 5
    # and a checkpointed start AT/after the eviction horizon is clean
    ok = StreamRange(
        redis_server.host, redis_server.port, key, "5-0", "10-0"
    )
    assert len(list(r.read(ok))) == 5


def test_stream_writer_rejects_all_null_row(redis_server):
    """XADD cannot represent a fieldless entry; dropping the row would
    silently break one-entry-per-row (r14 review)."""
    import pytest as _pytest
    from pyspark.sql import Row

    from duckdb_redis_olap_scanner_spark.sources.redis_stream_source import (
        RedisStreamWriter,
    )

    w = RedisStreamWriter(
        {"host": redis_server.host, "port": redis_server.port,
         "key": "wnull"}
    )
    with _pytest.raises(ValueError, match="all-NULL"):
        w.write(iter([Row(a=None, b=None)]))


def test_latest_offset_survives_full_trim(redis_server):
    """Retention of fully-consumed entries (XTRIM past everything)
    must read as 'no new data', not as an offset regression:
    last-generated-id survives deletion where the newest SURVIVING
    entry does not (r14 review)."""
    from duckdb_redis_olap_scanner_spark.sources.redis_stream_source import (
        RedisStreamReader,
    )
    from duckdb_redis_olap_scanner_spark.transport.resp import RedisClient

    key = "retained"
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(1, 6):
            c.xadd(key, {"v": str(i)}, entry_id=f"{i}-0")
        c.command("XTRIM", key, "MAXLEN", "0")  # retention of acked data

    r = RedisStreamReader(
        {"host": redis_server.host, "port": redis_server.port, "key": key}
    )
    assert r.latestOffset() == {"last_id": "5-0"}
    # checkpoint at 5-0: no new entries, no spurious regression
    assert r.partitions({"last_id": "5-0"}, r.latestOffset()) == []
    # a never-created stream still reads 0-0
    r2 = RedisStreamReader(
        {"host": redis_server.host, "port": redis_server.port,
         "key": "never-created"}
    )
    assert r2.latestOffset() == {"last_id": "0-0"}


def test_pre_xinfo_fallback_trim_is_benign(redis_server):
    """On a pre-7.0 server (no XINFO) the latest offset falls back to
    the newest SURVIVING entry; routine retention that trims everything
    at/after the checkpoint pulls it below the checkpoint. That must
    read as 'no new entries', not permanently kill the query with the
    offset-regression error (r15 ADVICE). A REAL regression on a
    modern server (no fallback marker) still raises."""
    import pytest as _pytest

    from duckdb_redis_olap_scanner_spark.sources.redis_stream_source import (
        RedisStreamReader,
    )
    from duckdb_redis_olap_scanner_spark.transport.resp import RedisClient

    key = "pre7stream"
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(1, 6):
            c.xadd(key, {"v": str(i)}, entry_id=f"{i}-0")

    redis_server.store.pre_xinfo = True
    try:
        r = RedisStreamReader(
            {"host": redis_server.host, "port": redis_server.port,
             "key": key}
        )
        off = r.latestOffset()
        assert off["last_id"] == "5-0" and off["xrevrange_fallback"]
        # consume through 5-0, then retention trims EVERYTHING away
        # (MAXLEN keeps the newest, so only a full trim can pull the
        # surviving newest below the checkpoint): fallback reads 0-0
        with RedisClient(redis_server.host, redis_server.port) as c:
            c.command("XTRIM", key, "MAXLEN", "0")
        off = r.latestOffset()
        assert off == {"last_id": "0-0", "xrevrange_fallback": True}
        assert r.partitions({"last_id": "5-0"}, off) == []
        # new entries after the trim resume normal delivery
        with RedisClient(redis_server.host, redis_server.port) as c:
            c.xadd(key, {"v": "9"}, entry_id="9-0")
        off = r.latestOffset()
        assert off["last_id"] == "9-0"
        parts = r.partitions({"last_id": "5-0"}, off)
        assert len(parts) == 1
        assert [sid for sid, _ in r.read(parts[0])] == ["9-0"]
    finally:
        redis_server.store.pre_xinfo = False
    # unmarked offsets (modern server) keep the loud rollback contract
    r = RedisStreamReader(
        {"host": redis_server.host, "port": redis_server.port, "key": key}
    )
    with _pytest.raises(RuntimeError, match="offset regression"):
        r.partitions({"last_id": "5-0"}, {"last_id": "3-0"})


def test_pre_xinfo_fallback_regression_warns_once(redis_server, caplog):
    """The benign-trim [] on pre-XINFO servers is indistinguishable
    from a genuine rollback there, so it must not be SILENT: the
    reader logs one warning naming the key, ids, and the operator's
    options — once per reader, not per trigger (ADVICE r16)."""
    import logging

    from duckdb_redis_olap_scanner_spark.sources.redis_stream_source import (
        RedisStreamReader,
    )

    r = RedisStreamReader(
        {"host": redis_server.host, "port": redis_server.port,
         "key": "warnstream"}
    )
    end = {"last_id": "3-0", "xrevrange_fallback": True}
    with caplog.at_level(
        logging.WARNING,
        logger="duckdb_redis_olap_scanner_spark.sources.redis_stream_source",
    ):
        assert r.partitions({"last_id": "5-0"}, end) == []
        assert r.partitions({"last_id": "5-0"}, end) == []
    warns = [
        rec
        for rec in caplog.records
        if "below the checkpoint" in rec.getMessage()
    ]
    assert len(warns) == 1  # once per reader, not per trigger
    msg = warns[0].getMessage()
    assert "warnstream" in msg and "5-0" in msg and "3-0" in msg
    # a fresh reader (new query/restart) warns again
    r2 = RedisStreamReader(
        {"host": redis_server.host, "port": redis_server.port,
         "key": "warnstream"}
    )
    with caplog.at_level(
        logging.WARNING,
        logger="duckdb_redis_olap_scanner_spark.sources.redis_stream_source",
    ):
        assert r2.partitions({"last_id": "5-0"}, end) == []
    assert (
        len(
            [
                rec
                for rec in caplog.records
                if "below the checkpoint" in rec.getMessage()
            ]
        )
        == 2
    )


def test_pre_xinfo_del_under_checkpoint_stays_loud(redis_server):
    """Whole-key DEL is loss even on a pre-XINFO server: the empty
    XREVRANGE fallback must NOT be marked benign when the key is gone
    (a trimmed-empty stream still EXISTS — that's the distinction), so
    partitions() keeps raising (r15 review: the first fallback fix
    silently classified DEL as benign)."""
    import pytest as _pytest

    from duckdb_redis_olap_scanner_spark.sources.redis_stream_source import (
        RedisStreamReader,
    )
    from duckdb_redis_olap_scanner_spark.transport.resp import RedisClient

    key = "pre7del"
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(1, 4):
            c.xadd(key, {"v": str(i)}, entry_id=f"{i}-0")

    redis_server.store.pre_xinfo = True
    try:
        r = RedisStreamReader(
            {"host": redis_server.host, "port": redis_server.port,
             "key": key}
        )
        # full trim: key survives -> benign marker
        with RedisClient(redis_server.host, redis_server.port) as c:
            c.command("XTRIM", key, "MAXLEN", "0")
        off = r.latestOffset()
        assert off == {"last_id": "0-0", "xrevrange_fallback": True}
        # DEL: key gone -> unmarked offset -> loud under a checkpoint
        with RedisClient(redis_server.host, redis_server.port) as c:
            c.command("DEL", key)
        off = r.latestOffset()
        assert off == {"last_id": "0-0"}
        with _pytest.raises(RuntimeError, match="offset regression"):
            r.partitions({"last_id": "3-0"}, off)
    finally:
        redis_server.store.pre_xinfo = False


def test_deleted_stream_under_checkpoint_raises(redis_server):
    """Whole-key DEL under a live checkpoint is loss ('no such key'),
    not a fresh start — the old over-broad except swallowed it and
    committed the checkpoint over the hole (r14 review)."""
    import pytest as _pytest

    from duckdb_redis_olap_scanner_spark.sources.redis_stream_source import (
        RedisStreamReader,
        StreamRange,
    )
    from duckdb_redis_olap_scanner_spark.transport.resp import RedisClient

    key = "doomed"
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(1, 4):
            c.xadd(key, {"v": str(i)}, entry_id=f"{i}-0")
        c.command("DEL", key)

    r = RedisStreamReader(
        {"host": redis_server.host, "port": redis_server.port, "key": key}
    )
    part = StreamRange(
        redis_server.host, redis_server.port, key, "1-0", "3-0"
    )
    with _pytest.raises(RuntimeError, match="deleted"):
        list(r.read(part))


def test_trim_racing_the_read_window_is_caught(redis_server):
    """A trim that lands AFTER the pre-check but evicts in-range
    unread entries must still raise: the post-paging check compares
    max-deleted-entry-id against the highest id actually delivered
    (r14 review — the next batch starts past the hole and could never
    see it)."""
    import pytest as _pytest

    from duckdb_redis_olap_scanner_spark.sources.redis_stream_source import (
        StreamRange,
        _check_no_trim_loss,
    )
    from duckdb_redis_olap_scanner_spark.transport.resp import RedisClient

    key = "racing"
    with RedisClient(redis_server.host, redis_server.port) as c:
        for i in range(1, 11):
            c.xadd(key, {"v": str(i)}, entry_id=f"{i}-0")
        part = StreamRange(
            redis_server.host, redis_server.port, key, "2-0", "10-0"
        )
        # pre-check clean (nothing deleted yet)
        _check_no_trim_loss(c, part)
        # the race: eviction up to 6-0 while the reader had only
        # delivered through 4-0
        c.command("XTRIM", key, "MAXLEN", "4")
        with _pytest.raises(RuntimeError, match="data loss"):
            _check_no_trim_loss(c, part, floor_id="4-0")
        # delivered through 6-0 already -> everything evicted was
        # delivered; clean
        _check_no_trim_loss(c, part, floor_id="6-0")


def test_xinfo_stream_both_protocols(redis_server):
    """The transport's xinfo_stream handles the RESP2 flat array and
    the RESP3 map reply shapes identically (r14 review: a hand-rolled
    flat-array zip broke under RESP3)."""
    from duckdb_redis_olap_scanner_spark.transport.resp import RedisClient

    key = "infostream"
    with RedisClient(redis_server.host, redis_server.port) as c:
        c.xadd(key, {"v": "1"}, entry_id="7-0")
    for proto in (2, 3):
        with RedisClient(
            redis_server.host, redis_server.port, protocol=proto
        ) as c:
            info = c.xinfo_stream(key)
            assert "last-generated-id" in info
            assert "max-deleted-entry-id" in info
