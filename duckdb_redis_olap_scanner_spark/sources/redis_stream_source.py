"""Structured Streaming source for Redis Streams (XADD/XRANGE).

The reference is batch-only (SURVEY.md §2.B: streaming "none"); this is
the engine's streaming growth path on the source axis: a Redis Stream
consumed as an unbounded table with exactly-once progress tracking.

Offsets are native Redis stream entry IDs ("ms-seq") — totally ordered
and durable on the server, so the checkpointed offset alone guarantees
exactly-once delivery across restarts:

* ``initialOffset``  → ``{"last_id": "0-0"}`` (before everything)
* ``latestOffset``   → the id of the newest entry at poll time
* ``partitions``     → one range partition ``(start, end]`` per trigger
* ``read``           → ``XRANGE (start end`` (exclusive start, Redis
  6.2 syntax) batched with COUNT — entries stream out in Arrow-friendly
  tuples without driver materialization of the whole range

Schema: (entry_id string, fields map<string,string>) — the raw shape;
downstream plans project map fields into typed columns.

Scale: a single Redis Stream is inherently ordered → one partition per
micro-batch (like the SCAN cursor, this matches the data structure's
contract). Fan-out at 100 TB comes from many streams (one per shard /
producer), each its own source in a union — the per-stream reader stays
sequential by design.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..transport.resp import RedisClient

BATCH_COUNT = 2048  # XRANGE COUNT page size, parity with SCAN COUNT


class StreamRange(InputPartition):
    def __init__(
        self, host: str, port: int, key: str, start_id: str, end_id: str
    ) -> None:
        self.host = host
        self.port = port
        self.key = key
        self.start_id = start_id  # exclusive
        self.end_id = end_id  # inclusive


def _id_key(sid: str) -> tuple[int, int]:
    ms, seq = sid.split("-")
    return (int(ms), int(seq))


class RedisStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 6379))
        self.key = options.get("key", "events")

    def initialOffset(self) -> dict:
        return {"last_id": "0-0"}

    def latestOffset(self) -> dict:
        # Newest id only (XREVRANGE ... COUNT 1): O(1) per trigger.
        # An XRANGE over the full stream here would materialize every
        # entry on the driver at every micro-batch.
        with RedisClient(self.host, self.port) as c:
            entries = c.xrevrange(self.key, "+", "-", count=1)
            if not entries:
                return {"last_id": "0-0"}
            return {"last_id": entries[0][0]}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        if _id_key(end["last_id"]) <= _id_key(start["last_id"]):
            return []
        return [
            StreamRange(
                self.host, self.port, self.key, start["last_id"], end["last_id"]
            )
        ]

    def read(self, part: StreamRange) -> Iterator[tuple]:
        with RedisClient(part.host, part.port) as c:
            cursor = part.start_id
            while True:
                page = c.xrange(
                    part.key, f"({cursor}", part.end_id, count=BATCH_COUNT
                )
                if not page:
                    return
                for sid, fields in page:
                    yield (sid, fields)
                cursor = page[-1][0]
                if _id_key(cursor) >= _id_key(part.end_id):
                    return

    def commit(self, end: dict) -> None:
        # Progress is tracked by Spark's checkpoint; nothing server-side
        # to acknowledge for XRANGE consumption.
        pass


class RedisStreamWriter(DataSourceStreamWriter):
    """Streaming sink: every row of the micro-batch becomes one XADD
    entry (auto id '*'), each column a stream field (nulls skipped),
    pipelined one round trip per ``batch_size`` rows per partition —
    the write-side mirror of the XRANGE COUNT paging on the read path.

    Delivery is AT-LEAST-ONCE: auto-id XADD is not idempotent, so a
    partition retried after a fault appends its rows again (the same
    trade every non-transactional append sink makes). Downstream
    consumers that need exactly-once dedup on a row key — e.g. the
    engine's own ``dropDuplicatesWithinWatermark`` operator."""

    def __init__(self, options: dict) -> None:
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 6379))
        self.key = options.get("key", "events")
        self.batch_size = int(options.get("batch_size", BATCH_COUNT))

    def write(self, rows) -> WriterCommitMessage:
        with RedisClient(self.host, self.port) as client:
            batch: list[tuple] = []
            for row in rows:
                flat: list[str] = []
                for col, val in row.asDict().items():
                    if val is not None:
                        flat += [col, str(val)]
                if not flat:
                    continue
                batch.append(("XADD", self.key, "*", *flat))
                if len(batch) >= self.batch_size:
                    client.pipeline_checked(batch)
                    batch = []
            if batch:
                client.pipeline_checked(batch)
        return WriterCommitMessage()


class RedisStreamDataSource(DataSource):
    """``spark.readStream.format("redis_stream").option("key", k).load()``
    and ``df.writeStream.format("redis_stream").option("key", k)...``"""

    @classmethod
    def name(cls) -> str:
        return "redis_stream"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("entry_id", StringType(), False),
                StructField("fields", MapType(StringType(), StringType()), True),
            ]
        )

    def streamReader(self, schema: StructType) -> RedisStreamReader:
        return RedisStreamReader(self.options)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> RedisStreamWriter:
        return RedisStreamWriter(self.options)
