"""Catalog entries exercising the Redis surface against a live server.

The server address comes from ``SPARK_GRAFT_REDIS_ADDR`` (a real,
pre-seeded Redis — the reference's own tests likewise assume one,
``test/sql/scan.test:18``); when unset, the entries fall back to the
in-process fake server that ``testing.golden_server_address`` starts
and seeds (no external Redis exists in this test environment). The
server bootstrap lives entirely in ``testing`` — no catalog code
starts servers.

The golden keyspace (testkey:0001..0010) makes the oracle expressible
as pure generated SQL in DuckDB — a hash-match check with no tables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..engine import Engine, ship_package
from .catalog import register


def _engine(spark: SparkSession) -> Engine:
    """Connect an Engine to the configured (or golden test) server.
    Ships the package to Python workers first (the driver may have
    created the session without our PYTHONPATH)."""
    addr = os.environ.get("SPARK_GRAFT_REDIS_ADDR")
    if addr is None:
        from ..testing import golden_server_address

        addr = golden_server_address()
    ship_package(spark)
    eng = Engine(spark)
    eng.connect(addr)
    return eng


@register(
    "redis_scan_golden",
    oracle="""
    SELECT 'testkey:' || lpad(CAST(i AS VARCHAR), 4, '0') AS key_name
    FROM range(1, 11) t(i)
    """,
    tags=("redis",),
    doc="redis_scan('testkey:*') — golden parity with the reference's "
    "test/sql/scan.test:19-29 keyspace.",
)
def redis_scan_golden(spark: SparkSession, sf: str):
    return _engine(spark).redis_scan("testkey:*")


@register(
    "redis_cluster_scan",
    # The golden cluster keyspace (clusterkey:0001..0030) is split
    # across three fake nodes by REAL CRC16 slot ownership; the scan
    # must union the per-node SCANs exactly once, so the hash pins
    # both completeness (a missed node drops rows) and
    # duplicate-freedom (a double-scanned multi-range master repeats
    # them).
    oracle="""
    SELECT 'clusterkey:' || lpad(CAST(i AS VARCHAR), 4, '0') AS key_name
    FROM range(1, 31) t(i)
    """,
    tags=("redis",),
    doc="redis_scan with cluster_slots=true over a three-node fake "
    "cluster topology — CLUSTER SLOTS discovery, one InputPartition "
    "per master, disjoint per-node keyspaces (SURVEY §4.1's "
    "production scale path).",
)
def redis_cluster_scan(spark: SparkSession, sf: str):
    from ..engine import register_datasources
    from ..testing import golden_cluster_address

    # Fresh-session safe: unlike the _engine() entries this one reads the
    # data source directly, so it must register it itself — relying on a
    # sibling entry having run first is an ordering bug (r10's only red).
    ship_package(spark)
    register_datasources(spark)
    host, port = golden_cluster_address().split(":")
    return (
        spark.read.format("redis_scan")
        .option("host", host)
        .option("port", port)
        .option("pattern", "clusterkey:*")
        .option("cluster_slots", "true")
        .load()
    )


@register(
    "redis_kv_golden",
    oracle="""
    SELECT 'testkey:' || lpad(CAST(i AS VARCHAR), 4, '0') AS key,
           'value:' || lpad(CAST(i AS VARCHAR), 4, '0') AS value
    FROM range(1, 11) t(i)
    """,
    tags=("redis",),
    doc="redis_kv('testkey:*') — the documented-but-unimplemented batch "
    "KV surface (reference README.md:30-31), SCAN + pipelined MGET.",
)
def redis_kv_golden(spark: SparkSession, sf: str):
    return _engine(spark).redis_kv("testkey:*")


@register(
    "redis_get_over_scan",
    oracle="""
    SELECT 'testkey:' || lpad(CAST(i AS VARCHAR), 4, '0') AS key_name,
           'value:' || lpad(CAST(i AS VARCHAR), 4, '0') AS value
    FROM range(1, 11) t(i)
    """,
    tags=("redis",),
    doc="SELECT key, redis_get(key) FROM redis_scan(p) — the reference's "
    "README.md:33-34 projection, via Arrow-vectorized UDF with MGET batching.",
)
def redis_get_over_scan(spark: SparkSession, sf: str):
    eng = _engine(spark)
    g = eng.redis_get_udf()
    return eng.redis_scan("testkey:*").select(
        "key_name", g("key_name").alias("value")
    )


@register(
    "redis_ttl_over_scan",
    # The golden keyspace is seeded WITHOUT expirations, so TTL is
    # deterministically -1 for every key — on the fake server and on
    # any real Redis seeded per the reference's scan.test alike. The
    # entry pins the RESP integer type surfacing to LongType (SURVEY
    # §3 reserved that mapping; the reference parses ':' replies but
    # never exposes one to SQL). Expiring-key plumbing (-2 missing,
    # positive seconds) is pinned by unit tests against seeded TTLs.
    oracle="""
    SELECT 'testkey:' || lpad(CAST(i AS VARCHAR), 4, '0') AS key_name,
           CAST(-1 AS BIGINT) AS ttl
    FROM range(1, 11) t(i)
    """,
    tags=("redis",),
    doc="SELECT key, redis_ttl(key) FROM redis_scan(p) — the RESP "
    "integer reply surfaced as LongType via an Arrow-vectorized UDF "
    "with pipelined TTL batching.",
)
def redis_ttl_over_scan(spark: SparkSession, sf: str):
    eng = _engine(spark)
    t = eng.redis_ttl_udf()
    return eng.redis_scan("testkey:*").select(
        "key_name", t("key_name").alias("ttl")
    )


@register(
    "redis_hash_maptype",
    oracle="""
    SELECT * FROM (VALUES
        ('user:1001', 'ada',   'age=36,name=ada'),
        ('user:1002', 'grace', 'city=nyc,name=grace')
    ) t(key, name_field, fields)
    """,
    tags=("redis",),
    doc="redis_hash('user:*') → (key, map<string,string>) — the documented "
    "redis_hgetall STRUCT surface (reference README.md:36-38) as MapType. "
    "The MapType column itself is exercised by the name-field lookup and "
    "the sorted-entries projection; the entry's OUTPUT flattens the map to "
    "a deterministic 'k=v,...' string (sorted by key) because map cells "
    "are not hash-comparable by the driver's canonicalizer.",
)
def redis_hash_maptype(spark: SparkSession, sf: str):
    fields = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(F.col("value"))),
            lambda e: F.concat_ws("=", e["key"], e["value"]),
        ),
        ",",
    )
    return (
        _engine(spark)
        .redis_hash("user:*")
        .select(
            "key",
            F.col("value")["name"].alias("name_field"),
            fields.alias("fields"),
        )
    )


@register(
    "redduck_scalar",
    oracle="""
    SELECT n_name, 'Redduck ' || n_name || ' \U0001f425' AS quacked,
           'name is set' AS named
    FROM nation
    """,
    tags=("redis",),
    doc="The reference's template demo scalars redduck()/set_name() "
    "(redduck_extension.cpp:17-40) as pure column expressions.",
)
def redduck_scalar(spark: SparkSession, sf: str):
    from ..functions.redis_fns import redduck, set_name
    from .catalog import table

    n = table(spark, sf, "nation")
    return n.select(
        "n_name",
        redduck("n_name").alias("quacked"),
        set_name("n_name").alias("named"),
    )


@register(
    "redis_zset_golden",
    oracle="""
    SELECT 'item:' || lpad(CAST(i AS VARCHAR), 4, '0') AS member,
           CAST(i * 10 AS DOUBLE) AS score,
           CAST(i - 1 AS INT) AS rank
    FROM range(1, 11) t(i)
    """,
    tags=("redis",),
    doc="redis_zset('rank:global') — sorted-set source: ZRANGE 0 -1 "
    "WITHSCORES in ascending (score, member) order with ranks "
    "attached; completes the container-type surface (string/hash/"
    "stream/zset/list) beyond the reference's string-only scan. One "
    "partition per key; the ZADD write path round-trips in "
    "tests/test_redis_sources.py.",
)
def redis_zset_golden(spark: SparkSession, sf: str):
    return _engine(spark).redis_zset("rank:global")


@register(
    "redis_list_golden",
    oracle="""
    SELECT CAST(i - 1 AS INT) AS pos,
           'job:' || lpad(CAST(i AS VARCHAR), 4, '0') AS element
    FROM range(1, 9) t(i)
    """,
    tags=("redis",),
    doc="redis_list('queue:jobs') — list source: LRANGE 0 -1 in "
    "insertion order with positions. Deliberately read-only as a "
    "batch source (a partition-parallel RPUSH would interleave "
    "nondeterministically; append flows belong to the stream sink).",
)
def redis_list_golden(spark: SparkSession, sf: str):
    return _engine(spark).redis_list("queue:jobs")


@register(
    "redis_zset_topk",
    oracle="""
    SELECT 'item:' || lpad(CAST(i AS VARCHAR), 4, '0') AS member,
           CAST(i * 10 AS DOUBLE) AS score
    FROM range(8, 11) t(i)
    ORDER BY score DESC
    """,
    tags=("redis", "topk"),
    doc="Leaderboard head over the sorted-set source: ORDER BY score "
    "DESC LIMIT 3 on redis_zset plans as TakeOrderedAndProject over "
    "the source partitions — the relational surface composing "
    "directly over a Redis container type.",
)
def redis_zset_topk(spark: SparkSession, sf: str):
    z = _engine(spark).redis_zset("rank:global")
    return (
        z.select("member", "score").orderBy(F.desc("score")).limit(3)
    )


@register(
    "redis_parquet_join",
    oracle="""
    SELECT 'testkey:' || lpad(CAST(i AS VARCHAR), 4, '0') AS key,
           'value:' || lpad(CAST(i AS VARCHAR), 4, '0') AS value,
           c.c_name
    FROM range(1, 11) t(i)
    JOIN customer c ON c.c_custkey = i
    """,
    tags=("redis", "join"),
    doc="THE reference's use case as one query: operational Redis "
    "state joined to the warehouse — redis_kv('testkey:*') "
    "equi-joined to the parquet customer dim on the key's numeric "
    "suffix. The Redis side is 10 rows, so AQE broadcasts it and the "
    "customer scan never shuffles; at real scale a sharded scan "
    "(shard_patterns) feeds the same join.",
)
def redis_parquet_join(spark: SparkSession, sf: str):
    from .catalog import table

    kv = _engine(spark).redis_kv("testkey:*")
    cust = table(spark, sf, "customer")
    keyed = kv.withColumn(
        "ck", F.substring("key", 9, 4).cast("long")
    )
    return (
        keyed.join(cust, keyed["ck"] == cust["c_custkey"])
        .select("key", "value", "c_name")
    )
