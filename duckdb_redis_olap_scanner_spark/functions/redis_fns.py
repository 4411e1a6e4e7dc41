"""Scalar function surface mirroring the reference extension's scalars.

Reference registrations (``src/redduck_extension.cpp:348-362``):

* ``redis_get(key) -> VARCHAR`` — per-row GET, one TCP round trip per row
  under a mutex (``redduck_extension.cpp:327-342``).  Here: an
  iterator-of-Series ``pandas_udf`` holding ONE connection per executor
  partition and issuing pipelined ``MGET`` per Arrow batch — identical
  semantics, O(rows/batch) round trips instead of O(rows).
* ``redduck(name) -> VARCHAR`` — template demo returning
  ``"Redduck <name> 🐥"`` (``redduck_extension.cpp:17-22``).
* ``set_name(name) -> VARCHAR`` — template demo returning the constant
  ``"name is set"`` (``redduck_extension.cpp:24-40``).

Missing-key semantics: the reference coerces a missing key to ``""``
(``src/transport/redis_client.cpp:232-236``).  We surface SQL NULL by
default (the correct relational answer) and provide
``missing="empty"`` for bug-compatible behavior; tests pin both.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import MapType, StringType

from ..transport.resp import RedisClient

# Keys per MGET pipeline call; Arrow batches are typically 10k rows, and a
# single MGET of that size is one round trip — chunk to bound reply size.
MGET_CHUNK = 2048


def make_redis_get(host: str, port: int, missing: str = "null"):
    """Build a ``redis_get(col) -> string`` Arrow-vectorized UDF.

    One connection per executor partition (lazy, inside the iterator —
    sockets never pickle), one MGET round trip per chunk.
    """
    fill_empty = missing == "empty"

    @pandas_udf(StringType())
    def redis_get(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        with RedisClient(host, port) as client:
            for keys in batches:
                out: list[str | None] = []
                kl = keys.tolist()
                for i in range(0, len(kl), MGET_CHUNK):
                    chunk = kl[i : i + MGET_CHUNK]
                    # SQL null-in → null-out: a NULL key is NOT the
                    # legal Redis key "" (substituting "" returned that
                    # key's value / conflated NULL with missing — r14
                    # review). NULL positions never reach the wire;
                    # missing="empty" applies to missing KEYS only.
                    idx = [j for j, k in enumerate(chunk) if k is not None]
                    fetched = (
                        client.mget([chunk[j] for j in idx]) if idx else []
                    )
                    vals: list[str | None] = [None] * len(chunk)
                    for j, v in zip(idx, fetched):
                        vals[j] = v if v is not None or not fill_empty else ""
                    out.extend(vals)
                yield pd.Series(out, dtype="object")

    return redis_get


def make_redis_ttl(host: str, port: int):
    """Build a ``redis_ttl(key) -> long`` Arrow-vectorized UDF — the
    LongType surface SURVEY §3 reserved for the RESP integer type
    (the reference parses ``:`` replies but never exposes one to SQL).
    Redis semantics pass through untouched: seconds remaining, ``-1``
    for a key with no expiry, ``-2`` for a missing key. One connection
    per executor partition, one pipelined round trip per chunk."""

    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def redis_ttl(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        with RedisClient(host, port) as client:
            for keys in batches:
                kl = keys.tolist()
                out: list[int | None] = []
                for i in range(0, len(kl), MGET_CHUNK):
                    chunk = kl[i : i + MGET_CHUNK]
                    # SQL null-in → null-out: TTL(NULL) is NULL, not
                    # the -2 of a missing key (and never the TTL of
                    # the legal key "" — r14 review).
                    idx = [j for j, k in enumerate(chunk) if k is not None]
                    # pipeline_checked: TTL never errors on a live
                    # standalone node, but a cluster reshard answers
                    # -MOVED — replayed on the target; anything else
                    # raises instead of crashing int() opaquely.
                    replies = (
                        client.pipeline_checked(
                            [("TTL", chunk[j]) for j in idx]
                        )
                        if idx
                        else []
                    )
                    vals: list[int | None] = [None] * len(chunk)
                    for j, r in zip(idx, replies):
                        vals[j] = int(r)
                    out.extend(vals)
                # pandas nullable Int64 → Arrow int64 with nulls
                yield pd.Series(out, dtype="Int64")

    return redis_ttl


def make_redis_hgetall(host: str, port: int):
    """Build a ``redis_hgetall(key) -> map<string,string>`` UDF.

    The reference documents this as returning a STRUCT (``README.md:36-38``)
    but never implements it; MapType is the schema-free Spark analogue.
    """

    @pandas_udf(MapType(StringType(), StringType()))
    def redis_hgetall(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        with RedisClient(host, port) as client:
            for keys in batches:
                kl = keys.tolist()
                maps: list[dict | None] = []
                for i in range(0, len(kl), MGET_CHUNK):
                    chunk = kl[i : i + MGET_CHUNK]
                    # SQL null-in → null-out (not the {} of a missing
                    # key, and never the hash at the legal key "" —
                    # r14 review)
                    idx = [j for j, k in enumerate(chunk) if k is not None]
                    fetched = (
                        client.hgetall_pipelined([chunk[j] for j in idx])
                        if idx
                        else []
                    )
                    vals: list[dict | None] = [None] * len(chunk)
                    for j, m in zip(idx, fetched):
                        vals[j] = m
                    maps.extend(vals)
                yield pd.Series(maps, dtype="object")

    return redis_hgetall


def redduck(name: Column | str) -> Column:
    """``redduck(name) -> 'Redduck <name> 🐥'`` — pure column expression,
    JVM-side (no UDF needed for a concat)."""
    col = F.col(name) if isinstance(name, str) else name
    return F.concat(F.lit("Redduck "), col, F.lit(" \U0001f425"))


def set_name(name: Column | str) -> Column:  # noqa: ARG001 - parity signature
    """``set_name(name) -> 'name is set'`` — constant per row, as in the
    reference demo scalar."""
    return F.lit("name is set")
