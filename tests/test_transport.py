"""Unit tests for the pure-Python RESP transport (no Spark)."""

from __future__ import annotations

import pytest

from duckdb_redis_olap_scanner_spark.transport.resp import (
    RedisClient,
    RespError,
    encode_command,
    parse_host_port,
)


def test_encode_command():
    assert (
        encode_command("SCAN", "0", "MATCH", "p:*", "COUNT", 2048)
        == b"*6\r\n$4\r\nSCAN\r\n$1\r\n0\r\n$5\r\nMATCH\r\n$3\r\np:*\r\n$5\r\nCOUNT\r\n$4\r\n2048\r\n"
    )


def test_parse_host_port():
    assert parse_host_port("127.0.0.1:6379") == ("127.0.0.1", 6379)
    assert parse_host_port("myhost:10") == ("myhost", 10)
    for bad in ["127.0.0.1", ":6379", "host:", None]:
        with pytest.raises(ValueError):
            parse_host_port(bad)


def test_ping_get_mget(redis_server):
    with RedisClient(redis_server.host, redis_server.port) as c:
        assert c.ping()
        assert c.get("testkey:0001") == "value:0001"
        # Missing key is SQL NULL, not "" (documented deviation from the
        # reference's empty-string quirk, redis_client.cpp:232-236).
        assert c.get("missing-key") is None
        assert c.mget(["testkey:0002", "missing", "testkey:0003"]) == [
            "value:0002",
            None,
            "value:0003",
        ]


def test_scan_batching_and_glob(redis_server):
    with RedisClient(redis_server.host, redis_server.port) as c:
        # Small COUNT forces multiple cursor round trips.
        keys = [k for batch in c.scan_iter("testkey:*", count=3) for k in batch]
        assert sorted(keys) == [f"testkey:{i:04d}" for i in range(1, 11)]
        # Glob '?' single-char wildcard.
        keys = [k for b in c.scan_iter("testkey:000?", count=100) for k in b]
        assert sorted(keys) == [f"testkey:{i:04d}" for i in range(1, 10)]
        # Non-matching pattern → empty, loop still terminates.
        assert [k for b in c.scan_iter("zzz:*") for k in b] == []


def test_hgetall(redis_server):
    with RedisClient(redis_server.host, redis_server.port) as c:
        assert c.hgetall("user:1001") == {"name": "ada", "age": "36"}
        assert c.hgetall("no-such-hash") == {}
        maps = c.hgetall_pipelined(["user:1001", "user:1002", "nope"])
        assert maps[1] == {"name": "grace", "city": "nyc"}
        assert maps[2] == {}


def test_error_reply(redis_server):
    with RedisClient(redis_server.host, redis_server.port) as c:
        with pytest.raises(RespError):
            c.command("NOSUCHCOMMAND")
