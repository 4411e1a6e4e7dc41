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


def test_resp3_parse_branches():
    """Direct wire-bytes coverage for the RESP3 tag set (double, bool,
    big number, null, verbatim, set, map, push) — branches a RESP2-only
    server never produces."""
    from duckdb_redis_olap_scanner_spark.transport.resp import _parse, _SocketReader

    class OneShot:
        def __init__(self, data: bytes) -> None:
            self.data = data

        def recv(self, _n: int) -> bytes:
            d, self.data = self.data, b""
            return d

    def parse(wire: bytes):
        return _parse(_SocketReader(OneShot(wire)))

    assert parse(b",3.25\r\n") == 3.25
    assert parse(b"#t\r\n") is True
    assert parse(b"#f\r\n") is False
    assert parse(b"(12345678901234567890123\r\n") == 12345678901234567890123
    assert parse(b"_\r\n") is None
    assert parse(b"=8\r\ntxt:abcd\r\n") == b"abcd"
    assert parse(b"~2\r\n:1\r\n:2\r\n") == [1, 2]
    assert parse(b">2\r\n+pub\r\n:7\r\n") == ["pub", 7]
    assert parse(b"%2\r\n$1\r\na\r\n:1\r\n$1\r\nb\r\n:2\r\n") == {"a": 1, "b": 2}
    assert parse(b"$-1\r\n") is None
    assert parse(b"*-1\r\n") is None
