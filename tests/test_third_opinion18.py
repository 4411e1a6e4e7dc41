"""Third-opinion audit, batch 18 (r17): the redis golden entries read
back through an INDEPENDENT raw-socket RESP2 client.

The redis entries' oracles are closed-form SQL (the fixture is
deterministic), so the oracle gate never exercises a second CLIENT:
the product's transport/source stack is the only reader of the wire.
These audits add one — a ~50-line RESP2 client typed from the
protocol spec (inline socket reads, recursive reply parse, its own
SCAN cursor loop) — and derive every expected row from WHAT THE
SERVER ACTUALLY RETURNS to that client, then compare against the
entry's Spark output. A transport bug that consistently misread the
wire (wrong bulk length handling, cursor mis-pagination, map-shape
confusion) would disagree here even if the closed-form oracle still
matched.

Entries audited here: redis_scan_golden, redis_kv_golden,
redis_get_over_scan, redis_ttl_over_scan, redis_hash_maptype,
redis_zset_golden, redis_zset_topk, redis_list_golden,
redis_parquet_join, redis_cluster_scan, redduck_scalar.
"""

from __future__ import annotations

import socket

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark import testing as RT
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401

    return catalog.registry()


@pytest.fixture(autouse=True)
def _golden_env(monkeypatch):
    """The entries take the golden-server path only when no real
    server is configured — same as the driver's gate."""
    monkeypatch.delenv("SPARK_GRAFT_REDIS_ADDR", raising=False)


class RawResp:
    """Minimal RESP2 client: arrays of bulk strings out, recursive
    reply parse in. Independent of transport/resp.py by construction
    (no shared code, no pipelining, blocking single-command reads)."""

    def __init__(self, addr: str) -> None:
        host, port = addr.rsplit(":", 1)
        self.sock = socket.create_connection((host, int(port)), timeout=10)
        self.buf = b""

    def close(self) -> None:
        self.sock.close()

    def cmd(self, *args: str):
        out = b"*%d\r\n" % len(args)
        for a in args:
            b = a.encode("utf-8")
            out += b"$%d\r\n" % len(b) + b + b"\r\n"
        self.sock.sendall(out)
        return self._reply()

    def _line(self) -> bytes:
        while b"\r\n" not in self.buf:
            self.buf += self.sock.recv(4096)
        line, self.buf = self.buf.split(b"\r\n", 1)
        return line

    def _exact(self, n: int) -> bytes:
        while len(self.buf) < n + 2:
            self.buf += self.sock.recv(4096)
        data, self.buf = self.buf[:n], self.buf[n + 2 :]
        return data

    def _reply(self):
        line = self._line()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return rest.decode("utf-8")
        if t == b"-":
            raise AssertionError(f"server error: {rest.decode()}")
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            return None if n == -1 else self._exact(n).decode("utf-8")
        if t == b"*":
            n = int(rest)
            return None if n == -1 else [self._reply() for _ in range(n)]
        raise AssertionError(f"unexpected reply tag {line!r}")

    def scan(self, pattern: str) -> list[str]:
        cursor, keys = "0", []
        while True:
            cur, page = self.cmd(
                "SCAN", cursor, "MATCH", pattern, "COUNT", "7"
            )
            keys += page
            cursor = cur
            if cursor == "0":
                return keys


@pytest.fixture(scope="module")
def raw():
    c = RawResp(RT.golden_server_address())
    yield c
    c.close()


def _rows(reg, spark, name: str, cols: list[str]) -> list[tuple]:
    df = reg[name].fn(spark, SF_DIR).select(*cols)
    return sorted(tuple(r) for r in df.collect())


def test_scan_golden(reg, spark, raw):
    keys = raw.scan("testkey:*")
    assert len(keys) == 10  # the documented fixture size
    want = sorted((k,) for k in keys)
    assert _rows(reg, spark, "redis_scan_golden", ["key_name"]) == want


def test_kv_golden_and_get_over_scan(reg, spark, raw):
    kv = sorted((k, raw.cmd("GET", k)) for k in raw.scan("testkey:*"))
    assert all(v is not None for _k, v in kv)
    assert _rows(reg, spark, "redis_kv_golden", ["key", "value"]) == kv
    assert _rows(
        reg, spark, "redis_get_over_scan", ["key_name", "value"]
    ) == kv


def test_ttl_over_scan(reg, spark, raw):
    want = sorted((k, raw.cmd("TTL", k)) for k in raw.scan("testkey:*"))
    assert _rows(
        reg, spark, "redis_ttl_over_scan", ["key_name", "ttl"]
    ) == want


def test_hash_maptype(reg, spark, raw):
    want = []
    for k in raw.scan("user:*"):
        flat = raw.cmd("HGETALL", k)
        h = dict(zip(flat[0::2], flat[1::2]))
        fields = ",".join(f"{f}={h[f]}" for f in sorted(h))
        want.append((k, h["name"], fields))
    assert len(want) == 2
    assert _rows(
        reg, spark, "redis_hash_maptype", ["key", "name_field", "fields"]
    ) == sorted(want)


def test_zset_golden_and_topk(reg, spark, raw):
    flat = raw.cmd("ZRANGE", "rank:global", "0", "-1", "WITHSCORES")
    pairs = [
        (m, float(s)) for m, s in zip(flat[0::2], flat[1::2])
    ]
    assert len(pairs) == 10
    want = sorted((m, s, i) for i, (m, s) in enumerate(pairs))
    assert _rows(
        reg, spark, "redis_zset_golden", ["member", "score", "rank"]
    ) == want
    topk = sorted(pairs, key=lambda t: -t[1])[:3]
    assert _rows(reg, spark, "redis_zset_topk", ["member", "score"]) \
        == sorted(topk)


def test_list_golden(reg, spark, raw):
    elems = raw.cmd("LRANGE", "queue:jobs", "0", "-1")
    assert len(elems) == 8
    want = sorted((i, e) for i, e in enumerate(elems))
    assert _rows(reg, spark, "redis_list_golden", ["pos", "element"]) \
        == want


def test_parquet_join(reg, spark, raw):
    cust = {
        int(r.c_custkey): r.c_name
        for r in pd.read_parquet(
            f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_name"]
        ).itertuples(index=False)
    }
    want = []
    for k in raw.scan("testkey:*"):
        i = int(k.rsplit(":", 1)[1])
        if i in cust:
            want.append((k, raw.cmd("GET", k), cust[i]))
    assert len(want) == 10
    assert _rows(
        reg, spark, "redis_parquet_join", ["key", "value", "c_name"]
    ) == sorted(want)


def test_cluster_scan(reg, spark):
    seed = RawResp(RT.golden_cluster_address())
    try:
        slots = seed.cmd("CLUSTER", "SLOTS")
        assert len(slots) == 3
        all_keys: list[str] = []
        for _lo, _hi, node in slots:
            host, port = node[0], node[1]
            c = RawResp(f"{host}:{port}")
            try:
                all_keys += c.scan("clusterkey:*")
            finally:
                c.close()
    finally:
        seed.close()
    # every key exactly once across the topology
    assert len(all_keys) == len(set(all_keys)) == 30
    want = sorted((k,) for k in all_keys)
    assert _rows(reg, spark, "redis_cluster_scan", ["key_name"]) == want


def test_redduck_scalar(reg, spark):
    nations = pd.read_parquet(
        f"{SF_DIR}/nation.parquet", columns=["n_name"]
    )["n_name"].tolist()
    want = sorted(
        (n, f"Redduck {n} \U0001f425", "name is set") for n in nations
    )
    assert _rows(
        reg, spark, "redduck_scalar", ["n_name", "quacked", "named"]
    ) == want
