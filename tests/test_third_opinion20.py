"""Third-opinion audit, batch 20 (r17): compressed ingest, WebDataset
tar arithmetic, skew-salted operators, and the approximate-aggregate
exactness columns.

* gzip / xz+bz2 ingest — expected (n_raw, flags, md5-of-recovered)
  derived from the pandas-read source text; additionally the real
  stdlib codecs round-trip each document in the TEST process, so the
  claim "the worker recovered the bytes" is cross-checked by a second
  compress/decompress outside Spark.
* WebDataset — tar sizes re-derived TWICE: from the ustar block
  formula AND by actually building each 2-member tar with stdlib
  tarfile and measuring it; shard routing re-derived through the
  audit-reference md5 fold ([[third_opinion_refs]]), per-shard
  payload md5 from doc_id-ordered concatenation.
* skew_salted_agg / skew_salted_join — the salted plans must produce
  EXACTLY the unsalted answer; re-derived with dict loops.
* agg_approx_* — the exact columns re-derived in python (numpy linear
  interpolation for quantile_cont); the *_ok booleans are asserted
  True, i.e. the engine's estimate fell inside its documented bound.

Entries audited here: pipeline_gzip_ingest, pipeline_xz_bz2_ingest,
pipeline_webdataset_ingest, pipeline_webdataset_shards,
skew_salted_agg, skew_salted_join, agg_approx_distinct,
agg_approx_percentile, agg_hll_sketch_union.
"""

from __future__ import annotations

import bz2
import gzip
import hashlib
import io
import lzma
import math
import tarfile

import numpy as np
import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR
from .third_opinion_refs import _canon, _md5_64


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401

    return catalog.registry()


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _rows(reg, spark, name, cols):
    df = reg[name].fn(spark, SF_DIR).select(*cols)
    return sorted(tuple(r) for r in df.collect())


def test_gzip_ingest(reg, spark, docs):
    want = []
    for r in docs.itertuples(index=False):
        text = r.text or ""
        # second-process round trip: stdlib gzip must recover the text
        assert gzip.decompress(gzip.compress(text.encode())) == \
            text.encode()
        want.append((r.doc_id, len(text.encode()), True, _md5(text)))
    got = _rows(reg, spark, "pipeline_gzip_ingest",
                ["doc_id", "n_raw", "is_gzip", "raw_md5"])
    assert got == sorted(want)


def test_xz_bz2_ingest(reg, spark, docs):
    want = []
    for r in docs.itertuples(index=False):
        text = (r.text or "").encode()
        assert lzma.decompress(lzma.compress(text)) == text
        assert bz2.decompress(bz2.compress(text)) == text
        want.append((r.doc_id, len(text), True, True, _md5(r.text or "")))
    got = _rows(reg, spark, "pipeline_xz_bz2_ingest",
                ["doc_id", "n_raw", "xz_ok", "bz2_ok", "raw_md5"])
    assert got == sorted(want)


def _meta_json(r) -> str:
    return (
        '{"lang": "' + (r.lang or "") + '", "source": "'
        + (r.source or "") + '"}'
    )


def _tar_bytes_formula(sizes: list[int]) -> int:
    blocks = 2 + sum(1 + math.ceil(n / 512) for n in sizes)
    return 10240 * math.ceil(512 * blocks / 10240)


def _tar_bytes_real(sizes: list[int]) -> int:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i, n in enumerate(sizes):
            info = tarfile.TarInfo(name=f"m{i}.bin")
            info.size = n
            tf.addfile(info, io.BytesIO(b"x" * n))
    return len(buf.getvalue())


def test_webdataset_ingest(reg, spark, docs):
    want = []
    for r in docs.itertuples(index=False):
        txt = (r.text or "").encode()
        js = _meta_json(r).encode()
        tb = _tar_bytes_formula([len(txt), len(js)])
        # the formula must agree with a REAL tarfile of those members
        assert tb == _tar_bytes_real([len(txt), len(js)])
        want.append((
            r.doc_id, 2, tb, _md5(r.text or ""), _md5(_meta_json(r)),
            len(txt) + len(js),
        ))
    got = _rows(reg, spark, "pipeline_webdataset_ingest",
                ["doc_id", "n_members", "tar_bytes", "txt_md5",
                 "json_md5", "n_payload_bytes"])
    assert got == sorted(want)


def test_webdataset_shards(reg, spark, docs):
    shards: dict = {}
    for r in docs.itertuples(index=False):
        sid = _md5_64(_canon(r.text or "")) % 16
        shards.setdefault(sid, []).append(r)
    want = []
    for sid, rows in shards.items():
        rows.sort(key=lambda r: r.doc_id)
        sizes = []
        for r in rows:
            sizes += [len((r.text or "").encode()),
                      len(_meta_json(r).encode())]
        tb = _tar_bytes_formula(sizes)
        assert tb == _tar_bytes_real(sizes)
        payload = "".join(r.text or "" for r in rows)
        want.append((sid, len(rows), 2 * len(rows), tb,
                     _md5(payload), True))
    got = _rows(reg, spark, "pipeline_webdataset_shards",
                ["shard_id", "n_samples", "n_members", "tar_bytes",
                 "payload_md5", "verify_ok"])
    assert got == sorted(want)


def test_skew_salted_agg(reg, spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    acc: dict = {}
    for r in li.itertuples(index=False):
        a = acc.setdefault(r.l_returnflag, [0, 0])
        a[0] += 1
        a[1] += math.floor(r.l_extendedprice * 100)
    want = sorted((k, a[0], a[1]) for k, a in acc.items())
    got = _rows(reg, spark, "skew_salted_agg",
                ["l_returnflag", "n_rows", "total_cents"])
    assert got == want


def test_skew_salted_join(reg, spark):
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_orderkey"])
    pri = {r.o_orderkey: r.o_orderpriority
           for r in orders.itertuples(index=False)}
    acc: dict = {}
    for r in li.itertuples(index=False):
        p = pri.get(r.l_orderkey)
        if p is not None:
            acc[p] = acc.get(p, 0) + 1
    want = sorted(acc.items())
    got = _rows(reg, spark, "skew_salted_join",
                ["o_orderpriority", "n_lines"])
    assert got == want


def test_agg_approx_distinct(reg, spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_partkey", "l_orderkey"])
    want = [(
        li["l_partkey"].nunique(), li["l_orderkey"].nunique(),
        True, True,
    )]
    got = _rows(reg, spark, "agg_approx_distinct",
                ["exact_parts", "exact_orders", "parts_est_ok",
                 "orders_est_ok"])
    assert got == want


def test_agg_approx_percentile(reg, spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    want = []
    for flag, grp in li.groupby("l_returnflag"):
        cents = np.sort(
            np.floor(grp["l_extendedprice"].to_numpy() * 100)
        ).astype(np.int64)
        p50 = float(np.percentile(cents, 50, method="linear"))
        p95 = float(np.percentile(cents, 95, method="linear"))
        want.append((flag, p50, p95, True, True))
    got = _rows(reg, spark, "agg_approx_percentile",
                ["l_returnflag", "exact_p50_cents", "exact_p95_cents",
                 "p50_est_ok", "p95_est_ok"])
    assert len(got) == len(want)
    for g, w in zip(got, sorted(want)):
        assert g[0] == w[0] and g[3:] == w[3:]
        assert math.isclose(g[1], w[1], rel_tol=1e-12)
        assert math.isclose(g[2], w[2], rel_tol=1e-12)


def test_agg_hll_sketch_union(reg, spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_returnflag", "l_orderkey"])
    want = sorted(
        (flag, grp["l_orderkey"].nunique(), True)
        for flag, grp in li.groupby("l_returnflag")
    )
    want.insert(0, ("ALL", li["l_orderkey"].nunique(), True))
    got = _rows(reg, spark, "agg_hll_sketch_union",
                ["l_returnflag", "exact_distinct_orders", "est_ok"])
    assert got == sorted(want)
