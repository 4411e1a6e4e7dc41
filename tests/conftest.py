from __future__ import annotations

import os

import pytest

from duckdb_redis_olap_scanner_spark import Engine, get_spark, load_tables
from duckdb_redis_olap_scanner_spark.testing import (
    FakeRedisServer,
    seed_reference_fixture,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def as_str(v):
    """Normalize a RESP bulk-string reply (bytes) for comparisons —
    the one shared copy for the fake-fidelity and real-Redis lanes
    (review r16: three drifting copies existed)."""
    return v.decode() if isinstance(v, (bytes, bytearray)) else v


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def redis_server():
    with FakeRedisServer() as srv:
        seed_reference_fixture(srv)
        yield srv


@pytest.fixture(scope="session")
def engine(spark, redis_server):
    eng = Engine(spark)
    eng.connect(redis_server.address)
    return eng


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)
