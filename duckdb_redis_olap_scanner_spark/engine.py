"""Engine session: SparkSession construction, Redis connection state,
data-source/function registration, and test-table loading.

Replaces the reference's process-global connection state + extension
loading (``src/redduck_extension.cpp:44-52,348-362``) with an explicit
engine object.  ``connect("HOST:PORT")`` validates with a PING handshake
exactly like the reference (``redis_client.cpp:98-115``) and rejects
NULL / malformed addresses (``redduck_extension.cpp:57-90``); executors
connect lazily inside data-source reads and UDFs using these options.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .sources.redis_source import ALL_DATASOURCES
from .functions.redis_fns import (
    make_redis_get,
    make_redis_hgetall,
    make_redis_ttl,
)
from .transport.resp import RedisClient, parse_host_port

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def get_spark(
    app_name: str = "duckdb-redis-olap-scanner-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for this engine.

    Local testing uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
    same configs apply (AQE handles runtime re-planning, skew joins, and
    partition coalescing — the knobs that matter at 100 TB).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Python workers unpickle our DataSource classes by module reference —
    # the package root must be importable in the worker processes, which
    # inherit PYTHONPATH from the JVM we are about to launch.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Enables pushFilters on Python DataSources (LIKE→glob pushdown
        # into the Redis SCAN; off by default in Spark 4.1).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # The generated-class cache defaults to 100 entries; a workload
        # that cycles through a full query catalog (19+ plans × several
        # codegen stages each) overflows it and recompiles ~1 s of Java
        # per evicted stage on every revisit. Sized for the catalog; the
        # cache is per-JVM, so on a cluster this applies to each
        # executor once, not per task.
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    register_datasources(spark)
    # The PYTHONPATH export above only reaches workers when THIS call
    # launched the JVM; if a session already existed in the process
    # (getOrCreate returned it), or on a real cluster where executor
    # hosts never see the driver's env, workers would fail to unpickle
    # our DataSource classes by module reference. ship_package is the
    # transport that always works (addPyFile, idempotent per session,
    # content-hash named) — r14 review.
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make this package importable in Spark's Python workers even when the
    driver session was created by someone else (e.g. the test driver):
    zip the package and addPyFile it (idempotent per session)."""
    if getattr(spark, "_pkg_shipped", False):
        return
    import hashlib
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    # Collect sources deterministically and name the zip by a content
    # hash — a name-only cache would silently ship a stale zip to the
    # executors after any code edit.
    sources: list[tuple[str, str]] = []
    h = hashlib.sha256()
    for root, dirs, files in os.walk(pkg_dir):
        dirs.sort()
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                sources.append((full, rel))
                h.update(rel.encode())
                with open(full, "rb") as f:
                    h.update(f.read())
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-pyfiles-{h.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zip_path):
        # Write-to-temp + atomic rename: a concurrent driver (parallel
        # test runs share the content-derived path) or a crash
        # mid-write must never let addPyFile snapshot a truncated zip
        # — and a truncated zip at the FINAL name would poison the
        # content-hash cache forever (r14 review).
        fd, tmp = tempfile.mkstemp(
            suffix=".zip", prefix=f"{pkg_name}-pyfiles-",
            dir=tempfile.gettempdir(),
        )
        os.close(fd)
        try:
            with zipfile.ZipFile(tmp, "w") as zf:
                for full, rel in sources:
                    zf.write(full, rel)
            os.replace(tmp, zip_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    spark.sparkContext.addPyFile(zip_path)
    spark._pkg_shipped = True


def register_datasources(spark: SparkSession) -> None:
    # Runtime-settable; required because RedisScanReader implements
    # pushFilters — Spark refuses ANY read through such a reader while
    # the conf is off, so foreign sessions (e.g. the test driver's) must
    # have it flipped here, not only in get_spark().
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # Registration must consult THIS session's DataSourceManager, not the
    # thread's active one: the JVM-side existence probe
    # (DataSourceRegistration.checkDataSourceExists → lookupDataSource)
    # resolves Python data sources through the ACTIVE session, so
    # registering on a non-active session (spark.newSession(), a foreign
    # driver session) raises a spurious DATA_SOURCE_ALREADY_EXISTS while
    # leaving the receiver's manager empty — the r10 cluster-scan red's
    # silent sibling. Pin the receiver active for the duration, and check
    # per-session existence explicitly instead of swallowing exceptions.
    #
    # Every JVM surface touched below (sessionState().dataSourceManager()
    # .dataSourceExists, classic.SparkSession.getActiveSession) is Spark
    # INTERNAL py4j API that has moved across minor releases. Each probe
    # is therefore best-effort: when a hook is missing we fall back to
    # plain per-source register() and swallow only the
    # DATA_SOURCE_ALREADY_EXISTS error class, so a Spark upgrade degrades
    # to slightly-noisier idempotence instead of breaking every redis
    # entry at once (VERDICT r12 "What's wrong" #3).
    def _register_swallowing_exists(sources, warn: bool = True) -> None:
        for ds in sources:
            try:
                spark.dataSource.register(ds)
            except Exception as exc:  # noqa: BLE001 — see filter below
                if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
                    raise
                if not warn:
                    # Pinned-active path: already-exists can only mean
                    # a concurrent registration on THIS session —
                    # benign, the source is where we need it.
                    continue
                # On a NON-thread-active receiver this error can be
                # spurious (raised by the active session's manager
                # while the receiver's stays empty — the r10 failure
                # the pinned path above avoids). We can't distinguish
                # the cases without the internal probe that just
                # failed, so make the degradation visible instead of
                # silent: a later data-source-not-found on this
                # session traces back here.
                import warnings

                warnings.warn(
                    f"register_datasources degraded path: swallowed "
                    f"DATA_SOURCE_ALREADY_EXISTS for {ds.name()!r}; if "
                    "this session later fails to resolve the source, "
                    "the registration landed on a different (active) "
                    "session",
                    RuntimeWarning,
                    stacklevel=2,
                )

    pending = ALL_DATASOURCES
    try:
        jdm = spark._jsparkSession.sessionState().dataSourceManager()
        pending = [
            ds for ds in ALL_DATASOURCES if not jdm.dataSourceExists(ds.name())
        ]
    except Exception:  # internal surface moved: register all, swallow dups
        _register_swallowing_exists(pending)
        return
    if not pending:
        return
    try:
        jcls = getattr(spark._jvm, "org.apache.spark.sql.classic.SparkSession")
        prev = jcls.getActiveSession()
        jcls.setActiveSession(spark._jsparkSession)
    except Exception:  # can't pin active session: same degraded path
        _register_swallowing_exists(pending)
        return
    try:
        # Tolerate already-exists here too: two threads constructing
        # Engine(spark) concurrently on a fresh session both pass the
        # probe with every source pending, and the loser's error is
        # NON-spurious on a pinned-active session — the source IS
        # registered where we need it (r14 review). No degraded-path
        # warning: this swallow is provably benign.
        _register_swallowing_exists(pending, warn=False)
    finally:
        if prev.isDefined():
            jcls.setActiveSession(prev.get())
        else:
            jcls.clearActiveSession()


class Engine:
    """Session facade: ``Engine(spark).connect("127.0.0.1:6379")`` then
    ``engine.redis_scan("testkey:*")`` / ``engine.redis_get_udf()``."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.host: str | None = None
        self.port: int | None = None
        register_datasources(spark)

    # -- connection ------------------------------------------------------------
    def connect(self, address: str) -> str:
        """Parse 'HOST:PORT', validate with PING, store as session state.

        Mirrors `redis_connect` (`redduck_extension.cpp:54-119`): NULL and
        malformed addresses raise; a PING/PONG handshake runs synchronously;
        returns the same confirmation string.
        """
        host, port = parse_host_port(address)
        with RedisClient(host, port):
            pass  # context manager connects (PING inside) and closes
        self.host, self.port = host, port
        return f"Redis Target Set: {host}:{port}"

    def _require_conn(self) -> tuple[str, int]:
        if self.host is None or self.port is None:
            raise RuntimeError("not connected: call engine.connect('HOST:PORT') first")
        return self.host, self.port

    # -- readers ---------------------------------------------------------------
    def _reader(
        self, fmt: str, streaming: bool = False, **options
    ) -> DataFrame:
        """Shared reader plumbing for every redis source: connection
        wiring + option pass-through, one place instead of six
        copies (r14 review)."""
        host, port = self._require_conn()
        src = self.spark.readStream if streaming else self.spark.read
        reader = src.format(fmt).option("host", host).option("port", port)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()

    def redis_scan(self, pattern: str = "*", **options) -> DataFrame:
        return self._reader("redis_scan", pattern=pattern, **options)

    def redis_kv(self, pattern: str = "*", **options) -> DataFrame:
        return self._reader("redis_kv", pattern=pattern, **options)

    def redis_hash(self, pattern: str = "*", **options) -> DataFrame:
        return self._reader("redis_hash", pattern=pattern, **options)

    def redis_zset(self, key: str, **options) -> DataFrame:
        return self._reader("redis_zset", key=key, **options)

    def redis_list(self, key: str, **options) -> DataFrame:
        return self._reader("redis_list", key=key, **options)

    # -- scalar UDFs -----------------------------------------------------------
    def redis_get_udf(self, missing: str = "null"):
        host, port = self._require_conn()
        return make_redis_get(host, port, missing=missing)

    def redis_hgetall_udf(self):
        host, port = self._require_conn()
        return make_redis_hgetall(host, port)

    def redis_ttl_udf(self):
        """``redis_ttl(key) -> long`` (seconds; -1 no expiry, -2
        missing) — the RESP integer type surfaced to SQL (SURVEY §3's
        reserved LongType mapping)."""
        host, port = self._require_conn()
        return make_redis_ttl(host, port)

    # -- streaming -------------------------------------------------------------
    def redis_stream(self, key: str = "events", **options) -> DataFrame:
        """Unbounded DataFrame over a Redis Stream (XADD/XRANGE) —
        offsets are native stream entry IDs, checkpoint-durable."""
        return self._reader(
            "redis_stream", streaming=True, key=key, **options
        )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables and register temp views.

    Plans stay declarative so Catalyst gets column pruning + filter
    pushdown into the parquet scans for free; broadcast decisions live
    at the join sites (`plans.catalog.maybe_broadcast` — cost-based
    from real file sizes — plus hard hints for the schema-bounded
    region/nation dims).
    """
    from .plans.catalog import table

    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
