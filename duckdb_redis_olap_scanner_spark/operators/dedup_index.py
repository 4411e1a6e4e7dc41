"""Persistent bucketed indexes for incremental dedup — the history
side of a continuously-fed pipeline, materialized the way the 100 TB
design (SCALE.md "Incremental dedup") assumes.

:func:`dedup.incremental_dedup` / :func:`dedup.incremental_minhash_dedup`
take the history as an arbitrary DataFrame, so at bench scale their
probe joins shuffle BOTH sides (the history fingerprints / band rows
travel through the exchange like any other input — VERDICT r11 called
out that the as-coded plan ships history shingle-sets through the band
shuffle). This module is the deployment shape those docstrings promise:

* the **fingerprint index** — one row per distinct SHA-256 content
  fingerprint, bucketed AND sorted on ``content_fp`` — makes the
  incremental anti join co-partitioned: the history side is read
  straight from its buckets with no Exchange (a LOCAL per-bucket sort
  remains — see ``_save_bucketed``); only the (small) batch shuffles.
  Cost scales with the batch, never the corpus.
* the **band index** — two tables written together:
  ``{prefix}_bands`` (doc_id, band, band_val) bucketed+sorted on
  (band, band_val) for the LSH probe, and ``{prefix}_sets``
  (doc_id, sh_arr, n_sh) bucketed+sorted on doc_id for the verify —
  so the probe equi-join reads history bands exchange-free, and the
  per-doc shingle-hash sets are joined back ONLY for (doc_id,
  match_id) candidates that actually collided, again exchange-free on
  the history side. The set payload never rides the band shuffle.

tests/test_dedup_index.py asserts both properties on the physical
plan (zero history-side Exchange, following the bucketed-join pattern
of tests/test_sinks.py) and result-equality against the un-indexed
operators; catalog entries ``pipeline_incremental_dedup_indexed`` and
``pipeline_incremental_minhash_indexed`` (plans/pipeline_ops5.py) run
the build+probe end-to-end against the same DuckDB oracles as their
un-indexed siblings.

At 100 TB the index build is the prior ingest run's write (amortized
across every later batch); ``path`` points at distributed storage and
bucket counts are sized so one bucket fits an executor core. Index
maintenance is append-shaped: a batch's accepted survivors are
appended to the same bucketed layout by the next run.

Reference parity note: the reference engine (C++ DuckDB↔Redis
connector) has no dedup surface at all — this is part of the
beyond-reference LLM-pipeline layer the build brief requires.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import BAND_ROWS, MINHASH_A, MINHASH_B, N_MINHASH, shingles
from .text import HASH_P, canonical_text, md5_hash64
from .util import fan_out

# Bucket count for the test/gate scale. At volume this is sized from
# corpus bytes (one bucket ≈ one executor-core's worth of index).
DEFAULT_BUCKETS = 8


def _is_local_uri(path: str) -> bool:
    """True when ``path`` is a plain local path or a file: URI — the
    only locations the os/shutil primitives can operate on."""
    return "://" not in path or path.startswith("file://")


def _strip_file_scheme(path: str) -> str:
    if path.startswith("file:"):
        return "/" + path[len("file:"):].lstrip("/")
    return path


def _clear_location(spark: SparkSession, path: str) -> None:
    """Remove an index table's storage location before a CTAS rewrite.

    Local paths (and file: URIs) use shutil directly; any other scheme
    (hdfs://, s3a://, ...) goes through the Hadoop FileSystem bound to
    the session, so a rebuild against a remote warehouse clears the
    old files instead of erroring on CTAS-into-non-empty (ADVICE r14:
    the previous local-only rmtree silently no-op'd on remote URIs).
    """
    if _is_local_uri(path):
        local = _strip_file_scheme(path)
        if os.path.isdir(local):
            shutil.rmtree(local)
        return
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


# (session id, table name) → location; a catalog DESCRIBE per probe
# CONSTRUCTION is cheap but pointless to repeat — the location of an
# app-scoped scratch table never moves within a session.
_LOCATION_CACHE: dict[tuple[str, str], str | None] = {}


def _table_location(spark: SparkSession, name: str) -> str | None:
    """Storage location of a saved table, from the catalog (metadata
    only — no job), cached per (session, table)."""
    key = (spark.sparkContext.applicationId, name)
    if key in _LOCATION_CACHE:
        return _LOCATION_CACHE[key]
    loc: str | None = None
    try:
        for row in spark.sql(f"DESCRIBE FORMATTED {name}").collect():
            if row.col_name == "Location":
                loc = row.data_type
                break
    except Exception:
        loc = None
    if loc is not None:  # don't pin a miss: the table may appear later
        _LOCATION_CACHE[key] = loc
    return loc


def _touch_liveness(spark: SparkSession, *names: str) -> None:
    """Refresh the index dirs' mtimes on a PROBE, so a long-running app
    in a read-only phase stays visible to the scratch-index GC
    (plans/pipeline_ops5.py ``_index_ns``), which treats mtime age as
    liveness. Builds and appends refresh the mtime as a side effect of
    writing files; probes don't, so an app that built its index once
    and then only queried it for hours would otherwise have its live
    index reaped mid-query (ADVICE r14). Local filesystems only — on a
    remote warehouse there is no local GC to defend against.

    Contract boundary: liveness is refreshed at probe CONSTRUCTION.
    An app that builds one probe DataFrame and re-executes only that
    same plan object for more than the GC cutoff (24 h) without ever
    constructing another probe is outside the contract — execution
    does not re-enter this Python code, so the mtime ages. Re-calling
    the probe function (what every catalog entry and any incremental
    loop naturally does per batch) renews it."""
    for name in names:
        loc = _table_location(spark, name)
        if loc and _is_local_uri(loc):
            local = _strip_file_scheme(loc)
            if os.path.isdir(local):
                try:
                    os.utime(local)
                except OSError:
                    pass


def _save_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    buckets: int,
    path: str | None,
    extra_meta: dict | None = None,
) -> None:
    """(Re)write ``df`` as a bucketed, per-bucket-sorted parquet table.

    The explicit ``path`` makes the table external and rebuildable
    from any fresh session: the location is cleared first because a
    fresh session's catalog no longer knows the table, and CTAS into a
    non-empty location is (rightly) an error. On a cluster the path is
    an object-store prefix owned by the index-maintenance job —
    cleared through the session's Hadoop FileSystem, not local shutil
    (see ``_clear_location``).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # Any rebuild can move the table's location (explicit path → that
    # path; path=None → back to the warehouse default), so the
    # probe-side liveness cache entry is invalidated unconditionally:
    # a stale explicit-path entry would make _touch_liveness utime the
    # WRONG directory and let the GC reap the live warehouse-default
    # index during a probe-only phase (r15 ADVICE).
    _LOCATION_CACHE.pop((spark.sparkContext.applicationId, name), None)
    if path is not None:
        _clear_location(spark, path)
        _LOCATION_CACHE[(spark.sparkContext.applicationId, name)] = path
    # One writer task per bucket (the repartition hash matches the
    # bucket hash): each bucket lands in exactly ONE file instead of
    # one file per (task, bucket) pair — a small-file explosion at
    # volume. Note the probe join still plans a LOCAL per-bucket Sort
    # above the scan: since Spark 3.0 a bucketed scan does not claim
    # its sortBy order unless the one-file-per-bucket legacy flag
    # (spark.sql.legacy.bucketedTableScan.outputOrdering) is on; the
    # sort is a near-linear in-memory pass over already-sorted runs,
    # and the claim that matters at 100 TB — no history-side
    # EXCHANGE — holds and is plan-asserted in tests.
    writer = (
        df.repartition(buckets, *[F.col(c) for c in bucket_cols])
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)
    # Self-describing layout: a sidecar under the table location
    # records the exact bucket spec + schema, so a FRESH session can
    # re-register the index with attach_bucketed instead of rebuilding
    # history (r15 write-path hunt: recovery-by-rebuild defeated the
    # whole incremental design across restarts, and attaching with a
    # GUESSED bucket count would silently mis-co-locate joins). Write
    # order is clear → CTAS → sidecar: a crash before this line leaves
    # no sidecar, so attach refuses loudly instead of trusting a spec
    # that might not match the files; a STALE sidecar cannot survive
    # because the location was cleared first (explicit path) or the
    # managed location was dropped with the table.
    loc = path if path is not None else _table_location(spark, name)
    if loc is not None:
        meta = {
            "bucket_cols": list(bucket_cols),
            "buckets": int(buckets),
            "sorted_by": list(bucket_cols),
            "schema": [
                [f.name, f.dataType.simpleString()]
                for f in df.schema.fields
            ],
        }
        # Caller-supplied payload (e.g. the ANN index's frozen
        # centroid table) rides the same complete-or-absent contract —
        # but must not shadow the reserved layout keys the attach path
        # trusts: a clobbered bucket spec would re-register the table
        # with a CLUSTERED BY that doesn't match the files and
        # mis-co-locate every join with no error (r15 review).
        if extra_meta:
            clash = set(extra_meta) & set(meta)
            if clash:
                raise ValueError(
                    f"extra_meta must not override reserved sidecar "
                    f"keys {sorted(clash)}"
                )
            meta.update(extra_meta)
        _write_sidecar(spark, loc, meta)


_SIDECAR = "_spark_graft_index.json"


def _write_sidecar(spark: SparkSession, location: str, meta: dict) -> None:
    """Persist the index's bucket spec next to its files. Underscore
    prefix = invisible to Spark/Hadoop input listing (like _SUCCESS).
    Local writes go through tempfile + os.replace (a torn sidecar must
    never exist — same rule as the engine's zip cache); remote ones
    through the session's Hadoop FileSystem."""
    data = json.dumps(meta, sort_keys=True).encode()
    if _is_local_uri(location):
        local = _strip_file_scheme(location)
        os.makedirs(local, exist_ok=True)
        tmp = os.path.join(local, "." + _SIDECAR + ".tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(local, _SIDECAR))
        return
    jvm = spark._jvm
    # Write to a sibling temp path and rename: fs.create+write is not
    # atomic, and a torn sidecar would surface as a JSONDecodeError at
    # attach time instead of the designed loud no-sidecar refusal
    # (r15 review). Rename is atomic on HDFS; on object stores it is
    # copy+delete, still leaving only absent-or-complete states.
    tmp_path = jvm.org.apache.hadoop.fs.Path(
        location + "/._" + _SIDECAR + ".tmp"
    )
    final = jvm.org.apache.hadoop.fs.Path(location + "/" + _SIDECAR)
    fs = final.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = fs.create(tmp_path, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp_path, final):
        raise IOError(f"could not publish index sidecar at {final}")


def _read_sidecar(spark: SparkSession, location: str) -> dict | None:
    if _is_local_uri(location):
        full = os.path.join(_strip_file_scheme(location), _SIDECAR)
        if not os.path.isfile(full):
            return None
        with open(full, "rb") as f:
            return json.loads(f.read())
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(location + "/" + _SIDECAR)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        # py4j passes Python bytearrays BY VALUE: stream.read(buf)
        # fills a Java-side copy and the Python buffer stays zeroed
        # (r15 review — every remote attach decoded NULs). Let the JVM
        # materialize the bytes and hand them back as a return value.
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
        return json.loads(data)
    finally:
        stream.close()


def attach_bucketed(spark: SparkSession, name: str, path: str) -> None:
    """Re-register a previously-built index in a FRESH session — the
    restart/recovery half of the incremental loop (r15 write-path
    hunt): probes and appends need a catalog table, and before this
    existed the only way back after a session died was a full history
    rebuild.

    The bucket spec and schema come from the sidecar the builder wrote
    (``_save_bucketed``), never from the caller: declaring a bucket
    count that differs from how the files were actually written would
    make Spark co-locate joins on the wrong assignment and return
    WRONG RESULTS with no error anywhere. No sidecar → refuse loudly
    (rebuild instead). Idempotent when the table is already registered
    at the same location; raises if ``name`` points elsewhere (two
    generations of an index must not be silently swapped)."""
    if not spark.catalog.tableExists(name):
        # A direct DROP TABLE elsewhere leaves a stale location cache
        # entry; trusting it here would wrongly no-op (or refuse) the
        # attach. The catalog is the truth for existence.
        _LOCATION_CACHE.pop(
            (spark.sparkContext.applicationId, name), None
        )
        existing = None
    else:
        existing = _table_location(spark, name)
    if existing is not None:
        want = _strip_file_scheme(path) if _is_local_uri(path) else path
        have = (
            _strip_file_scheme(existing)
            if _is_local_uri(existing) else existing
        )
        if os.path.normpath(have) == os.path.normpath(want):
            return
        raise ValueError(
            f"table {name!r} is already registered at {existing!r}, "
            f"not {path!r}: drop it explicitly before attaching a "
            "different index generation"
        )
    meta = _read_sidecar(spark, path)
    if meta is None:
        raise ValueError(
            f"no {_SIDECAR} sidecar under {path!r}: the location does "
            "not hold a complete index (builds write the sidecar "
            "last) — rebuild with write_fingerprint_index/"
            "write_band_index/write_ivf_index instead of attaching"
        )
    cols = ", ".join(f"`{n}` {t}" for n, t in meta["schema"])
    bcols = ", ".join(f"`{c}`" for c in meta["bucket_cols"])
    scols = ", ".join(f"`{c}`" for c in meta["sorted_by"])
    # Quote-safe SQL string literal: double the quotes AND escape
    # backslashes — Spark SQL interprets backslash escapes in string
    # literals (verified: 'a\\b' parses to 'a\\x08'), so an unescaped
    # backslash in a path would register a silently corrupted
    # location (r15 review).
    loc = path.replace("\\", "\\\\").replace("'", "''")
    spark.sql(
        f"CREATE TABLE `{name}` ({cols}) USING parquet "
        f"CLUSTERED BY ({bcols}) SORTED BY ({scols}) "
        f"INTO {int(meta['buckets'])} BUCKETS "
        f"LOCATION '{loc}'"
    )
    _LOCATION_CACHE[(spark.sparkContext.applicationId, name)] = path


def write_fingerprint_index(
    history: DataFrame,
    name: str,
    buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
) -> None:
    """Distinct SHA-256 content fingerprints of the ingested corpus,
    bucketed+sorted on ``content_fp``. Same fingerprint expression
    (and adversarial-collision rationale) as :func:`dedup.exact_dedup`."""
    fps = (
        fan_out(history, key="doc_id")
        .select(F.sha2(canonical_text(), 256).alias("content_fp"))
        .distinct()
    )
    _save_bucketed(fps, name, ["content_fp"], buckets, path)


def incremental_dedup_indexed(
    spark: SparkSession, incoming: DataFrame, index_table: str
) -> DataFrame:
    """:func:`dedup.incremental_dedup` against a persisted fingerprint
    index: batch hash-aggregate + LEFT ANTI join where the history
    side comes straight out of its buckets with no Exchange
    (plan-asserted in tests/test_dedup_index.py; a local per-bucket
    sort remains — see ``_save_bucketed``). Output contract is
    identical: (content_fp, keep_id, batch_dup_cnt). The anti join
    uses plain equality, NOT null-safe ``<=>``: a NULL-text doc's
    NULL fingerprint never matches the index, so such docs survive
    every batch — the same semantics as the un-indexed operator and
    its DuckDB oracle; :func:`append_fingerprints` correspondingly
    never persists NULL fingerprints."""
    _touch_liveness(spark, index_table)
    fp = F.sha2(canonical_text(), 256).alias("content_fp")
    batch = (
        incoming.select("doc_id", fp)
        .groupBy("content_fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("batch_dup_cnt"),
        )
    )
    return batch.join(spark.table(index_table), "content_fp", "left_anti")


def append_fingerprints(batch_survivors: DataFrame, name: str) -> None:
    """Index maintenance — the second half of the incremental loop: a
    batch's accepted survivors (the output of
    :func:`incremental_dedup_indexed`, already one row per NEW
    fingerprint) are appended INTO the same bucketed layout, so the
    next batch probes yesterday's corpus PLUS today's accepted rows
    without ever rewriting the index. Spark appends to a bucketed
    table by writing additional per-bucket files with the same bucket
    spec — each append costs one batch-sized shuffle onto the bucket
    hash, and the probe plan is unchanged (still no history-side
    Exchange); periodic compaction (rewriting a bucket's file set)
    is an offline housekeeping job at volume, not a correctness
    need.

    NULL-key semantics: a NULL-text doc hashes to a NULL
    ``content_fp``, and the probe's LEFT ANTI join uses plain
    equality (not ``<=>``), so a NULL fingerprint NEVER matches the
    index — NULL-text docs survive every batch, matching both the
    un-indexed operator and the DuckDB oracle. Appending those NULL
    rows would therefore be pure dead weight (one more NULL row per
    maintenance cycle that can never reject anything), so they are
    filtered here rather than persisted (ADVICE r13)."""
    buckets = _index_buckets(batch_survivors.sparkSession, name)
    (
        batch_survivors.filter(F.col("content_fp").isNotNull())
        .select("content_fp")
        .repartition(buckets, F.col("content_fp"))
        .write.format("parquet")
        .mode("append")
        .bucketBy(buckets, "content_fp")
        .sortBy("content_fp")
        .saveAsTable(name)
    )


def append_to_band_index(
    accepted_docs: DataFrame, prefix: str
) -> None:
    """Band-index maintenance, the near-dup twin of
    :func:`append_fingerprints`: ACCEPTED batch docs (those that
    survived the near-dup probe and joined the corpus) get their
    bands appended to ``{prefix}_bands`` and their shingle-hash sets
    to ``{prefix}_sets``, each under the table's existing bucket
    spec. The signature aggregation is persisted across the two
    appends so the batch is shingled once. Cost: two batch-sized
    shuffles onto the respective bucket hashes; the probe plan over
    the grown index is unchanged (still exchange-free on the history
    side).

    Delivery contract (r15 write-path hunt): the two appends are NOT
    atomic. Bands land first by design — a crash in between leaves
    band rows without set rows, which the probe detects LOUDLY per
    candidate (see ``incremental_minhash_indexed``); re-running this
    append with the same accepted docs heals it (band duplicates
    collapse in the probe's candidate groupBy, the missing sets
    complete). Re-running a FULLY-succeeded append instead
    double-inserts set rows and multiplies probe matches — appends are
    at-most-once per accepted batch, and :func:`verify_band_index` is
    the offline audit for both failure shapes."""
    spark = accepted_docs.sparkSession
    sig = _signatures_with_sets(accepted_docs).persist()
    try:
        bands = sig.select(
            "doc_id", F.explode(_band_structs()).alias("bv")
        ).select(
            "doc_id",
            F.col("bv.band").alias("band"),
            F.col("bv.band_val").alias("band_val"),
        )
        nb = _index_buckets(spark, f"{prefix}_bands")
        (
            bands.repartition(nb, F.col("band"), F.col("band_val"))
            .write.format("parquet").mode("append")
            .bucketBy(nb, "band", "band_val").sortBy("band", "band_val")
            .saveAsTable(f"{prefix}_bands")
        )
        sets_ = sig.select(
            "doc_id", "sh_arr", F.size("sh_arr").alias("n_sh")
        )
        ns = _index_buckets(spark, f"{prefix}_sets")
        (
            sets_.repartition(ns, F.col("doc_id"))
            .write.format("parquet").mode("append")
            .bucketBy(ns, "doc_id").sortBy("doc_id")
            .saveAsTable(f"{prefix}_sets")
        )
    finally:
        sig.unpersist()


def verify_band_index(spark: SparkSession, prefix: str) -> None:
    """Offline audit of the two-table band index's integrity
    invariants; raises on violation. For the maintenance loop (after
    a crashed/uncertain append), NOT the probe path — both checks
    re-key the full index.

    Checks: (a) every bands doc_id has a sets row — the torn state a
    crash between ``append_to_band_index``'s two appends leaves, which
    the probe now also detects loudly per candidate; (b) no duplicate
    sets doc_id — a double-applied append (at-least-once retry after a
    lost ack) would multiply every match pair for that doc in probe
    output. Orphan sets rows (sets without bands) are harmless — the
    probe can never reach them — and are not flagged."""
    bands_ids = spark.table(f"{prefix}_bands").select("doc_id").distinct()
    sets_tbl = spark.table(f"{prefix}_sets")
    torn = (
        bands_ids.join(sets_tbl.select("doc_id"), "doc_id", "left_anti")
        .orderBy("doc_id").limit(5).collect()
    )
    if torn:
        ids = [int(r.doc_id) for r in torn]
        raise RuntimeError(
            f"band index {prefix!r} is torn: doc_ids {ids} have band "
            "rows but no shingle-set row (crashed append) — re-run "
            "append_to_band_index with that batch's accepted docs, or "
            "rebuild with write_band_index"
        )
    dup = (
        sets_tbl.groupBy("doc_id").count().filter(F.col("count") > 1)
        .orderBy("doc_id").limit(5).collect()
    )
    if dup:
        ids = [int(r.doc_id) for r in dup]
        raise RuntimeError(
            f"band index {prefix!r} holds duplicate set rows for "
            f"doc_ids {ids}: an append was applied twice — rebuild "
            "the index (write_band_index) before serving probes"
        )


def _index_buckets(spark: SparkSession, name: str) -> int:
    """Bucket count of an existing index table (appends must match
    the table's spec exactly or Spark rejects the write). Raises when
    the table exists but DESCRIBE shows no 'Num Buckets' row — an
    unbucketed or spec-drifted index must fail loudly here, not
    proceed on a guessed spec with Spark's own mismatch error as the
    only backstop (ADVICE r13)."""
    row = [
        r
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        if r.col_name == "Num Buckets"
    ]
    if not row:
        raise ValueError(
            f"index table {name!r} exists but is not bucketed "
            "(no 'Num Buckets' in DESCRIBE TABLE EXTENDED); rebuild it "
            "with write_fingerprint_index/write_band_index before "
            "appending"
        )
    return int(row[0].data_type)


def _signatures_with_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, m0..m7, sh_arr): K min-hashes plus the 64-bit
    shingle-hash set, one aggregation — the same signature build as
    :func:`dedup.minhash_lsh_dedup` (same constants, so the DuckDB
    oracles transfer)."""
    ex = shingles(fan_out(docs, key="doc_id"))
    hashed = ex.select("doc_id", md5_hash64(F.col("shingle")).alias("h"))
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(HASH_P)).alias(f"m{k}")
        for k, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return hashed.groupBy("doc_id").agg(
        *mins, F.collect_set("h").alias("sh_arr")
    )


def _band_structs():
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                (
                    F.col(f"m{BAND_ROWS * j}") * F.lit(HASH_P)
                    + F.col(f"m{BAND_ROWS * j + 1}")
                ).alias("band_val"),
            )
            for j in range(N_MINHASH // BAND_ROWS)
        ]
    )


def write_band_index(
    history: DataFrame,
    prefix: str,
    buckets: int = DEFAULT_BUCKETS,
    path_prefix: str | None = None,
) -> None:
    """Materialize the corpus's LSH band index as two bucketed tables:

    * ``{prefix}_bands`` (doc_id, band, band_val), bucketed+sorted on
      (band, band_val) — the probe side. Holds NO set payload, so the
      index is 4 small fixed-width rows per doc.
    * ``{prefix}_sets`` (doc_id, sh_arr, n_sh), bucketed+sorted on
      doc_id — the verify side, fetched per colliding candidate only.

    The signature aggregation is persisted across the two writes so
    the shingle→minhash pipeline runs once, not once per table; the
    build is the ingest run's one-time cost, amortized over every
    later batch probe.
    """
    sig = _signatures_with_sets(history).persist()
    try:
        bands = sig.select(
            "doc_id", F.explode(_band_structs()).alias("bv")
        ).select(
            "doc_id",
            F.col("bv.band").alias("band"),
            F.col("bv.band_val").alias("band_val"),
        )
        _save_bucketed(
            bands,
            f"{prefix}_bands",
            ["band", "band_val"],
            buckets,
            f"{path_prefix}_bands" if path_prefix else None,
        )
        sets_ = sig.select(
            "doc_id", "sh_arr", F.size("sh_arr").alias("n_sh")
        )
        _save_bucketed(
            sets_,
            f"{prefix}_sets",
            ["doc_id"],
            buckets,
            f"{path_prefix}_sets" if path_prefix else None,
        )
    finally:
        sig.unpersist()


def incremental_minhash_indexed(
    spark: SparkSession,
    incoming: DataFrame,
    prefix: str,
    threshold: float = 0.2,
) -> DataFrame:
    """:func:`dedup.incremental_minhash_dedup` against a persisted
    band index — the deployment shape whose cost scales with the
    batch, never the corpus:

    1. only the incoming batch is shingled/minhashed fresh;
    2. its bands equi-join ``{prefix}_bands`` on (band, band_val) —
       history side read exchange-free from its buckets, and the band
       rows carry no set payload;
    3. colliding (doc_id, match_id) candidates are collapsed, then the
       history shingle-hash sets are joined back from
       ``{prefix}_sets`` for THOSE candidates only (again
       exchange-free on the history side), bounded by LSH selectivity;
    4. exact Jaccard ≥ threshold verifies, same math and output
       contract as the un-indexed operator:
       (doc_id, match_id, common, jaccard).
    """
    _touch_liveness(spark, f"{prefix}_bands", f"{prefix}_sets")
    bands_idx = spark.table(f"{prefix}_bands").select(
        F.col("doc_id").alias("match_id"), "band", "band_val"
    )
    sets_idx = spark.table(f"{prefix}_sets").select(
        F.col("doc_id").alias("match_id"),
        F.col("sh_arr").alias("sb"),
        F.col("n_sh").alias("nb"),
    )
    sig = _signatures_with_sets(incoming)
    batch_bands = sig.select(
        "doc_id", F.col("sh_arr").alias("sa"),
        F.explode(_band_structs()).alias("bv"),
    ).select(
        "doc_id", "sa",
        F.col("bv.band").alias("band"),
        F.col("bv.band_val").alias("band_val"),
    )
    cand = (
        batch_bands.join(bands_idx, ["band", "band_val"])
        # a pair colliding in several bands appears once per band;
        # collapse on ids (sa is identical across a doc's band rows).
        .groupBy("doc_id", "match_id")
        .agg(F.first("sa").alias("sa"))
    )
    # LEFT join + loud check instead of a plain inner join: a crash
    # between append_to_band_index's two appends leaves bands without
    # sets, and an inner join would silently DROP those candidates —
    # admitting near-duplicates of the torn doc as unique (r15
    # write-path hunt: the torn doc itself self-heals on batch retry,
    # band duplicates collapse in the groupBy above, but OTHER docs
    # colliding with it would slip through unverified). The check
    # lives INSIDE the nb value that the jaccard formula consumes — a
    # standalone raise_error filter gets conjunct-combined with the
    # threshold filter, and a NULL jaccard fails the threshold first,
    # short-circuiting the raise (measured, not hypothetical). On a
    # consistent index the branch never fires and the cost is one
    # null check per candidate.
    nb_checked = F.when(
        F.col("nb").isNull(),
        F.raise_error(F.concat(
            F.lit("band index is torn: doc_id "),
            F.col("match_id").cast("string"),
            F.lit(
                " has band rows but no shingle-set row — a crashed "
                "append_to_band_index; re-run append_to_band_index "
                "with that batch's accepted docs (duplicate band "
                "rows collapse at probe time, the missing sets "
                "complete), or rebuild with write_band_index; "
                "verify_band_index is the offline audit"
            ),
        )).cast("long"),
    ).otherwise(F.col("nb"))
    stats = (
        cand.join(sets_idx, "match_id", "left")
        .select(
            "doc_id",
            "match_id",
            F.size(F.array_intersect("sa", "sb")).cast("long")
            .alias("common"),
            F.size("sa").alias("na"),
            nb_checked.alias("nb"),
        )
    )
    return stats.select(
        "doc_id",
        "match_id",
        "common",
        (
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
