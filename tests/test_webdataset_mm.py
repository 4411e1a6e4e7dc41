"""Multimodal WebDataset shard round trip (r20 frontier entry
``multimodal_webdataset_reader``).

Pins: deterministic shard bytes, sample adjacency + strict demux
contract (unknown extension / split / duplicate / missing members all
raise), literal feature rows for known ids, the Spark export+read
plan shape (one shuffle, read half narrow), and the driver gate's
comparison (Spark vs DuckDB oracle at sf0.001) run locally.
"""

from __future__ import annotations

import io
import tarfile

import pytest

from duckdb_redis_olap_scanner_spark.operators import multimodal as M

from .conftest import SF_DIR

# Rows produced by decode_webdataset_mm_shard for known ids — values
# independently re-derivable from the synthesis contracts:
# image val=(7d+k)%256 over w=4+d%13, h=2+d%7; audio
# s=((11d+97i)%65536)-32768 over (1+d%2) ch x (16+d%17) frames;
# text byte_j=32+((3d+7j)%95) over 32+d%41 bytes; label=d%10.
PINNED_ROWS = {
    0: (0, 0, 4, 2, 4600, 1, 8000, 16, -4324528, 32, 41505, 4),
    1: (1, 1, 5, 3, 37605, 2, 12000, 17, -18220685, 33, 42706, 4),
    2: (2, 2, 6, 4, 161184, 1, 16000, 18, -5411580, 34, 45745, 4),
    7: (7, 7, 11, 2, 204149, 2, 12000, 23, -32193261, 39, 64900, 4),
}


@pytest.mark.parametrize("doc_id", sorted(PINNED_ROWS))
def test_single_sample_roundtrip_pinned(doc_id):
    shard = M.encode_webdataset_mm_shard([doc_id])
    assert M.decode_webdataset_mm_shard(shard) == [PINNED_ROWS[doc_id]]


def test_multi_sample_shard_orders_by_doc_id():
    shard = M.encode_webdataset_mm_shard([7, 0, 2, 1])
    rows = M.decode_webdataset_mm_shard(shard)
    assert [r[0] for r in rows] == [0, 1, 2, 7]
    assert rows == [PINNED_ROWS[d] for d in (0, 1, 2, 7)]


def test_shard_bytes_deterministic():
    a = M.encode_webdataset_mm_shard([3, 9, 12])
    b = M.encode_webdataset_mm_shard([12, 3, 9])
    assert a == b
    # zero mtime/uid/gid, fixed mode: byte-stable across processes
    with tarfile.open(fileobj=io.BytesIO(a), mode="r") as tf:
        for m in tf.getmembers():
            assert (m.mtime, m.uid, m.gid, m.mode) == (0, 0, 0, 0o644)


def test_member_layout_follows_webdataset_convention():
    """Four members per sample, adjacent, one shared 9-digit key,
    sorted extension order — the adjacency contract real WebDataset
    loaders stream by."""
    shard = M.encode_webdataset_mm_shard([5, 6])
    with tarfile.open(fileobj=io.BytesIO(shard), mode="r") as tf:
        names = [m.name for m in tf.getmembers()]
    assert names == [
        "000000005.cls", "000000005.ppm", "000000005.txt",
        "000000005.wav",
        "000000006.cls", "000000006.ppm", "000000006.txt",
        "000000006.wav",
    ]


def _repack(members) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _sample_members(doc_id: int):
    return M.encode_webdataset_mm_sample(doc_id)


def test_unknown_extension_rejected():
    members = _sample_members(4) + [("000000004.npy", b"\x00")]
    with pytest.raises(ValueError, match="unknown member extension"):
        M.decode_webdataset_mm_shard(_repack(members))


def test_missing_member_rejected():
    members = [m for m in _sample_members(4) if not m[0].endswith(".wav")]
    with pytest.raises(ValueError, match="missing members"):
        M.decode_webdataset_mm_shard(_repack(members))


def test_duplicate_member_rejected():
    members = _sample_members(4)
    members.append(members[0])
    with pytest.raises(ValueError, match="duplicate member"):
        M.decode_webdataset_mm_shard(_repack(members))


def test_split_sample_rejected():
    """Sample members separated by another sample's members violate
    the adjacency convention and must be refused, not re-grouped."""
    a, b = _sample_members(4), _sample_members(5)
    interleaved = a[:2] + b + a[2:]
    with pytest.raises(ValueError, match="adjacent"):
        M.decode_webdataset_mm_shard(_repack(interleaved))


def test_wrong_codec_member_rejected():
    """A .ppm slot carrying WAV bytes must fail the PPM parse loudly
    (proof members are routed by extension into real parsers, not
    counted)."""
    members = [
        (n, (M.encode_wav_payload(4) if n.endswith(".ppm") else d))
        for n, d in _sample_members(4)
    ]
    with pytest.raises(ValueError, match="PPM"):
        M.decode_webdataset_mm_shard(_repack(members))


def test_corrupt_image_bytes_change_checksum():
    members = _sample_members(8)
    out = []
    for n, d in members:
        if n.endswith(".ppm"):
            b = bytearray(d)
            b[-1] ^= 0x2A  # last raw pixel byte
            d = bytes(b)
        out.append((n, d))
    clean = M.decode_webdataset_mm_shard(_repack(members))[0]
    got = M.decode_webdataset_mm_shard(_repack(out))[0]
    assert got[4] != clean[4]  # img_checksum moved
    assert got[8] == clean[8]  # audio untouched


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_roundtrip_property_any_doc_id(d):
    """Arbitrary nonnegative ids (the 10x bench dir offsets ids by
    1e9 per replica): decode inverts encode and every column obeys
    its closed form."""
    (row,) = M.decode_webdataset_mm_shard(M.encode_webdataset_mm_shard([d]))
    w, h = 4 + d % 13, 2 + d % 7
    n = w * h * 3
    img_ck = sum((k + 1) * ((d * 7 + k) % 256) for k in range(n))
    ch, fr = 1 + d % 2, 16 + d % 17
    aud_ck = sum(
        (i + 1) * (((d * 11 + i * 97) % 65536) - 32768)
        for i in range(fr * ch)
    )
    tl = 32 + d % 41
    txt_ck = sum((j + 1) * (32 + ((d * 3 + j * 7) % 95)) for j in range(tl))
    assert row == (
        d, d % 10, w, h, img_ck, ch, 8000 + (d % 3) * 4000, fr, aud_ck,
        tl, txt_ck, 4,
    )


def test_spark_export_groups_and_reader_matches(spark):
    """End-to-end through the registered entry's plan: shard_id =
    doc_id // 8, every doc appears exactly once, rows match the local
    decode of a locally built shard."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import table

    docs = table(spark, SF_DIR, "documents")
    shards = M.synthesize_webdataset_mm_shards(docs)
    got = {
        int(r["shard_id"]): int(r["n_samples"])
        for r in shards.collect()
    }
    ids = [int(r[0]) for r in docs.select("doc_id").collect()]
    want: dict[int, int] = {}
    for d in ids:
        want[d // 8] = want.get(d // 8, 0) + 1
    assert got == want
    rows = {
        int(r["doc_id"]): r
        for r in M.read_webdataset_mm_features(shards).collect()
    }
    assert sorted(rows) == sorted(ids)
    for d in sorted(ids)[:8]:
        (local,) = M.decode_webdataset_mm_shard(
            M.encode_webdataset_mm_shard([d])
        )
        r = rows[d]
        assert tuple(local) == (
            r["doc_id"], r["label"], r["width"], r["height"],
            r["img_checksum"], r["n_channels"], r["sample_rate"],
            r["n_frames"], r["audio_checksum"], r["txt_len"],
            r["txt_checksum"], r["n_members"],
        )
        assert int(r["shard_id"]) == d // 8


def test_entry_matches_duckdb_oracle(spark):
    """The driver gate's comparison run locally at sf0.001: column
    names, row count, and every value must match the oracle."""
    import duckdb

    from duckdb_redis_olap_scanner_spark.plans import catalog

    e = catalog.registry()["multimodal_webdataset_reader"]
    sdf = e.fn(spark, SF_DIR)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    cur = con.execute(e.oracle)
    assert [d[0] for d in cur.description] == sdf.columns
    orows = sorted(tuple(r) for r in cur.fetchall())
    assert srows == orows


def test_read_half_plan_is_shuffle_free(spark):
    """The reader must add NO exchange beyond the export's shard
    grouping: at 100 TB the read half maps over existing shard blobs
    and any extra shuffle there is pure waste."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import table

    docs = table(spark, SF_DIR, "documents")
    shards = M.synthesize_webdataset_mm_shards(docs)
    n_exchanges_export = shards._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )
    full = M.read_webdataset_mm_features(shards)
    n_exchanges_full = full._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )
    assert n_exchanges_full == n_exchanges_export


def test_filesystem_roundtrip_matches_in_memory(spark, tmp_path):
    """Write real shard-%06d.tar files (atomic publish), read them
    back through Spark's binaryFile source: rows identical to the
    in-memory reader, no .tmp leftovers under the published glob."""
    import os

    from duckdb_redis_olap_scanner_spark.plans.catalog import table

    docs = table(spark, SF_DIR, "documents").filter("doc_id < 40")
    shards = M.synthesize_webdataset_mm_shards(docs)
    out_dir = str(tmp_path / "wds")
    published = M.write_webdataset_mm_files(shards, out_dir)
    names = sorted(os.listdir(out_dir))
    assert names == [f"shard-{sid:06d}.tar" for sid, _ in published]
    for sid, n_bytes in published:
        assert os.path.getsize(
            os.path.join(out_dir, f"shard-{sid:06d}.tar")
        ) == n_bytes
    want = sorted(
        tuple(r) for r in M.read_webdataset_mm_features(shards).collect()
    )
    got = sorted(
        tuple(r)
        for r in M.read_webdataset_mm_dir(spark, out_dir).collect()
    )
    assert got == want


def test_filesystem_write_is_idempotent(spark, tmp_path):
    """A retried export (same shards, same dir) republishes the same
    bytes — the atomic-replace contract."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import table

    docs = table(spark, SF_DIR, "documents").filter("doc_id < 16")
    shards = M.synthesize_webdataset_mm_shards(docs)
    out_dir = str(tmp_path / "wds2")
    first = M.write_webdataset_mm_files(shards, out_dir)
    second = M.write_webdataset_mm_files(shards, out_dir)
    assert first == second
    got = sorted(
        int(r["doc_id"])
        for r in M.read_webdataset_mm_dir(spark, out_dir).collect()
    )
    assert got == sorted(
        int(r[0]) for r in docs.select("doc_id").collect()
    )


def test_streaming_ingest_is_incremental_and_exactly_once(spark, tmp_path):
    """Structured Streaming over the published shard glob: run 1
    ingests the first publication, run 2 (same checkpoint) ingests
    ONLY the newly published shards — each sample row lands exactly
    once across both runs, and the union equals the batch reader."""
    from duckdb_redis_olap_scanner_spark.plans.catalog import table

    docs = table(spark, SF_DIR, "documents").filter("doc_id < 32")
    shard_dir = str(tmp_path / "shards")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            M.stream_webdataset_mm_dir(spark, shard_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    M.write_webdataset_mm_files(
        M.synthesize_webdataset_mm_shards(docs.filter("doc_id < 16")),
        shard_dir,
    )
    run_once()
    first = sorted(
        int(r[0]) for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert first == list(range(16))
    M.write_webdataset_mm_files(
        M.synthesize_webdataset_mm_shards(docs.filter("doc_id >= 16")),
        shard_dir,
    )
    run_once()
    rows = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    assert [r[0] for r in rows] == list(range(32))  # exactly once each
    want = sorted(
        tuple(r)
        for r in M.read_webdataset_mm_dir(spark, shard_dir).collect()
    )
    assert rows == want
