"""QUEUED catalog entries, r20 batch — NOT imported by
``catalog.registry()``.

Round 20's gate budget already carries two frontier slots
(``multimodal_decode_avi_interleaved``, landed from the r19 queue, and
the new ``multimodal_webdataset_reader``), which puts the post-r20
drain at 25 — the staged-bundle landing condition ("dirty <= ~25",
COVERAGE.md r19). Further frontier registrations would push it past
that bar, so the round's remaining capability stretches follow the
r19 queue pattern — fully implemented, tested, third-opinion audited
and oracle-verified in-suite, registration DEFERRED:

* ``multimodal_ogg_opus_walk`` — real Ogg/Opus container walk
  (operators/ogg.py: RFC 3533 page CRC + lacing/continuation
  reassembly, RFC 7845 OpusHead/OpusTags parse);
  tests/test_ogg_opus.py, third-opinion batch 27.
* ``ann_ivf_pq_persisted`` — persisted IVF-PQ index
  (operators/ann_index.py: bucketed code table, sidecar codebooks,
  generation-checked retry-idempotent append, bucket-pruned ADC
  probe); tests/test_ivf_pq_index.py, third-opinion batch 28.
* ``multimodal_mp4_box_walk`` — ISO-BMFF container walk
  (operators/mp4.py: largesize boxes, stbl sample tables, full
  stco/stsc/stsz sample extraction); tests/test_mp4_box_walk.py,
  third-opinion batch 29.
* ``parquet_footer_audit`` — from-scratch parquet footer walk
  (operators/parquet_meta.py: PAR1 framing, a full thrift
  COMPACT-protocol decoder, per-row-group column Statistics),
  cross-checked against the data itself; tests/test_parquet_meta.py
  (the independent re-derivation there is pyarrow's C++ reader,
  swept over every testdata table and a different writer config).
* ``zip_corpus_ingest`` — from-scratch ZIP archive reader
  (operators/zip_archive.py: backward EOCD scan, central-directory
  walk with local-header cross-check, stored + raw-deflate members,
  CRC-32/size verification) over archives written by stdlib
  ``zipfile``, a genuinely independent writer;
  tests/test_zip_archive.py, third-opinion batch 30.
* ``deflate_corpus_audit`` — from-scratch DEFLATE/zlib inflater
  (operators/inflate.py: LSB-first bit reader, canonical Huffman
  with oversubscription checks, the code-length repeat alphabet,
  LZ77 copy-back, RFC 1950 header + Adler-32) decoding streams
  written by stdlib zlib at every block type;
  tests/test_inflate.py, third-opinion batch 31.

IMPORTING THIS MODULE HAS NO SIDE EFFECT — registration is an
explicit :func:`register_queued` call (idempotent), so the suite can
exercise the entry's fn/oracle directly without making the in-process
registry disagree with the subprocess coverage scripts.

To land (one mechanical step, costs one frontier gate slot): inside
``catalog.registry()``'s import block add

    from . import queued_entries_r21
    queued_entries_r21.register_queued()

exactly as ``queued_entries_r20`` was landed in r20 (catalog.py's
round-2 block shows the precedent in place). The module-level edit
dirties nothing (function-level closure hashing).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators import ogg as O
from .catalog import _REGISTRY, register, table

ENTRY_NAME = "multimodal_ogg_opus_walk"

ORACLE = (
    # Every column is a closed form over doc_id (synthesis contract at
    # operators/ogg.py): n_pkt audio packets with per-packet lengths
    # len_p (packet 1 always > 255 — it is the one split across two
    # pages), byte_j = (doc_id*5 + p*17 + j*29) % 256 over the global
    # concatenated-audio index, granule = 960 per completed packet.
    # The checksum is position-weighted over the CONCATENATED packet
    # stream, so a dropped / reordered / continuation-mangled packet
    # cannot hash-match.
    """
    WITH d AS (
      SELECT doc_id, 3 + doc_id % 5 AS n_pkt FROM documents),
    pk AS (
      SELECT doc_id, n_pkt, unnest(range(0, CAST(n_pkt AS BIGINT))) AS p
      FROM d),
    pl AS (
      SELECT doc_id, n_pkt, p,
             CASE WHEN p = 1 THEN 256 + (doc_id * 3) % 244
                  ELSE 180 + (doc_id + p * 37) % 300 END AS len_p
      FROM pk),
    po AS (
      SELECT doc_id, n_pkt, p, len_p,
             COALESCE(SUM(len_p) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM pl),
    pb AS (
      SELECT doc_id, p, off,
             unnest(range(0, CAST(len_p AS BIGINT))) AS j
      FROM po),
    ac AS (
      SELECT doc_id,
             CAST(SUM((off + j + 1)
                      * ((doc_id * 5 + p * 17 + j * 29) % 256))
                  AS BIGINT) AS audio_checksum
      FROM pb GROUP BY doc_id),
    ab AS (
      SELECT doc_id, CAST(SUM(len_p) AS INT) AS audio_bytes
      FROM pl GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(21319 + d.doc_id AS BIGINT) AS serial,
           CAST(3 + d.n_pkt AS INT) AS n_pages,
           CAST(d.n_pkt AS INT) AS n_packets,
           CAST(1 + d.doc_id % 2 AS INT) AS channels,
           CAST(312 + d.doc_id % 100 AS INT) AS pre_skip,
           CAST(11 AS INT) AS vendor_len,
           CAST(1 AS INT) AS n_comments,
           ab.audio_bytes,
           ac.audio_checksum,
           CAST(960 * d.n_pkt AS BIGINT) AS last_granule
    FROM d
    JOIN ab ON d.doc_id = ab.doc_id
    JOIN ac ON d.doc_id = ac.doc_id
    """
)

TAGS = ("multimodal",)

DOC = (
    "REAL Ogg/Opus container walk, no codec library (r20, queued): "
    "synthesize a true single-stream Ogg Opus file per doc (BOS "
    "OpusHead page, OpusTags page, one audio packet per page with "
    "packet 1 deliberately split across two pages; every page carries "
    "the true RFC 3533 CRC — polynomial 0x04C11DB7, unreflected), "
    "then walk it back: per-page CRC + sequence verification, packet "
    "reassembly across lacing values and the continued-packet flag, "
    "RFC 7845 OpusHead/OpusTags parse, and a position-weighted "
    "checksum over the concatenated audio packets. Audio frames stay "
    "opaque (Opus needs libopus) — the entry pins the CONTAINER "
    "layer, like the AVI entries pin RIFF demuxing "
    "(operators/ogg.decode_ogg_opus). One narrow Arrow map, no "
    "shuffle; payloads never on the driver."
)


def multimodal_ogg_opus_walk(spark: SparkSession, sf: str):
    return O.decode_ogg_features(
        O.synthesize_ogg_streams(table(spark, sf, "documents"))
    )


PQ_ENTRY_NAME = "ann_ivf_pq_persisted"

PQ_ORACLE = (
    # VERBATIM the ann_ivf_pq oracle (plans/pipeline_ops.py): the
    # persisted index holds every vector's (cell, codes) against the
    # SAME frozen generations — built from the even half, the odd half
    # appended, evens ∪ odds = the full corpus — so the ADC probe
    # answers exactly what the one-shot ivf_pq_topk computes. Copied
    # rather than imported: naming the literal in pipeline_ops.py
    # would edit the @register decorator in ann_ivf_pq's source and
    # re-dirty that verified entry for zero behavior change.
    """
    WITH base AS (SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v FROM embeddings),
    prm AS (SELECT CAST(len(v) / 4 AS BIGINT) AS sd FROM base LIMIT 1),
    coarse AS (SELECT vec_id AS ccid, v AS ccv FROM base
               WHERE vec_id < 16),
    cscore AS (SELECT b.vec_id, c.ccid,
                      CAST(list_sum(list_transform(range(0, len(b.v)), i -> b.v[i+1] * c.ccv[i+1])) AS BIGINT) AS cdot
               FROM base b CROSS JOIN coarse c),
    cellof AS (SELECT vec_id, ccid AS cell
               FROM (SELECT vec_id, ccid, cdot,
                            row_number() OVER (PARTITION BY vec_id
                                               ORDER BY cdot DESC, ccid)
                                AS rn
                     FROM cscore)
               WHERE rn = 1),
    subs AS (
      SELECT b.vec_id, t.j,
             list_slice(b.v, t.j * p.sd + 1, (t.j + 1) * p.sd) AS s
      FROM base b CROSS JOIN prm p
      CROSS JOIN (SELECT unnest(range(0, 4)) AS j) t),
    seeds AS (SELECT j, vec_id AS cid, s AS cv FROM subs
              WHERE vec_id < 8),
    d0 AS (SELECT sub.vec_id, sub.j, sd.cid,
                  CAST(list_sum(list_transform(range(0, len(sub.s)), i -> (sub.s[i+1] - sd.cv[i+1]) * (sub.s[i+1] - sd.cv[i+1]))) AS BIGINT) AS d
           FROM subs sub JOIN seeds sd ON sd.j = sub.j),
    a0 AS (SELECT vec_id, j, cid AS cell
           FROM (SELECT vec_id, j, cid, d,
                        row_number() OVER (PARTITION BY vec_id, j
                                           ORDER BY d ASC, cid ASC) AS rn
                 FROM d0)
           WHERE rn = 1),
    ex AS (SELECT a0.j, a0.cell, r.pos, sub.s[r.pos + 1] AS val
           FROM a0 JOIN subs sub
             ON sub.vec_id = a0.vec_id AND sub.j = a0.j
           CROSS JOIN prm p
           CROSS JOIN LATERAL (SELECT unnest(range(0, p.sd)) AS pos) r),
    sv AS (SELECT j, cell, pos, CAST(SUM(val) AS BIGINT) AS sm,
                  COUNT(*) AS cnt
           FROM ex GROUP BY j, cell, pos),
    mean AS (SELECT j, cell, list(sm // cnt ORDER BY pos) AS mv
             FROM sv GROUP BY j, cell),
    cents AS (SELECT sd.j, sd.cid AS cell, coalesce(m.mv, sd.cv) AS cv
              FROM seeds sd LEFT JOIN mean m
                ON m.j = sd.j AND m.cell = sd.cid),
    d1 AS (SELECT sub.vec_id, sub.j, c.cell,
                  CAST(list_sum(list_transform(range(0, len(sub.s)), i -> (sub.s[i+1] - c.cv[i+1]) * (sub.s[i+1] - c.cv[i+1]))) AS BIGINT) AS d
           FROM subs sub JOIN cents c ON c.j = sub.j),
    enc AS (SELECT vec_id, j, cell AS code
            FROM (SELECT vec_id, j, cell, d,
                         row_number() OVER (PARTITION BY vec_id, j
                                            ORDER BY d ASC, cell ASC) AS rn
                  FROM d1)
            WHERE rn = 1),
    qprobe AS (SELECT vec_id AS query_id, ccid AS cell
               FROM (SELECT vec_id, ccid, cdot,
                            row_number() OVER (PARTITION BY vec_id
                                               ORDER BY cdot DESC, ccid)
                                AS rn
                     FROM cscore WHERE vec_id < 3)
               WHERE rn <= 2),
    qs AS (SELECT vec_id AS query_id, j, s AS qsv FROM subs
           WHERE vec_id < 3),
    lut AS (SELECT q.query_id, q.j, c.cell,
                   CAST(list_sum(list_transform(range(0, len(q.qsv)), i -> (q.qsv[i+1] - c.cv[i+1]) * (q.qsv[i+1] - c.cv[i+1]))) AS BIGINT) AS dl
            FROM qs q JOIN cents c ON c.j = q.j),
    cand AS (SELECT p.query_id, co.vec_id AS neighbor_id, co.cell
             FROM qprobe p JOIN cellof co ON co.cell = p.cell
             WHERE co.vec_id <> p.query_id),
    adc AS (SELECT ca.query_id, ca.neighbor_id, ca.cell,
                   CAST(SUM(l.dl) AS BIGINT) AS adc_dist
            FROM cand ca
            JOIN enc e ON e.vec_id = ca.neighbor_id
            JOIN lut l ON l.query_id = ca.query_id
                      AND l.j = e.j AND l.cell = e.code
            GROUP BY ca.query_id, ca.neighbor_id, ca.cell)
    SELECT query_id, neighbor_id, cell, adc_dist, rank FROM (
      SELECT query_id, neighbor_id, cell, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist ASC, neighbor_id ASC)
                 AS rank
      FROM adc
    ) WHERE rank <= 5
    """
)

PQ_TAGS = ("similarity",)

PQ_DOC = (
    "IVF-PQ search against a PERSISTED code table (r20, queued): "
    "(vec_id, cell, codes) bucketed on cell — ~85x smaller than the "
    "raw-vector IVF index, the 100 TB deployment shape where probes "
    "scan codes and never raw vectors. Built from the even half of "
    "the corpus and INCREMENTALLY appended with the odd half against "
    "the same frozen coarse+codebook generations (sidecar-recorded, "
    "generation-checked, retry-idempotent — the dedup_index "
    "maintenance loop applied to PQ codes); each query's probed "
    "cells become bucket-pruning IN literals and its m x ks ADC "
    "lookup table rides a broadcast Q-row frame, scored as a pure "
    "zip_with/element_at expression under WindowGroupLimit. Result "
    "contract identical to ann_ivf_pq by construction "
    "(operators/ann_index.ivf_pq_indexed_topk)."
)


def ann_ivf_pq_persisted(spark: SparkSession, sf: str):
    from pyspark.sql import functions as F

    from ..operators import ann_index as AI
    from .pipeline_ops5 import _index_ns, _index_tag

    emb = table(spark, sf, "embeddings")
    coarse, cent, sd = AI.ivf_pq_codebooks(emb, 16)
    name, path = _index_ns(spark, f"ivf_pq_idx_{_index_tag(sf)}")
    AI.write_ivf_pq_index(
        emb.filter(F.col("vec_id") % 2 == 0), coarse, cent, sd,
        name, path=path,
    )
    AI.append_to_ivf_pq_index(
        emb.filter(F.col("vec_id") % 2 == 1), coarse, cent, sd, name
    )
    return AI.ivf_pq_indexed_topk(
        spark, name, coarse, cent, sd,
        emb.filter(F.col("vec_id") < 3), k=5, n_probe=2,
    )


MP4_ENTRY_NAME = "multimodal_mp4_box_walk"

MP4_ORACLE = (
    # Closed forms over doc_id (synthesis contract at
    # operators/mp4.py): n samples of per-sample length len_s,
    # byte (s,j) = (doc_id*3 + s*11 + j*17) % 256 over the global
    # concatenated-sample index; geometry/timescale/duration are
    # modular arithmetic. The checksum is position-weighted over the
    # EXTRACTED samples in stco/stsc/stsz order, so a mis-parsed
    # offset, size, or chunk run cannot hash-match.
    """
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 6 AS n FROM documents),
    sp AS (
      SELECT doc_id, n, unnest(range(0, CAST(n AS BIGINT))) AS s
      FROM d),
    sl AS (
      SELECT doc_id, n, s,
             50 + (doc_id * 7 + s * 13) % 120 AS len_s
      FROM sp),
    so AS (
      SELECT doc_id, s, len_s,
             COALESCE(SUM(len_s) OVER (
               PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM sl),
    sb AS (
      SELECT doc_id, s, off,
             unnest(range(0, CAST(len_s AS BIGINT))) AS j
      FROM so),
    ck AS (
      SELECT doc_id,
             CAST(SUM((off + j + 1)
                      * ((doc_id * 3 + s * 11 + j * 17) % 256))
                  AS BIGINT) AS sample_checksum
      FROM sb GROUP BY doc_id),
    tb AS (
      SELECT doc_id, CAST(SUM(len_s) AS INT) AS total_sample_bytes
      FROM sl GROUP BY doc_id)
    SELECT dd.doc_id,
           'isom' AS brand,
           CAST(1000 + (dd.doc_id % 5) * 200 AS INT) AS timescale,
           CAST((4 + dd.doc_id % 6) * 40 AS INT) AS duration,
           'vide' AS handler,
           CAST(16 * (1 + dd.doc_id % 3) AS INT) AS width,
           CAST(16 * (1 + dd.doc_id % 2) AS INT) AS height,
           CAST(4 + dd.doc_id % 6 AS INT) AS n_samples,
           CAST(2 AS INT) AS n_chunks,
           tb.total_sample_bytes,
           ck.sample_checksum
    FROM documents dd
    JOIN tb ON dd.doc_id = tb.doc_id
    JOIN ck ON dd.doc_id = ck.doc_id
    """
)

MP4_TAGS = ("multimodal",)

MP4_DOC = (
    "REAL ISO-BMFF (MP4) container walk, no codec library (r20, "
    "queued): synthesize a spec-shaped progressive MP4 per doc (ftyp; "
    "moov with mvhd, one 'vide' trak whose stbl carries a true "
    "86-byte VisualSampleEntry, one-run stts, two-chunk stsc, "
    "explicit stsz, ABSOLUTE stco offsets; mdat written in the "
    "64-bit largesize form), then walk it back with an iterative "
    "span-stack box parser and EXTRACT every sample through "
    "stco+stsc+stsz — geometry cross-checked between tkhd and stsd, "
    "stts span against mvhd duration, extracted bytes against mdat, "
    "and a position-weighted checksum over the samples in decode "
    "order. Samples stay opaque (codec bitstreams belong to the "
    "codec entries); the entry pins the container layer, like the "
    "AVI and Ogg walks (operators/mp4.decode_mp4). One narrow Arrow "
    "map, no shuffle; payloads never on the driver."
)


def multimodal_mp4_box_walk(spark: SparkSession, sf: str):
    from ..operators import mp4 as V

    return V.decode_mp4_features(
        V.synthesize_mp4_streams(table(spark, sf, "documents"))
    )


PARQUET_ENTRY_NAME = "parquet_footer_audit"

PARQUET_ORACLE = (
    # The oracle recomputes FROM THE DATA what the footer claims:
    # num_values (total slots, nulls included — ColumnMetaData
    # semantics), null_count, and min/max per audited column. A
    # thrift mis-parse, a wrong stat-value decode, or a corrupted
    # writer statistic all hash-mismatch. Only short, non-truncatable
    # columns are audited (writers may truncate long BYTE_ARRAY
    # stats).
    """
    SELECT 'doc_id' AS col, 'INT64' AS physical_type,
           CAST(COUNT(*) AS BIGINT) AS num_values,
           CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS null_count,
           CAST(MIN(doc_id) AS VARCHAR) AS min_val,
           CAST(MAX(doc_id) AS VARCHAR) AS max_val
    FROM documents
    UNION ALL
    SELECT 'lang', 'BYTE_ARRAY',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(lang) AS BIGINT),
           MIN(lang), MAX(lang)
    FROM documents
    UNION ALL
    SELECT 'source', 'BYTE_ARRAY',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(source) AS BIGINT),
           MIN(source), MAX(source)
    FROM documents
    """
)

PARQUET_TAGS = ("pipeline", "olap")

PARQUET_DOC = (
    "Parquet FOOTER audit with a from-scratch reader, no parquet "
    "library (r20, queued): read the documents table's parquet "
    "file(s) as binary blobs, parse each footer byte-for-byte — PAR1 "
    "framing, little-endian footer length, a full Apache Thrift "
    "COMPACT-protocol decoder (varint/zigzag, delta field ids, "
    "nested structs/lists), parquet.thrift field numbering down to "
    "per-row-group column Statistics — and emit the writer-recorded "
    "num_values/null_count/min/max per audited column. The oracle "
    "recomputes the same quantities FROM THE DATA, so the entry pins "
    "both the thrift parse and the statistics every pruned scan "
    "trusts (operators/parquet_meta.parse_footer). Footer-only "
    "parse; at scale the read is a range request for the file tail."
)


def parquet_footer_audit(spark: SparkSession, sf: str):
    from ..operators import parquet_meta as P

    return P.parquet_footer_stats(spark, sf).select(
        "col", "physical_type", "num_values", "null_count",
        "min_val", "max_val",
    )


ZIP_ENTRY_NAME = "zip_corpus_ingest"

ZIP_ORACLE = (
    # The oracle recomputes every reported quantity FROM THE SOURCE
    # COLUMNS, never from the archive: member count is the writer's
    # contract (one .txt + one .json per doc), n_raw is the byte
    # length of both members' uncompressed payloads, and the md5s
    # hash the members the reader RECOVERED — so a walker that
    # mis-inflates, drops, or swaps a member cannot hash-match.
    """
    WITH j AS (
      SELECT doc_id,
             COALESCE(text, '') AS txt,
             '{"lang": "' || COALESCE(lang, '')
               || '", "source": "' || COALESCE(source, '')
               || '"}' AS js
      FROM documents)
    SELECT doc_id,
           CAST(2 AS INT) AS n_members,
           CAST(octet_length(encode(txt)) + octet_length(encode(js))
                AS INT) AS n_raw,
           md5(txt) AS txt_md5,
           md5(js) AS json_md5
    FROM j
    """
)

ZIP_TAGS = ("pipeline",)

ZIP_DOC = (
    "From-scratch ZIP archive reader (r20, queued): pack each doc "
    "into a real ZIP with stdlib zipfile (an INDEPENDENT writer — "
    "text member deflated, metadata member stored), then read it "
    "back with a byte-level APPNOTE.TXT walker — backward EOCD scan "
    "through a possible archive comment, central-directory-driven "
    "member enumeration with local-header cross-check, raw-deflate "
    "inflation, and per-member CRC-32 + size verification "
    "(operators/zip_archive.zip_members). The oracle recomputes "
    "member count, raw bytes, and both member md5s from the source "
    "columns, so every hop of the round trip is pinned. One narrow "
    "Arrow map, no shuffle; archives never on the driver."
)


def zip_corpus_ingest(spark: SparkSession, sf: str):
    from ..operators import zip_archive as Z

    return Z.zip_ingest(table(spark, sf, "documents")).select(
        "doc_id", "n_members", "n_raw", "txt_md5", "json_md5"
    )


INFLATE_ENTRY_NAME = "deflate_corpus_audit"

INFLATE_ORACLE = (
    # Closed forms over the source column only: the wrapper routing
    # is doc_id % 3, n_raw/txt_md5 are recomputed from text — a
    # single mis-inflated byte anywhere changes the md5.
    """
    SELECT doc_id,
           CAST(octet_length(encode(COALESCE(text, ''))) AS INT)
             AS n_raw,
           CASE doc_id % 3 WHEN 1 THEN 'raw' WHEN 2 THEN 'gzip'
                ELSE 'zlib' END AS wrapper,
           md5(COALESCE(text, '')) AS txt_md5
    FROM documents
    """
)

INFLATE_TAGS = ("pipeline",)

INFLATE_DOC = (
    "From-scratch DEFLATE/zlib inflater audit (r20, queued): "
    "compress each doc's text with stdlib zlib — the independent "
    "producer, level = doc_id % 10 so stored, fixed- and "
    "dynamic-Huffman block types all occur; doc_id % 3 routes raw "
    "deflate, the RFC 1950 wrapper, or a full RFC 1952 gzip member — "
    "then decode the bitstream with the from-scratch inflater "
    "(operators/inflate.py: LSB-first bit reader, canonical Huffman "
    "with oversubscription checks, code-length repeat alphabet, LZ77 "
    "copy-back, gzip header walk, CRC-32/ISIZE/Adler-32) and md5 "
    "the RECOVERED bytes. Audit path for the zlib dependence under "
    "PNG/TIFF/ZIP, like the parquet footer walk audits pyarrow. One "
    "narrow Arrow map, no shuffle; streams never on the driver."
)


def deflate_corpus_audit(spark: SparkSession, sf: str):
    from ..operators import inflate as I

    return I.deflate_audit(table(spark, sf, "documents"))


def register_queued() -> None:
    """Register the queued entries (the one-call landing step).
    Idempotent so ``registry()`` — which re-runs its import block on
    every call — can call it unconditionally."""
    if ENTRY_NAME not in _REGISTRY:
        register(ENTRY_NAME, oracle=ORACLE, tags=TAGS, doc=DOC)(
            multimodal_ogg_opus_walk
        )
    if PQ_ENTRY_NAME not in _REGISTRY:
        register(
            PQ_ENTRY_NAME, oracle=PQ_ORACLE, tags=PQ_TAGS, doc=PQ_DOC
        )(ann_ivf_pq_persisted)
    if MP4_ENTRY_NAME not in _REGISTRY:
        register(
            MP4_ENTRY_NAME, oracle=MP4_ORACLE, tags=MP4_TAGS, doc=MP4_DOC
        )(multimodal_mp4_box_walk)
    if PARQUET_ENTRY_NAME not in _REGISTRY:
        register(
            PARQUET_ENTRY_NAME, oracle=PARQUET_ORACLE,
            tags=PARQUET_TAGS, doc=PARQUET_DOC,
        )(parquet_footer_audit)
    if ZIP_ENTRY_NAME not in _REGISTRY:
        register(
            ZIP_ENTRY_NAME, oracle=ZIP_ORACLE, tags=ZIP_TAGS,
            doc=ZIP_DOC,
        )(zip_corpus_ingest)
    if INFLATE_ENTRY_NAME not in _REGISTRY:
        register(
            INFLATE_ENTRY_NAME, oracle=INFLATE_ORACLE,
            tags=INFLATE_TAGS, doc=INFLATE_DOC,
        )(deflate_corpus_audit)
