"""QUEUED catalog entries, r20 batch — NOT imported by
``catalog.registry()``.

Round 20's gate budget already carries two frontier slots
(``multimodal_decode_avi_interleaved``, landed from the r19 queue, and
the new ``multimodal_webdataset_reader``), which puts the post-r20
drain at 25 — the staged-bundle landing condition ("dirty <= ~25",
COVERAGE.md r19). A third frontier registration would push it to 26,
so the round's second capability stretch — the real Ogg/Opus container
walk (operators/ogg.py: RFC 3533 page CRC + lacing/continuation
reassembly, RFC 7845 OpusHead/OpusTags parse) — follows the r19 queue
pattern: fully implemented, tested (tests/test_ogg_opus.py,
third-opinion batch 27) and oracle-verified in-suite, registration
DEFERRED.

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


def register_queued() -> None:
    """Register the queued entry (the one-call landing step).
    Idempotent so ``registry()`` — which re-runs its import block on
    every call — can call it unconditionally."""
    if ENTRY_NAME not in _REGISTRY:
        register(ENTRY_NAME, oracle=ORACLE, tags=TAGS, doc=DOC)(
            multimodal_ogg_opus_walk
        )
