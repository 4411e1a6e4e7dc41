"""QUEUED catalog entries — NOT imported by ``catalog.registry()``.

The r19 gate budget (VERDICT r18 task 3: ``dirty_total`` ≤ 73 after
the round, 50-slot window) had no slack for a new frontier entry, so
the round-19 capability addition — the interleaved audio+video AVI
decode (VERDICT r18 task 6) — is fully implemented, tested
(tests/test_avi_interleaved.py, third-opinion batch 25) and
oracle-verified locally (tests/test_avi_interleaved.py::
test_queued_entry_matches_duckdb_oracle), but its registration is
DEFERRED: registering it would have consumed one r19 gate slot and
left the drain at 74.

IMPORTING THIS MODULE HAS NO SIDE EFFECT — registration is an
explicit :func:`register_queued` call (idempotent), so the r19 test
suite can exercise the entry's fn/oracle attributes directly without
making the in-process registry disagree with the subprocess scripts
(tests/test_plans.py::test_coverage_counts_script_matches_registry
pins exactly that agreement).

To land in r20 (one mechanical step, costs one frontier gate slot):
inside ``catalog.registry()``'s round-2 import block add

    from . import queued_entries_r20
    queued_entries_r20.register_queued()

— or cut the block below into pipeline_ops5.py as a plain
``@register`` entry, matching the r18 precedent. Either way the
module-level edit dirties nothing (function-level closure hashing) —
PROBED in r19 on a throwaway clone: the registry() edit above yields
entries_total 224, gate_window_frontier [multimodal_decode_avi_
interleaved], dirty_total unchanged at 123. Only the frontier gate
slot is the cost (see COVERAGE.md "Round 19").
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators import multimodal as M
from .catalog import _REGISTRY, register, table

ENTRY_NAME = "multimodal_decode_avi_interleaved"

ORACLE = (
    # Two-stream AVI (r19, queued to the r20 gate): stream 0 is the
    # MJPEG video of multimodal_decode_avi_mjpeg (frame f = the
    # closed-form JFIF for jid = d + 6*f), stream 1 is G.711 mu-law
    # audio, one 267-sample '01wb' chunk interleaved after each
    # '00dc' frame. The oracle reproduces BOTH streams in SQL: the
    # per-(frame, block, component) sparse coefficient synthesis +
    # dequantization of the video (verbatim from the MJPEG entry) and
    # the standard integer mu-law expansion of the audio stream
    # (verbatim from the wav_mulaw entry) over the interleaved global
    # sample index s = f*267 + j, b_s = (d*13 + s*31) % 256. Both
    # checksums are position-weighted ((f+1) / (s+1)), so frame order
    # AND audio chunk order are pinned.
    """
    WITH dims AS (
      SELECT doc_id,
             CAST(8 * (1 + doc_id % 3) AS INT) AS width,
             CAST(8 * (1 + doc_id % 2) AS INT) AS height,
             (1 + doc_id % 3) * (1 + doc_id % 2) AS nb,
             2 + doc_id % 4 AS nf
      FROM documents),
    fbc AS (
      SELECT doc_id, width, height, nb, nf,
             unnest(range(0, nf * nb * 3)) AS i
      FROM dims),
    t AS (
      SELECT doc_id, width, height, nb, nf,
             i // (nb * 3) AS f,
             (i % (nb * 3)) // 3 AS b,
             i % 3 AS c,
             doc_id + 6 * (i // (nb * 3)) AS jid
      FROM fbc),
    q AS (
      SELECT doc_id, width, height, nb, nf, f, b, c,
             ((jid*5 + b*11 + c*23) % 61) - 30 AS dc,
             1 + ((jid + b + c) % 9) AS z1,
             ((jid + 7*b + 13*c) % 19) - 9 AS v1,
             20 + ((jid*3 + b*7 + c*5) % 40) AS z2,
             ((jid*7 + 3*b + 5*c) % 13) - 6 AS v2
      FROM t),
    d AS (
      SELECT doc_id, width, height, nb, nf, f, b, c, z1, z2,
             dc * (CASE WHEN c = 0 THEN 1 ELSE 2 END) AS dq0,
             v1 * (CASE WHEN c = 0 THEN 1 + (5*z1) % 16
                        ELSE 2 + (3*z1) % 24 END) AS dq1,
             v2 * (CASE WHEN c = 0 THEN 1 + (5*z2) % 16
                        ELSE 2 + (3*z2) % 24 END) AS dq2
      FROM q),
    vstats AS (
      SELECT doc_id, width, height,
             CAST(nf AS INT) AS n_frames,
             CAST(nf * nb * 3 AS INT) AS n_blocks,
             CAST(SUM(dq0) AS BIGINT) AS sum_dc,
             CAST(SUM(dq1 + dq2) AS BIGINT) AS sum_ac,
             CAST(SUM((f + 1) * ((b*192 + c*64 + 1) * dq0
                               + (b*192 + c*64 + z1 + 1) * dq1
                               + (b*192 + c*64 + z2 + 1) * dq2))
                  AS BIGINT) AS frame_checksum
      FROM d
      GROUP BY doc_id, width, height, nb, nf),
    aud AS (
      SELECT doc_id, nf, unnest(range(0, nf * 267)) AS s
      FROM dims),
    au AS (
      SELECT doc_id, nf, s,
             255 - ((doc_id * 13 + s * 31) % 256) AS uu
      FROM aud),
    av AS (
      SELECT doc_id, nf, s,
             CASE WHEN uu >= 128
                  THEN 132 - ((uu % 16) * 8 + 132)
                             * (1 << ((uu // 16) % 8))
                  ELSE ((uu % 16) * 8 + 132)
                       * (1 << ((uu // 16) % 8)) - 132
             END AS val
      FROM au),
    astats AS (
      SELECT doc_id,
             CAST(8000 AS INT) AS sample_rate,
             CAST(nf * 267 AS INT) AS n_audio_samples,
             CAST(SUM(val) AS BIGINT) AS audio_sum,
             CAST(SUM((s + 1) * val) AS BIGINT) AS audio_checksum
      FROM av GROUP BY doc_id, nf)
    SELECT v.doc_id, v.width, v.height, v.n_frames, v.n_blocks,
           v.sum_dc, v.sum_ac, v.frame_checksum,
           a.sample_rate, a.n_audio_samples, a.audio_sum,
           a.audio_checksum
    FROM vstats v JOIN astats a ON v.doc_id = a.doc_id
    """
)

TAGS = ("multimodal",)

DOC = (
    "REAL two-stream container decode, no codec library: "
    "synthesize a true interleaved A/V AVI per doc (hdrl with TWO "
    "strls — 'vids'/MJPG and 'auds'/WAVEFORMAT tag 7; movi "
    "alternating one complete baseline JFIF '00dc' chunk and one "
    "267-sample G.711 mu-law '01wb' chunk per frame), then fully "
    "demux and decode BOTH streams: recursive LIST walk with "
    "positional strh→strf binding, first-'vids' codec decision, "
    "strict MJPG/mu-law/geometry/frame-count/interleave validation, "
    "complete T.81 entropy decode per video frame and the standard "
    "integer G.711 expansion over the concatenated audio — composing "
    "three decoders this package already carries "
    "(operators/multimodal.decode_avi_mjpeg_mulaw). frame_checksum "
    "and audio_checksum are position-weighted, pinning frame AND "
    "audio chunk order."
)


def multimodal_decode_avi_interleaved(spark: SparkSession, sf: str):
    return M.decode_avi_interleaved_features(
        M.synthesize_avi_interleaved(table(spark, sf, "documents"))
    )


def register_queued() -> None:
    """Register the queued entry (r20's one-call landing step).
    Idempotent so ``registry()`` — which re-runs its import block on
    every call — can call it unconditionally."""
    if ENTRY_NAME not in _REGISTRY:
        register(ENTRY_NAME, oracle=ORACLE, tags=TAGS, doc=DOC)(
            multimodal_decode_avi_interleaved
        )
