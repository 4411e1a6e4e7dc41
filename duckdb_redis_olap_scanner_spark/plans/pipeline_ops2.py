"""Round-2 pipeline additions: the remaining multimodal shapes
(resize, frame-sample) from the training-data-pipeline surface.

Like ``relational2``, this module registers AFTER every round-1 module
(see ``catalog.registry``) so the driver's 50-entry correctness gate
drains the round-1 unverified frontier first.

The media math is a deterministic stand-in (no image/audio libs in
this container — see ``operators/multimodal.py``); the Spark-side
plumbing (binary column, metadata struct, Arrow batch shape,
partition preservation, in-worker fan-out) is real and oracle-checked
end to end.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators import multimodal as M
from .catalog import register, table


@register(
    "multimodal_resize_stub",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS orig_bytes,
           CAST(64 AS INT) AS target_w,
           CAST(48 AS INT) AS target_h,
           CAST(LEAST(octet_length(encode(text)), 64 * 48) AS INT) AS resized_bytes,
           'image-stub' AS modality
    FROM documents
    """,
    tags=("multimodal",),
    doc="Resize over binary payloads through mapInPandas (Arrow "
    "batches, partition-preserving, payloads never on the driver); "
    "the pixel math is a deterministic crop stand-in — swap the "
    "closure for Pillow Image.resize when available "
    "(operators/multimodal.py:make_fake_resize).",
)
def multimodal_resize_stub(spark: SparkSession, sf: str):
    return M.resize_stub_pipeline(table(spark, sf, "documents"))


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH base AS (
        SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    fr AS (
        SELECT doc_id, n,
               unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT), 4)) AS i
        FROM base
    )
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           CAST(i * 256 AS INT) AS frame_off,
           CAST(LEAST(256, n - i * 256) AS INT) AS frame_len
    FROM fr
    """,
    tags=("multimodal", "lateral"),
    doc="Frame sampling: the payload framed at 256 bytes/frame, every "
    "4th frame emitted — one input row fans out to its sampled frames "
    "INSIDE the Arrow batch (no explode shuffle, no driver hop); "
    "output volume is 1/4 of the frames regardless of corpus size.",
)
def multimodal_frame_sample(spark: SparkSession, sf: str):
    return M.frame_sample_pipeline(table(spark, sf, "documents"))
