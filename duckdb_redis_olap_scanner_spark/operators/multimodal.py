"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, partitioning, UDF signature, batch
shape) is real and tested; the actual media decoding is STUBBED because
no image/audio library exists in this container:

* ``decode_image`` / ``decode_audio`` raise ``NotImplementedError``
  unless Pillow / soundfile are importable (import-gated).
* ``fake_decode_features`` is the deterministic stand-in used by tests
  and the catalog oracle: features derived arithmetically from the
  payload byte length, so DuckDB can verify the full pipeline.

At scale: ``mapInPandas`` streams Arrow batches through the Python
worker — payload bytes never materialize on the driver, and the
operator preserves the upstream partitioning (no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, modality string"
)


def _try_import_pillow():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes):
    """Real image decode — gated on Pillow availability."""
    image_mod = _try_import_pillow()
    if image_mod is None:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed in this "
            "container; use fake_decode_features for the pipeline plumbing"
        )
    import io

    return image_mod.open(io.BytesIO(payload))


def decode_audio(payload: bytes):
    raise NotImplementedError(
        "audio decoding requires an audio library not present in this "
        "container; use fake_decode_features for the pipeline plumbing"
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column + typed metadata struct —
    the storage shape for multimodal data (bytes + sidecar metadata)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.octet_length("text").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.lit("utf-8").alias("encoding"),
        ).alias("meta"),
    )


def fake_decode_features(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder: features are pure arithmetic on the
    payload length (so the pipeline is oracle-checkable end to end)."""
    for pdf in batch_iter:
        n = pdf["payload"].apply(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": (n).astype("int32"),
                "fake_width": (n % 640).astype("int32"),
                "fake_height": ((n * 7) % 480).astype("int32"),
                "modality": "image-stub",
            }
        )


def decode_stub_pipeline(docs: DataFrame) -> DataFrame:
    """binary payload → mapInPandas decode (Arrow batches) → typed features.

    The decode function is pickled by module reference, so the package
    must be importable in the Python workers — ship it for sessions
    created outside ``get_spark()`` (which exports PYTHONPATH itself).
    """
    from ..engine import ship_package

    ship_package(docs.sparkSession)
    return with_binary_payload(docs).mapInPandas(
        fake_decode_features, schema=DECODED_SCHEMA
    )


RESIZED_SCHEMA = (
    "doc_id long, orig_bytes int, target_w int, target_h int, "
    "resized_bytes int, modality string"
)

FRAME_BYTES = 256
FRAME_EVERY = 4
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off int, frame_len int"


def make_fake_resize(target_w: int, target_h: int):
    """Deterministic resize stand-in: the 'resized' payload size is the
    crop min(orig, w·h) — pure arithmetic, so DuckDB can verify the
    whole pipeline. A real implementation swaps this closure for a
    Pillow ``Image.resize`` over ``io.BytesIO(payload)`` (same mapInPandas
    signature, same schema, decode import-gated as in
    :func:`decode_image`)."""

    def fake_resize(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            n = pdf["payload"].apply(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": n.astype("int32"),
                    "target_w": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "target_h": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "resized_bytes": n.clip(upper=target_w * target_h).astype(
                        "int32"
                    ),
                    "modality": "image-stub",
                }
            )

    return fake_resize


def resize_stub_pipeline(
    docs: DataFrame, target_w: int = 64, target_h: int = 48
) -> DataFrame:
    """binary payload → mapInPandas resize (Arrow batches) → size metadata.
    Partition-preserving, no shuffle, payloads never leave the workers."""
    from ..engine import ship_package

    ship_package(docs.sparkSession)
    return with_binary_payload(docs).mapInPandas(
        make_fake_resize(target_w, target_h), schema=RESIZED_SCHEMA
    )


def _sample_frames(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fixed-size 'video' framing of the payload (FRAME_BYTES per frame),
    emitting every FRAME_EVERY-th frame — the frame-sampling shape: one
    input row fans out to its sampled frames, all inside the worker."""
    for pdf in batch_iter:
        doc_ids: list[int] = []
        idxs: list[int] = []
        offs: list[int] = []
        lens: list[int] = []
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            nframes = -(-n // FRAME_BYTES)
            for i in range(0, nframes, FRAME_EVERY):
                doc_ids.append(did)
                idxs.append(i)
                offs.append(i * FRAME_BYTES)
                lens.append(min(FRAME_BYTES, n - i * FRAME_BYTES))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_off": pd.Series(offs, dtype="int32"),
                "frame_len": pd.Series(lens, dtype="int32"),
            }
        )


def frame_sample_pipeline(docs: DataFrame) -> DataFrame:
    """binary payload → per-frame fan-out with sampling (mapInPandas).
    The fan-out happens inside the Arrow batch — no explode shuffle, no
    driver involvement; output volume is input/FRAME_EVERY frames."""
    from ..engine import ship_package

    ship_package(docs.sparkSession)
    return with_binary_payload(docs).mapInPandas(
        _sample_frames, schema=FRAME_SCHEMA
    )
