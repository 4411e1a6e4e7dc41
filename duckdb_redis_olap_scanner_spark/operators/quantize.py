"""Embedding compression: per-vector symmetric int8 scalar
quantization with exact reconstruction-error accounting.

The storage-side twin of the ANN operators in
``operators/similarity.py``: at 100 TB of embeddings the first cost
lever is bytes-per-vector (float32 -> int8 is 4x smaller and int8
dot products are what GPU/SIMD ANN kernels consume). This is a pure
narrow map — no shuffle, no Python workers, scan-bandwidth at any
scale — and every output is engine-exact:

* float32 -> double casts are exact;
* IEEE ``+ - * /`` are exactly rounded, so ``scale``, the quantized
  codes (``floor(x*scale + 0.5)`` — half-up for both signs, unlike
  engine-dependent ``round``), and the reconstruction error are
  bit-identical in Spark and DuckDB;
* the squared-error fold runs left-to-right over the dimensions via
  an explicit ``aggregate`` (Spark) / ``list_reduce`` (DuckDB), so
  float accumulation order is pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import fan_out

INT8_MAX = 127.0


def quantize_int8(embeddings: DataFrame) -> DataFrame:
    """(vec_id, scale, qvec, sq_err): per-vector symmetric int8
    quantization. ``scale = 127 / max(|x|)`` (NULL for an all-zero
    vector), ``qvec`` the comma-joined int8 codes, ``sq_err`` the
    exact left-fold sum of squared reconstruction errors."""
    e = fan_out(embeddings, key="vec_id")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", v.alias("v"))

    maxabs = F.array_max(F.transform("v", lambda x: F.abs(x)))
    scaled = base.select(
        "vec_id",
        "v",
        (F.lit(INT8_MAX) / F.nullif(maxabs, F.lit(0.0))).alias("scale"),
    )
    q = F.transform(
        "v",
        lambda x: F.floor(x * F.col("scale") + F.lit(0.5)).cast("int"),
    )
    qd = scaled.select("vec_id", "v", "scale", q.alias("qv"))

    recon_err = F.zip_with(
        "v",
        "qv",
        lambda a, b: (a - b.cast("double") / F.col("scale"))
        * (a - b.cast("double") / F.col("scale")),
    )
    sq_err = F.aggregate(recon_err, F.lit(0.0), lambda acc, x: acc + x)
    # An all-zero vector has NULL scale; make qvec explicitly NULL too
    # rather than relying on either engine's null-element array_join
    # behavior (Spark skips nulls, producing "" — a silently-wrong
    # "quantized" row).
    qvec = F.when(
        F.col("scale").isNotNull(),
        F.array_join(F.transform("qv", lambda x: x.cast("string")), ","),
    )
    return qd.select(
        "vec_id",
        "scale",
        qvec.alias("qvec"),
        sq_err.alias("sq_err"),
    )
