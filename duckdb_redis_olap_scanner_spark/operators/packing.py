"""Sequence packing for training-batch prep: lay documents head-to-
tail into fixed-length token sequences (context windows), the step
that turns a curated corpus into the dense token stream a trainer
consumes.

Deterministic, engine-exact packing: documents are ordered by a
salted-free content hash (stable across runs, engines, and doc-id
renumbering), the token stream is cut every ``seq_len`` tokens, and
each document reports the sequences it lands in. Documents that
straddle a cut are split across the two sequences — exactly what
concat-and-chunk training pipelines do.

Scale shape: packing is bucketed by content hash. Within a bucket the
running offset is a window cumulative sum — inherently sequential, so
a bucket is the unit of parallelism. ``n_buckets`` here is sized for
the test corpus; at 100 TB you raise it so one bucket's documents fit
a task (buckets are statistically even: the bucket key is a crypto
hash), and the per-bucket sums never touch the driver. All arithmetic
is int64; the only division is by a power-of-two ``seq_len``, which
is exact in IEEE doubles, so the oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import canonical_text, md5_hash64, tokens_col
from .util import fan_out

PACK_SEQ_LEN = 256  # power of two: start/seq_len stays IEEE-exact
N_PACK_BUCKETS = 32


def pack_sequences(
    docs: DataFrame,
    seq_len: int = PACK_SEQ_LEN,
    n_buckets: int = N_PACK_BUCKETS,
) -> DataFrame:
    """(doc_id, bucket, n_tok, start_tok, first_seq, n_seqs): each
    document's position in its bucket's packed token stream —
    ``start_tok`` the running offset, ``first_seq``/``n_seqs`` the
    range of ``seq_len``-token training sequences it occupies."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets={n_buckets} must be >= 1")
    if seq_len < 1 or seq_len & (seq_len - 1):
        raise ValueError(
            f"seq_len={seq_len} must be a power of two: the "
            "start/seq_len division is only engine-exact for "
            "power-of-two divisors"
        )
    t = fan_out(docs, key="doc_id").select(
        "doc_id",
        F.size(tokens_col()).alias("n_tok"),
        md5_hash64(canonical_text()).alias("h"),
    )
    b = t.select(
        "doc_id", "n_tok", "h", (F.col("h") % n_buckets).alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    cum = F.sum("n_tok").over(w)
    c = b.select("doc_id", "bucket", "n_tok", cum.alias("cum"))
    start = F.col("cum") - F.col("n_tok")
    first_seq = F.floor(start / F.lit(seq_len)).cast("long")
    last_seq = F.floor((F.col("cum") - 1) / F.lit(seq_len)).cast("long")
    return c.select(
        "doc_id",
        "bucket",
        "n_tok",
        start.alias("start_tok"),
        first_seq.alias("first_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
    )


def pack_manifest(
    docs: DataFrame,
    seq_len: int = PACK_SEQ_LEN,
    n_buckets: int = N_PACK_BUCKETS,
) -> DataFrame:
    """Sequence-level packing manifest: (bucket, seq, n_docs,
    n_tokens, fill_frac) — how many documents contribute to each
    fixed-length training sequence and how full it is. ``fill_frac``
    is the padding-waste metric packing exists to maximize; every
    sequence except each bucket's last should be exactly full.

    Derived from :func:`pack_sequences` by fanning each doc out to the
    sequences it spans (generator explode, n_seqs rows per doc) and
    clipping its token interval to each sequence window — integer
    interval arithmetic, then one (bucket, seq)-keyed partial-combined
    aggregation. fill = tokens/seq_len stays IEEE-exact because
    ``seq_len`` is a power of two."""
    p = pack_sequences(docs, seq_len, n_buckets)
    seqs = p.select(
        "bucket",
        "n_tok",
        "start_tok",
        F.explode(
            F.sequence(
                F.col("first_seq"),
                F.col("first_seq") + F.col("n_seqs") - 1,
            )
        ).alias("seq"),
    )
    tok = F.least(
        F.col("start_tok") + F.col("n_tok"), (F.col("seq") + 1) * seq_len
    ) - F.greatest(F.col("start_tok"), F.col("seq") * seq_len)
    return (
        seqs.groupBy("bucket", "seq")
        .agg(F.count("*").alias("n_docs"), F.sum(tok).alias("n_tokens"))
        .select(
            "bucket",
            "seq",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.lit(float(seq_len))).alias(
                "fill_frac"
            ),
        )
        .orderBy("bucket", "seq")
    )
