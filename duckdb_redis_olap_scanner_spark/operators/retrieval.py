"""Keyword retrieval operators for training-data pipelines: BM25-style
ranked search and corpus vocabulary extraction.

Like the rest of ``operators/text.py``, everything here is JVM-side
``pyspark.sql.functions`` only — no Python workers in the hot path —
and every output value is engine-exact so the DuckDB oracle can check
it bit-for-bit:

* counts (tf, df, doc length) are integers;
* the score uses a RATIONAL idf variant, ``(N - df + 0.5)/(df + 0.5)``,
  instead of the classic ``ln`` form.  IEEE-754 ``+ - * /`` are
  exactly rounded and therefore bit-identical across engines, while
  ``ln`` is a libm call whose last ulp differs between runtimes — the
  rational variant keeps the same monotone saturation shape (it is
  ``exp`` of the classic idf) with fully deterministic arithmetic;
* per-term scores are combined by adding COLUMNS in a fixed order,
  never by a SUM() over rows, so float addition order is pinned.

Scale shape (100 TB): tokenisation and per-term tf counting are a
narrow map over the corpus (no explode of non-matching docs — the
term filters run inside the token array); the corpus statistics row
(N, total length, per-term df) is a single partial-aggregated scalar
broadcast back; top-k is TakeOrderedAndProject (per-partition heaps,
k rows to the driver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col
from .util import fan_out

# BM25 constants — fixed and shared with the SQL oracle.
BM25_K1 = 1.2
BM25_B = 0.75
QUERY_TERMS: tuple[str, ...] = ("spark", "window", "merge")


def _tf(term: str) -> Column:
    # Factory closure (not a lambda default arg — see the pitfall note
    # on operators/text.with_lang_guess): occurrences of `term` in the
    # token array, counted without exploding the array.
    return F.size(F.filter(F.col("toks"), lambda t: t == F.lit(term)))


def bm25_topk(
    docs: DataFrame, terms: tuple[str, ...] = QUERY_TERMS, k: int = 10
) -> DataFrame:
    """Top-``k`` documents by BM25-style score for a fixed multi-term
    query: (doc_id, dl, tf_<term>..., score), score descending with
    doc_id as the deterministic tie-break.

    Two-pass shape: (1) a narrow map computes per-doc length and
    per-query-term tf columns; (2) one scalar aggregate computes
    corpus stats (N, total_dl, df per term), broadcast back onto the
    per-doc rows; (3) the score is a pure column expression and the
    final top-k is TakeOrderedAndProject. The corpus is scanned twice
    but never shuffled — at scale pass 1's output can be cached or the
    stats maintained incrementally.
    """
    import re

    for t in terms:
        if not re.fullmatch(r"[a-z0-9_]+", t):
            raise ValueError(
                f"query term {t!r}: terms become tf_/df_ column names "
                "and oracle SQL literals — restrict to [a-z0-9_]+"
            )
    docs = fan_out(docs, key="doc_id")
    per_doc = docs.select("doc_id", tokens_col().alias("toks")).select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[_tf(t).alias(f"tf_{t}") for t in terms],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))

    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")

    def term_score(t: str) -> Column:
        tf = F.col(f"tf_{t}").cast("double")
        idf = (
            (F.col("n_docs") - F.col(f"df_{t}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"df_{t}").cast("double") + F.lit(0.5))
        denom = tf + F.lit(BM25_K1) * (
            (F.lit(1.0) - F.lit(BM25_B)) + (F.lit(BM25_B) * F.col("dl").cast("double")) / avgdl
        )
        return (idf * (tf * (F.lit(BM25_K1) + F.lit(1.0)))) / denom

    # Fixed-order column addition — never a row SUM — so float
    # accumulation order is identical to the oracle's.
    score = term_score(terms[0])
    for t in terms[1:]:
        score = score + term_score(t)

    return (
        scored.select(
            "doc_id",
            "dl",
            *[f"tf_{t}" for t in terms],
            score.alias("score"),
        )
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def vocabulary_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus vocabulary by document frequency: the top-``k`` tokens
    (tok, df_docs, coverage), df descending / token ascending.

    ``array_distinct`` runs INSIDE the row before the explode, so the
    shuffle carries one row per (doc, distinct token) — bounded by
    vocabulary growth, not corpus token count. The doc-count
    denominator is a broadcast scalar; top-k is
    TakeOrderedAndProject. This is the seed step of tokenizer-vocab
    induction over a crawl."""
    docs = fan_out(docs, key="doc_id")
    pairs = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col())).alias("tok")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return (
        pairs.groupBy("tok")
        .agg(F.count("*").alias("df_docs"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            "df_docs",
            (F.col("df_docs").cast("double") / F.col("n_docs")).alias(
                "coverage"
            ),
        )
        .orderBy(F.col("df_docs").desc(), F.col("tok").asc())
        .limit(k)
    )


OOV_VOCAB_SIZE = 30


def oov_stats(docs: DataFrame, vocab_size: int = OOV_VOCAB_SIZE) -> DataFrame:
    """Vocabulary application: per-document in-vocabulary/OOV token
    counts against the corpus's own top-``vocab_size`` document-
    frequency vocabulary — the coverage check run before committing to
    a tokenizer vocab. (doc_id, n_tok, n_invocab, oov_rate).

    The vocabulary is a bounded aggregate (``vocab_size`` rows)
    broadcast against the exploded token stream; the per-doc count
    agg map-side combines, so the only full-corpus exchange carries
    (doc_id) partial counts. At 100 TB the vocab side stays a
    broadcast no matter the corpus size."""
    docs = fan_out(docs, key="doc_id")
    vocab = vocabulary_topk(docs, k=vocab_size).select("tok")
    toks = docs.select(
        "doc_id", F.explode(tokens_col()).alias("tok")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "tok", "left"
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.coalesce("in_vocab", F.lit(0))).alias("n_invocab"),
    )
    return per_doc.select(
        "doc_id",
        "n_tok",
        "n_invocab",
        (
            (F.col("n_tok") - F.col("n_invocab")).cast("double")
            / F.col("n_tok")
        ).alias("oov_rate"),
    )
