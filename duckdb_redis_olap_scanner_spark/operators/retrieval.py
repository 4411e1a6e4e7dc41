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
from .util import fan_out, let_bind

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


# ---------------------------------------------------------------------------
# Wordpiece tokenizer application: greedy longest-match encode to ids
# ---------------------------------------------------------------------------

WP_HASH_MOD = 1_000_000_007
WP_HASH_BASE = 131
WP_UNK_ID = 0


def wordpiece_vocab(docs: DataFrame, vocab_size: int = OOV_VOCAB_SIZE):
    """Induce the deterministic wordpiece vocabulary from the corpus:

    * id 0 — ``[UNK]``;
    * ids 1..W — the top-``vocab_size`` whole-word tokens by document
      frequency (df desc, token asc — the :func:`vocabulary_topk`
      order), usable only word-initially;
    * for the ``i``-th (1-based, sorted ascending) distinct character
      drawn from those words: id ``W + 2i - 1`` — the word-initial
      single-char piece, and id ``W + 2i`` — its ``##`` continuation
      piece.

    Returns (words, chars): the ordered word list and sorted char
    list. Both are bounded (≤ vocab_size words, ≤ alphabet chars), so
    collecting them to the driver and embedding them as plan literals
    is the broadcast-a-tiny-dim pattern, not a driver loop — the same
    sanctioned shape as the IVF centroid table
    (similarity.ivf_ranked).

    The empty token (what a blank document tokenizes to — Java and
    DuckDB both split '' to ['']) is excluded: an empty-string piece
    would vacuously prefix every word."""
    rows = (
        vocabulary_topk(docs, k=vocab_size + 1)
        .filter(F.col("tok") != "")
        .orderBy(F.col("df_docs").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok")
        .collect()
    )
    words = [r.tok for r in rows]
    chars = sorted({c for w in words for c in w})
    return words, chars


def wordpiece_encode_stats(
    docs: DataFrame, vocab_size: int = OOV_VOCAB_SIZE
) -> DataFrame:
    """Greedy longest-match wordpiece encode of every document against
    the induced vocabulary (:func:`wordpiece_vocab`) — the step every
    training pipeline runs after vocab induction, emitting actual
    token ids. Output per doc: (doc_id, n_ids, n_unk, ids_hash) where
    ``ids_hash`` is the order-pinning polynomial fold
    ``h -> (h*131 + id + 1) % 1e9+7`` over the id sequence in document
    order, so the oracle checks the exact ids AND their order without
    shipping the sequences.

    Algorithm (standard wordpiece, no backtracking): per word, the
    longest vocabulary piece matching at the current position is
    emitted; with this vocabulary class the word-initial match ranges
    over whole words and single chars (word id preferred on equal
    length) and every subsequent position matches single-char ``##``
    continuations; a word containing any character outside the
    vocabulary alphabet encodes as ``[UNK]`` (id 0), whole-word.
    Empty tokens (from blank docs) contribute no ids.

    Scale shape: the vocabulary is a plan literal (bounded by
    ``vocab_size``), so the encode is a pure NARROW map of codegen'd
    higher-order functions — filter/aggregate/transform/flatten over
    the token array, zero shuffles, zero Python workers; the per-doc
    stats row is computed inside the same stage as the scan."""
    docs = fan_out(docs, key="doc_id")
    words, chars = wordpiece_vocab(docs, vocab_size)
    W = len(words)

    if words:
        words_lit = F.array(
            *[
                F.struct(
                    F.lit(w).alias("p"), F.lit(i + 1).alias("id")
                )
                for i, w in enumerate(words)
            ]
        )
    else:
        words_lit = F.expr("CAST(array() AS array<struct<p:string,id:int>>)")
    if chars:
        chars_lit = F.array(*[F.lit(c) for c in chars])
    else:
        chars_lit = F.expr("CAST(array() AS array<string>)")

    def char_id(ch: Column, cont: bool) -> Column:
        pos = F.array_position(chars_lit, ch)  # 0 when absent
        base = W + 2 * pos - (0 if cont else 1)
        return F.when(pos > 0, base.cast("int"))

    # Evaluate-once bindings (operators/util.let_bind): the vocab-scan
    # aggregate re-ran per continuation CHARACTER, and the whole
    # encode re-ran per output stat, before these — 28 s -> 3.7 s on
    # the 10x corpus, identical hashes.
    _let = let_bind

    def word_ids(w: Column) -> Column:
        matches = F.filter(words_lit, lambda s: w.startswith(s["p"]))
        zero = F.struct(F.lit(0).alias("l"), F.lit(0).alias("id"))
        best = F.aggregate(
            matches,
            zero,
            lambda acc, s: F.when(
                F.length(s["p"]) > acc["l"],
                F.struct(
                    F.length(s["p"]).alias("l"), s["id"].alias("id")
                ),
            ).otherwise(acc),
        )

        def with_best(s: Column) -> Column:
            w2, l, wid = s["w"], s["l"], s["id"]
            first_id = F.when(l > 0, wid).otherwise(
                char_id(w2.substr(F.lit(1), F.lit(1)), cont=False)
            )
            skip = F.when(l > 0, l).otherwise(F.lit(1))
            rest_len = F.length(w2) - skip
            cont_ids = F.when(
                rest_len > 0,
                F.transform(
                    F.sequence(F.lit(1), rest_len),
                    lambda i: char_id(
                        w2.substr(skip + i, F.lit(1)), cont=True
                    ),
                ),
            ).otherwise(F.expr("CAST(array() AS array<int>)"))

            def with_ids(t: Column) -> Column:
                ok = t["f"].isNotNull() & ~F.exists(
                    t["c"], lambda x: x.isNull()
                )
                return F.when(
                    ok, F.concat(F.array(t["f"]), t["c"])
                ).otherwise(F.array(F.lit(WP_UNK_ID)))

            return _let({"f": first_id, "c": cont_ids}, with_ids)

        return F.when(
            w == "", F.expr("CAST(array() AS array<int>)")
        ).otherwise(
            _let(
                {"w": w, "l": best["l"], "id": best["id"]}, with_best
            )
        )

    toks = F.coalesce(
        tokens_col(), F.expr("CAST(array() AS array<string>)")
    )
    ids = F.flatten(F.transform(toks, word_ids))

    def stats(t: Column) -> Column:
        return F.struct(
            F.size(t["i"]).alias("n_ids"),
            F.size(
                F.filter(t["i"], lambda x: x == WP_UNK_ID)
            ).alias("n_unk"),
            F.aggregate(
                t["i"],
                F.lit(0).cast("long"),
                lambda h, x: (h * WP_HASH_BASE + x + 1) % WP_HASH_MOD,
            ).alias("ids_hash"),
        )

    # Bind the tokenized array ONCE: three bare references to `ids`
    # would inline (and re-run) the whole encode three times; the
    # intermediate projection keeps `st` a materialized attribute.
    base = docs.select("doc_id", _let({"i": ids}, stats).alias("st"))
    return base.select(
        "doc_id", "st.n_ids", "st.n_unk", "st.ids_hash"
    )


BPE_N_MERGES = 8

# Auto batch_k threshold: vocabularies up to this size train with the
# exact sequential argmax (one Spark job per merge — cheap and
# oracle-reproducible); past it, rounds batch disjoint merges so job
# count grows ~sub-linearly in n_merges (a 30k-merge production vocab
# runs ~470 jobs instead of 30k).
BPE_SEQUENTIAL_MAX = 64


def _auto_batch_k(n_merges: int) -> int:
    if n_merges <= BPE_SEQUENTIAL_MAX:
        return 1
    return min(BPE_SEQUENTIAL_MAX, -(-n_merges // BPE_SEQUENTIAL_MAX))


def bpe_train_merges(
    docs: DataFrame, n_merges: int = BPE_N_MERGES, batch_k: int | None = None
) -> DataFrame:
    """BPE tokenizer TRAINING on-engine: induce the first ``n_merges``
    byte-pair merges from the corpus word-frequency table (Sennrich et
    al.'s algorithm, characters as initial symbols, no end-of-word
    marker — documented simplification).

    Symbol sequences are encoded as ``||``-separated strings bracketed
    by ``||`` (``cat`` → ``||c||a||t||``), so applying merge (a, b) is
    ONE literal ``replace`` of ``|a||b|`` with ``|ab|`` — the
    single-pipe pattern leaves each neighbor's boundary intact, which
    makes plain left-to-right non-overlapping replace EXACTLY the
    greedy BPE application, including back-to-back repeats
    (``||a||a||a||`` → ``||aa||a||``). Training words are restricted
    to ``[a-z0-9]+`` so the separator cannot collide with content.

    Per round: explode adjacent symbol pairs weighted by word
    frequency, one map-side-combined count agg, argmax with a total
    tie-break (count DESC, pair ASC), then one narrow replace over the
    word table. The argmax rows — a bounded handful per round — are
    collected on the driver (the sanctioned bounded-fixpoint pattern,
    same as connected components in operators/dedup.py); the
    word-frequency table itself never leaves the executors. Each
    round's table is eagerly ``localCheckpoint``-ed, which both
    materializes it before the predecessor becomes unreachable AND
    truncates the logical plan — without the truncation the plan tree
    grows linearly in rounds and plan ANALYSIS (not data) OOMs the
    driver past ~25 rounds (measured; a lazily-``persist``-ed chain
    caches data but keeps the full nested plan). A multi-executor run
    would point this at a reliable checkpoint dir instead.

    ``batch_k`` is the scale knob for large vocabularies: with
    ``batch_k=1`` (the exact oracle-pinned path) each round emits
    exactly the sequential argmax merge. With ``batch_k=K`` each
    round selects up to K SYMBOL-DISJOINT pairs from the round's count
    table (greedy in the same total order) and applies them in one
    narrow pass — disjointness means no selected merge can change
    another selected pair's occurrences, so all K are valid merges at
    the counts the round observed. A 30k-merge production vocabulary
    then costs ~30k/K Spark jobs instead of 30k; the deviation from
    strict sequential argmax (a freshly-merged symbol's new pairs
    can't win until the NEXT round) is the standard batched-BPE
    trade-off. The default (``batch_k=None``) resolves adaptively:
    sequential up to ``BPE_SEQUENTIAL_MAX`` merges (so the small-vocab
    catalog entry stays byte-identical to its SQL oracle), batched
    beyond — production-size defaults without opting in.

    100 TB shape: the word-frequency table is bounded by the
    VOCABULARY, not the corpus (the initial groupBy(token) collapses
    volume), so every iteration is a small agg — exactly how
    production BPE trainers operate on frequency tables.

    Returns (merge_rank, lhs, rhs, merged, pair_freq) — ``n_merges``
    rows (fewer if the pair stream runs dry).
    """
    if batch_k is None:
        batch_k = _auto_batch_k(n_merges)
        if batch_k > 1:
            # Loud semantic switch (round-9 ADVICE): the adaptive
            # default moves past the exact sequential argmax here, so
            # callers who relied on the old batch_k=1 default notice.
            import warnings

            warnings.warn(
                f"bpe_train_merges: n_merges={n_merges} > "
                f"{BPE_SEQUENTIAL_MAX} and no explicit batch_k — using "
                f"batched symbol-disjoint merges (batch_k={batch_k}), "
                "which can deviate from strict sequential argmax; pass "
                "batch_k=1 for the exact (slower) path",
                stacklevel=2,
            )
    if batch_k < 1:
        raise ValueError(f"batch_k must be >= 1, got {batch_k}")
    spark = docs.sparkSession
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "tok"
        )
    ).where(F.col("tok").rlike("^[a-z0-9]+$"))
    base = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    chars = F.filter(F.split(F.col("tok"), ""), lambda c: c != "")
    words = base.select(
        F.concat(
            F.lit("||"), F.array_join(chars, "||"), F.lit("||")
        ).alias("s"),
        "freq",
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        want = min(batch_k, n_merges - len(merges))
        arr = F.filter(F.split(F.col("s"), r"\|\|"), lambda x: x != "")
        # zip_with over shifted slices, not transform+get: lambda-
        # indexed outer-array access is the slow path (dedup.
        # _shingle_expr has the measurements).
        m = F.greatest(F.size(arr) - 1, F.lit(0))
        pairs = F.when(
            F.size(arr) >= 2,
            F.zip_with(
                F.slice(arr, 1, m), F.slice(arr, 2, m),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        # Over-fetch 4× so the greedy disjoint filter usually finds
        # `want` independent pairs in one round; still a bounded
        # driver collect (≤ 4*batch_k rows).
        top = (
            words.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(max(1, 4 * want))
            .collect()
        )
        if not top:
            break
        used: set[str] = set()
        selected: list[tuple[str, str, str, int]] = []
        for row in top:
            if len(selected) == want:
                break
            a, b = row["pair"].split(" ", 1)
            merged = a + b
            # Symbol-disjointness (incl. the produced symbol) keeps
            # every selected merge's count valid after the others.
            if {a, b, merged} & used:
                continue
            used.update((a, b, merged))
            selected.append((a, b, merged, int(row["cnt"])))
        if not selected:
            break
        col = F.col("s")
        for a, b, merged, cnt in selected:
            merges.append((len(merges) + 1, a, b, merged, cnt))
            col = F.replace(
                col, F.lit(f"|{a}||{b}|"), F.lit(f"|{merged}|")
            )
        # Eager localCheckpoint: materializes the new table off the
        # old one (which is still checkpointed — no recompute) and
        # cuts the plan back to a flat scan. The superseded
        # checkpoint's blocks are released EXPLICITLY — in a 30k-merge
        # run, waiting for driver GC + the context cleaner lets dead
        # blocks pile up on executors between collections.
        prev = words
        words = prev.select(col.alias("s"), "freq").localCheckpoint(
            eager=True
        )
        prev.unpersist()
    words.unpersist()  # the final table is not part of the result
    return spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string, "
        "pair_freq long",
    )


def bpe_encode_stats(docs: DataFrame, n_merges: int = BPE_N_MERGES) -> DataFrame:
    """Apply the corpus-trained BPE merges (:func:`bpe_train_merges`)
    back to every document — the train→encode loop of a real
    tokenizer. The collected merge table (≤ ``n_merges`` rows, the
    bounded fixpoint output) parameterizes ``n_merges`` literal
    boundary-preserving replaces over each word's symbol string, in
    training order; emits per-doc encodeable-word count, total BPE
    token count, and the md5 of the position-ordered token stream
    (pinning every segmentation decision).

    One shuffle (the per-doc re-aggregation on doc_id) beyond the
    training rounds; the applies themselves are narrow codegen'd
    string ops.
    """
    trained = bpe_train_merges(docs, n_merges).collect()
    merges = [(r["lhs"], r["rhs"], r["merged"]) for r in trained]

    words = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("wp", "tok"),
    ).where(F.col("tok").rlike("^[a-z0-9]+$"))
    chars = F.filter(F.split(F.col("tok"), ""), lambda c: c != "")
    s = F.concat(F.lit("||"), F.array_join(chars, "||"), F.lit("||"))
    for a, b, m in merges:
        s = F.replace(s, F.lit(f"|{a}||{b}|"), F.lit(f"|{m}|"))
    syms = F.filter(F.split(s, r"\|\|"), lambda x: x != "")
    per_word = words.select(
        "doc_id",
        "wp",
        F.size(syms).alias("n_sym"),
        F.array_join(syms, " ").alias("stream"),
    )
    per_doc = per_word.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("n_sym").alias("n_bpe_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("wp", "stream"))
                    ),
                    lambda x: x["stream"],
                ),
                " ",
            )
        ).alias("tokens_md5"),
    )
    out = docs.select("doc_id").join(per_doc, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0).cast("long")).alias(
            "n_bpe_tokens"
        ),
        F.coalesce("tokens_md5", F.md5(F.lit(""))).alias("tokens_md5"),
    )
