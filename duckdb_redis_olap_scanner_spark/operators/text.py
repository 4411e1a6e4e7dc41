"""Text-analysis operators for training-data pipelines.

All DataFrame→DataFrame, built exclusively from JVM-side
``pyspark.sql.functions`` (no Python UDFs in the hot path): at 100 TB
these run inside whole-stage codegen with no Python-worker hop.

Determinism note: the polynomial char-fold hash below is bit-identical
in Spark and DuckDB (verified: ``fold('abc') == 96354`` on both), which
lets every operator here be oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import fan_out

HASH_P = 1_000_000_007

# Small per-language stopword marker sets for the n-gram-free heuristic
# language guesser (deterministic, SQL-expressible).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbols.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def poly_hash(col: Column) -> Column:
    """Deterministic polynomial rolling hash of a string column:
    ``fold(chars, 0, (acc, c) -> (acc*31 + codepoint(c)) % 1e9+7)``.
    Matches ``list_reduce``+``unicode`` in DuckDB bit-for-bit."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(HASH_P),
    )


def md5_hash64(col: Column) -> Column:
    """MD5-based 64-bit string hash reduced mod HASH_P — the fast hot-path
    hash (md5/substr/conv are all whole-stage-codegen'd, unlike the
    interpreted HOF char fold of :func:`poly_hash`, ~10× slower/row).

    Matches DuckDB's ``md5_number_lower(s) % HASH_P`` bit-for-bit:
    md5_number_lower is the little-endian u64 of the LAST 8 digest
    bytes, reproduced here by byte-swapping hex chars 17..32 before
    ``conv``; the u64 doesn't fit a BIGINT so it passes through
    DECIMAL(20,0) for the mod."""
    hx = F.md5(col)
    rev = F.concat(*[F.substring(hx, 31 - 2 * i, 2) for i in range(8)])
    return (F.conv(rev, 16, 10).cast("decimal(20,0)") % F.lit(HASH_P)).cast(
        "long"
    )


def sql_md5_hash64(expr: str) -> str:
    """The DuckDB-side twin of :func:`md5_hash64`."""
    return f"CAST(md5_number_lower({expr}) % {HASH_P} AS BIGINT)"


def sql_poly_hash(expr: str) -> str:
    """The DuckDB-side twin of :func:`poly_hash` (used by oracle SQL)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), "
        f"c -> CAST(unicode(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {HASH_P})"
    )


def tokens_col(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def canonical_text(text: Column | str = "text") -> Column:
    """Canonical form for dedup keys: lowercase, whitespace collapsed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def with_token_stats(docs: DataFrame) -> DataFrame:
    """doc_id + token/char/byte counts (whitespace and BPE-ish regex)."""
    docs = fan_out(docs, key="doc_id")
    return docs.select(
        "doc_id",
        F.size(tokens_col()).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN)).alias("bpeish_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.octet_length("text").alias("n_bytes"),
    )


def with_quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality scoring: stopword ratio, punctuation ratio,
    chars-per-token; all ratios are int/int divisions (engine-stable)."""
    docs = fan_out(docs, key="doc_id")
    toks = tokens_col()
    stop_cnt = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    punct_cnt = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), r"[.,;:!?]", "")
    )
    token_cnt = F.size(toks)
    return docs.select(
        "doc_id",
        token_cnt.alias("token_cnt"),
        stop_cnt.alias("stop_cnt"),
        punct_cnt.alias("punct_cnt"),
        (stop_cnt.cast("double") / token_cnt).alias("stop_ratio"),
        (F.length("text").cast("double") / token_cnt).alias("chars_per_token"),
        ((token_cnt >= 20) & (token_cnt <= 2000)).alias("len_ok"),
    )


def with_lang_guess(docs: DataFrame) -> DataFrame:
    """Marker-stopword language heuristic with a fixed priority tie-break
    (en > de > fr > es). On this synthetic corpus most docs guess 'en';
    determinism, not accuracy, is what the oracle checks."""
    docs = fan_out(docs, key="doc_id")
    toks = tokens_col()

    def marker_count(markers: tuple[str, ...]) -> Column:
        # NB: close over markers via a factory — a `m=markers` lambda default
        # would be read by Spark's HOF machinery as a second lambda variable.
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    guess = (
        F.when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"]),
            "en",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]), "de")
        .when(scores["fr"] >= scores["es"], "fr")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        scores["en"].alias("c_en"),
        scores["de"].alias("c_de"),
        scores["fr"].alias("c_fr"),
        scores["es"].alias("c_es"),
        guess.alias("lang_guess"),
        "lang",
        (guess == F.col("lang")).alias("label_match"),
    )


def with_fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprints over the canonical form: SHA-256 (crypto,
    collision-free dedup key) and the polynomial rolling hash (cheap)."""
    docs = fan_out(docs, key="doc_id")
    canon = canonical_text()
    return docs.select(
        "doc_id",
        F.sha2(canon, 256).alias("sha256_fp"),
        F.md5(canon).alias("md5_fp"),
        poly_hash(canon).alias("poly_fp"),
    )


# Character-trigram marker sets per language for the n-gram language-ID
# variant (deterministic, SQL-expressible; occurrence counts, not
# probabilities — determinism is what the oracle checks).
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", " th", "ing", "and", " of"),
    "de": ("der", "sch", "ein", "ich", "und"),
    "fr": ("les", " le", "ent", "que", " de"),
    "es": (" de", "los", "ció", " la", "ado"),
}


def with_lang_ngram(docs: DataFrame) -> DataFrame:
    """n-gram language-ID: score = number of character-trigram positions
    whose trigram is in the language's marker set; fixed priority
    tie-break (en > de > fr > es). The trigram array is projected in its
    own select before the per-element filters. The lambda-indexed
    ``substr`` here is the measured-FAST shape (strings are fine); only
    lambda-indexed OUTER-ARRAY access hits the inlined-recompute cliff
    — see operators/dedup._shingle_expr."""
    docs = fan_out(docs, key="doc_id")
    canon = canonical_text()
    c = docs.select("doc_id", "lang", canon.alias("canon"))
    n = F.length("canon")
    tris = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.col("canon").substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    t = c.select("doc_id", "lang", tris.alias("tris"))

    def score(markers: tuple[str, ...]) -> Column:
        return F.size(F.filter(F.col("tris"), lambda x: x.isin(*markers)))

    s = {lang: score(m) for lang, m in LANG_TRIGRAMS.items()}
    guess = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]),
            "en",
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )
    return t.select(
        "doc_id",
        s["en"].alias("t_en"),
        s["de"].alias("t_de"),
        s["fr"].alias("t_fr"),
        s["es"].alias("t_es"),
        guess.alias("lang_guess"),
        "lang",
        (guess == F.col("lang")).alias("label_match"),
    )


# Default per-language sampling rates (percent kept) for the stratified
# sampler: downsample the dominant language, keep the tail. Fixed and
# shared with the SQL oracle.
SAMPLE_RATES: dict[str, int] = {"en": 40, "de": 80, "fr": 80, "es": 80, "zh": 80}
SAMPLE_RATE_DEFAULT = 100
SAMPLE_SALT = "sample:"


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int] | None = None,
    default_rate: int = SAMPLE_RATE_DEFAULT,
) -> DataFrame:
    """Deterministic stratified sampling: keep a per-language fraction
    of documents, keyed on a SALTED content hash.

    Language-rebalancing is a standard curation step (downsample the
    dominant language, keep the tail). Hash-based rather than random:
    the same document is kept in every run, on every engine, and
    across re-ingests that renumber ids — and the salt decorrelates
    the sampling decision from the train/val/test split buckets (same
    hash family, different domain), so sampling does not skew splits.
    Narrow map + filter, scan-speed at any scale; no shuffle at all.

    Returns the kept rows (doc_id, lang, sample_bucket).
    """
    rates = SAMPLE_RATES if rates is None else rates
    bucket = (
        md5_hash64(F.concat(F.lit(SAMPLE_SALT), canonical_text())) % 100
    )
    rate = None
    for lang, r in sorted(rates.items()):
        cond = F.col("lang") == lang
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = rate.otherwise(default_rate) if rate is not None else F.lit(default_rate)
    return (
        fan_out(docs, key="doc_id")
        .select("doc_id", "lang", bucket.alias("sample_bucket"))
        .filter(F.col("sample_bucket") < rate)
    )


# Gopher-style repetition thresholds (Rae et al. 2021 use a family of
# duplicate-line / repeated-n-gram filters; these two are the
# SQL-expressible core). Fixed and shared with the SQL oracle.
MAX_DUP_TOKEN_FRAC = 0.8
MAX_TOP_BIGRAM_FRAC = 0.15


def with_repetition_stats(docs: DataFrame) -> DataFrame:
    """Repetition-based quality stats per document: token duplication
    fraction and the most-frequent-bigram fraction, plus the combined
    keep/drop flag (Gopher-style repeated-n-gram filter).

    (doc_id, n_tok, n_distinct, top_bigram_cnt, dup_token_frac,
    top_bigram_frac, rep_ok).

    Shape at scale: ``array_distinct`` runs inside the row (no
    shuffle); the bigram mode needs one shuffle keyed on
    (doc_id, bigram) — cardinality is bounded by corpus token count
    and the heavy agg is partial (map-side combine collapses each
    document's repeats before the exchange). All fractions are a
    single exact double division of integer counts, so the oracle
    matches bit-for-bit."""
    docs = fan_out(docs, key="doc_id")
    t = docs.select("doc_id", tokens_col().alias("toks"))
    n = F.size("toks")
    base = t.select(
        "doc_id",
        n.alias("n_tok"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        "toks",
    )
    # Adjacent-pair bigrams built inside the row: zip(toks[:-1], toks[1:]).
    bigrams = F.when(
        F.col("n_tok") >= 2,
        F.zip_with(
            F.slice("toks", 1, F.col("n_tok") - 1),
            F.slice("toks", 2, F.col("n_tok") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top = (
        base.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_cnt"))
    )
    joined = base.drop("toks").join(top, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        "n_distinct",
        F.coalesce("top_bigram_cnt", F.lit(0)).alias("top_bigram_cnt"),
    )
    dup_frac = (
        (F.col("n_tok") - F.col("n_distinct")).cast("double") / F.col("n_tok")
    )
    top_frac = F.when(
        F.col("n_tok") >= 2,
        F.col("top_bigram_cnt").cast("double") / (F.col("n_tok") - 1),
    )
    return joined.select(
        "doc_id",
        "n_tok",
        "n_distinct",
        "top_bigram_cnt",
        dup_frac.alias("dup_token_frac"),
        top_frac.alias("top_bigram_frac"),
        (
            (dup_frac <= F.lit(MAX_DUP_TOKEN_FRAC))
            & (
                (F.col("n_tok") < 2)
                | (top_frac <= F.lit(MAX_TOP_BIGRAM_FRAC))
            )
        ).alias("rep_ok"),
    )


# Context-window chunking constants — fixed and shared with the oracle.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents(
    docs: DataFrame, size: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Fixed-window token chunking with overlap — the sequence-prep
    step that turns variable-length documents into training/RAG
    context windows: (doc_id, chunk_idx, start_tok, chunk_len,
    chunk_hash).

    One row fans out to ceil(n_tok/stride) chunk rows INSIDE the
    stage (generator explode, no shuffle, nothing on the driver); the
    chunk text itself is reduced to the codegen'd 64-bit md5 content
    hash so the output stays narrow — downstream exact-dedup of
    chunks joins on that hash directly."""
    if stride < 1 or size < stride:
        raise ValueError(
            f"chunking needs 1 <= stride <= size (got size={size}, "
            f"stride={stride}): stride 0 never advances and stride > "
            "size would skip tokens between windows"
        )
    t = fan_out(docs, key="doc_id").select(
        "doc_id", tokens_col().alias("toks")
    )
    n = F.size("toks")
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    ch = t.select(
        "doc_id",
        n.alias("n_tok"),
        "toks",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    chunk_text = F.array_join(
        F.slice("toks", F.col("start_tok") + 1, F.lit(size)), " "
    )
    return ch.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        F.least(F.lit(size), F.col("n_tok") - F.col("start_tok")).alias(
            "chunk_len"
        ),
        md5_hash64(chunk_text).alias("chunk_hash"),
    )


# PII scrubbing patterns — deliberately restricted to syntax shared
# verbatim by Java regex (Spark) and RE2 (DuckDB) so the scrubbed
# output is engine-identical: char classes, +/{m,}, \d, \b.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails and phone numbers: (doc_id, n_emails, n_phones,
    clean_md5, len_delta). The scrubbed text itself is reduced to its
    md5 so the output stays narrow; ``len_delta`` (chars removed net
    of the placeholder) makes truncation bugs visible.

    Pure narrow map — two codegen'd regexp passes, no shuffle, no
    Python. At 100 TB this is scan-speed; the patterns are the
    deliberately-simple shared-dialect core, swap in stricter ones
    per deployment."""
    docs = fan_out(docs, key="doc_id")
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed).alias("clean_md5"),
        (F.length(t) - F.length(scrubbed)).alias("len_delta"),
    )


def with_char_diversity(docs: DataFrame) -> DataFrame:
    """Character-diversity quality signal per document: the Simpson
    concentration index sum(n_c^2)/n^2 over character frequencies of
    the canonical text — an entropy proxy computed WITHOUT log (libm
    would break engine-exactness): near 1/alphabet for diverse text,
    near 1.0 for degenerate repeated-character content.

    (doc_id, n_chars_canon, distinct_chars, simpson_x1e9, diverse_ok).
    The index is emitted as floor(x * 1e9) so the comparison key is an
    integer; the raw double division would also be exact but the
    integer form survives any downstream engine's float formatting.

    Shape: explode canonical chars -> count per (doc, char) -> sum of
    squares per doc; both aggs map-side combine and key on
    (doc_id[, char]) — scan-proportional, no skew."""
    docs = fan_out(docs, key="doc_id")
    ch = docs.select(
        "doc_id", F.explode(F.split(canonical_text(), "")).alias("c")
    )
    per_char = ch.groupBy("doc_id", "c").agg(F.count("*").alias("n"))
    agg = per_char.groupBy("doc_id").agg(
        F.sum("n").alias("n_chars_canon"),
        F.count("*").alias("distinct_chars"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
    )
    simpson = F.floor(
        (F.col("sum_sq").cast("double") * F.lit(1e9))
        / (F.col("n_chars_canon") * F.col("n_chars_canon")).cast("double")
    ).cast("long")
    return agg.select(
        "doc_id",
        "n_chars_canon",
        F.col("distinct_chars").cast("int").alias("distinct_chars"),
        simpson.alias("simpson_x1e9"),
        (simpson < F.lit(200_000_000)).alias("diverse_ok"),
    )


# Extended PII classes — same shared Java/RE2 dialect discipline.
# SSN: the fixed 3-2-4 dashed form.
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
# IPv4 with octet-range validation IN the pattern (0-255), so no
# post-filtering is needed; non-capturing groups are shared syntax.
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
PII_IP_RE = rf"\b{_OCTET}(?:\.{_OCTET}){{3}}\b"
# Credit-card CANDIDATE: 4x4 digit groups, optionally dash/space
# separated (no backreference tying the separators together — \1 is
# not RE2 syntax, and the Luhn gate rejects junk anyway). Candidates
# are then validated with the Luhn checksum — only Luhn-valid numbers
# are redacted (the validating-redactor pattern:
# "4539-1488-0343-6468" with a wrong check digit is left alone but
# still counted as a candidate).
PII_CC_RE = r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b"


def luhn_valid(cand: Column) -> Column:
    """Luhn checksum over a 16-digit candidate (separators stripped):
    doubling every second digit from the right (= odd 1-based
    positions for 16 digits), subtracting 9 from two-digit doubles;
    valid iff the sum is divisible by 10. Pure integer higher-order
    expressions — codegen'd, engine-exact, and expressible as the
    same fold in DuckDB (``list_sum`` over ``list_transform``)."""
    digits = F.regexp_replace(cand, r"[^0-9]", "")

    def term(i: Column) -> Column:
        d = digits.substr(i, F.lit(1)).cast("int")
        dd = d * 2
        return F.when(
            i % 2 == 1, F.when(dd > 9, dd - 9).otherwise(dd)
        ).otherwise(d)

    total = F.aggregate(
        F.sequence(F.lit(1), F.length(digits)),
        F.lit(0),
        lambda acc, i: acc + term(i),
    )
    return total % 10 == 0


def scrub_pii_full(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction across the standard classes: emails, phone
    numbers, SSNs, range-validated IPv4 addresses, and credit-card
    numbers gated on the Luhn checksum. Output per doc:
    (doc_id, n_emails, n_phones, n_ssn, n_ip, n_cc_candidates,
    n_cc_valid, clean_md5, len_delta) — counts per class on the
    ORIGINAL text, the scrubbed text reduced to its md5, and the net
    length delta.

    Redaction order is fixed (email → phone → SSN → IP → valid CCs)
    and CC replacement folds over the candidates in extraction order,
    so the scrubbed bytes are engine-identical. Everything is a pure
    narrow map of codegen'd regexp/HOF expressions — no shuffle, no
    Python; at 100 TB this runs at scan speed like
    :func:`scrub_pii`."""
    docs = fan_out(docs, key="doc_id")
    t = F.col(text_col)
    cands = F.regexp_extract_all(t, F.lit(PII_CC_RE), F.lit(0))
    valid = F.filter(cands, luhn_valid)
    base = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
                PII_PHONE_RE,
                "<PHONE>",
            ),
            PII_SSN_RE,
            "<SSN>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    scrubbed = F.aggregate(
        valid, base, lambda acc, c: F.replace(acc, c, F.lit("<CC>"))
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.regexp_count(t, F.lit(PII_SSN_RE)).alias("n_ssn"),
        F.regexp_count(t, F.lit(PII_IP_RE)).alias("n_ip"),
        F.size(cands).alias("n_cc_candidates"),
        F.size(valid).alias("n_cc_valid"),
        F.md5(scrubbed).alias("clean_md5"),
        (F.length(t) - F.length(scrubbed)).alias("len_delta"),
    )


# Fixed classifier weights (plan literals; shared with the SQL oracle).
# Calibrated on the synthetic corpus to a ~43% keep rate so both branches
# of the decision are exercised at every scale factor.
CLS_STOP_W = 3
CLS_UNIQ_W = 2
CLS_CPT_CENTER = 5500
CLS_CPT_W_DIV = 2
CLS_BIAS = -1100


def quality_classifier(docs: DataFrame) -> DataFrame:
    """Model-based quality filtering (the fastText/DSIR-classifier shape)
    as pure codegen inference: a fixed-weight linear scorer over exact
    integer text features, emitting the margin and a keep decision.

    Features (all integer-exact, truncating division of positive ints so
    Spark ``floor(a/b)`` == SQL ``a // b`` bit-for-bit):

    * ``stop_milli`` — stopword hits per 1000 tokens (fluency proxy),
    * ``uniq_milli`` — distinct tokens per 1000 tokens (repetition proxy),
    * ``cpt_milli``  — chars per token x1000 (gibberish/length proxy,
      penalized by distance from the corpus-typical 5.5 chars/token).

    ``margin = 3*stop_milli + 2*uniq_milli - |cpt_milli - 5500|//2 - 1100``;
    ``keep = margin > 0``. The weights are plan literals, so inference is
    one narrow whole-stage-codegen map — no shuffle, no Python, no model
    file; at 100 TB this is a free rider on any scan that already reads
    ``text``. Swapping in real trained weights (or a per-class weight
    table joined in broadcast) preserves the shape.
    """
    return margin_features(docs).drop("n_toks")


def margin_features(docs: DataFrame) -> DataFrame:
    """One-pass classifier feature/margin computation shared by
    :func:`quality_classifier` and the curriculum-sharding plan (which
    also needs ``n_toks`` — carrying it here avoids a second documents
    scan plus a doc_id join in that DAG)."""
    docs = fan_out(docs, key="doc_id")
    toks = tokens_col()
    t = F.size(toks)
    s = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    d = F.size(F.array_distinct(toks))
    c = F.length("text")
    stop_milli = F.floor((s * 1000) / t).cast("long")
    uniq_milli = F.floor((d * 1000) / t).cast("long")
    cpt_milli = F.floor((c * 1000) / t).cast("long")
    margin = (
        F.lit(CLS_STOP_W) * stop_milli
        + F.lit(CLS_UNIQ_W) * uniq_milli
        - F.floor(F.abs(cpt_milli - CLS_CPT_CENTER) / CLS_CPT_W_DIV).cast(
            "long"
        )
        + F.lit(CLS_BIAS)
    )
    return docs.select(
        "doc_id",
        stop_milli.alias("stop_milli"),
        uniq_milli.alias("uniq_milli"),
        cpt_milli.alias("cpt_milli"),
        margin.alias("margin"),
        (margin > 0).alias("keep"),
        t.cast("long").alias("n_toks"),
    )


def bigram_familiarity(docs: DataFrame) -> DataFrame:
    """Corpus-level bigram language-model familiarity (the KenLM
    perplexity-filter shape with exact integer math): score each document
    by how common its word bigrams are in the corpus itself.

    Two passes over the exploded bigram stream — WITH multiplicity, since
    a doc repeating a common bigram should score it repeatedly:

    1. corpus model: ``count(*)`` per bigram hash (map-side combined),
    2. per-doc score: join each occurrence back to its corpus count and
       sum — ``familiarity = sum(count)``, ``avg_milli =
       1000*familiarity // n_bigrams`` (truncating, engine-exact).

    Docs with <2 tokens have no bigrams and score 0. Both shuffles key on
    the FULL 128-bit md5 bigram hash — at corpus scale the distinct
    bigram count passes ~2^30, where the reduced md5_hash64 space would
    merge distinct bigrams' counts and inflate familiarity — carried as
    ``unhex(md5)``, 16 raw bytes, half the hex string's shuffle width —
    so the
    100 TB cost is linear with no skew beyond true bigram frequency (hot
    bigrams are hot AGG keys — absorbed map-side — and their join
    fan-out equals their true occurrence count, same as
    :func:`~..operators.dedup.segment_dedup`).
    """
    docs = fan_out(docs, key="doc_id")
    # zip_with over two shifted slices of a materialized token column —
    # NOT transform(sequence, i -> get(toks, i)): lambda-indexed access
    # to an outer array knocks the stage off the fast path (measured
    # 99 s -> 3 s for this explode on the 10x sf0.1 corpus, 33x,
    # identical output; see dedup._shingle_expr).
    tokd = docs.select("doc_id", tokens_col().alias("tk"))
    n = F.size("tk")
    m = F.greatest(n - 1, F.lit(0))
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("tk", 1, m), F.slice("tk", 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = tokd.select("doc_id", bigrams.alias("bg"))
    occ = base.select(
        "doc_id", F.explode("bg").alias("bigram")
    ).withColumn("h", F.unhex(F.md5(F.col("bigram"))))
    model = occ.groupBy("h").agg(F.count("*").alias("cnt"))
    per_doc = (
        occ.join(model, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("cnt").alias("familiarity"),
        )
    )
    out = docs.select("doc_id").join(per_doc, "doc_id", "left")
    n_bg = F.coalesce("n_bigrams", F.lit(0).cast("long"))
    fam = F.coalesce("familiarity", F.lit(0).cast("long"))
    return out.select(
        "doc_id",
        n_bg.alias("n_bigrams"),
        fam.alias("familiarity"),
        F.when(n_bg > 0, F.floor((fam * 1000) / n_bg).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("avg_milli"),
    )
