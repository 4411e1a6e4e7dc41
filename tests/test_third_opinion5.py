"""Third-opinion audit, batch 6 (r16): curation-pipeline specs.

Independent python re-derivations of the content-hash-keyed curation
entries — the reproducibility machinery (splits, sampling, budgets)
and the corpus-statistics filters. These share MORE hand-written
logic between the Spark side and the DuckDB oracle than any other
family (the same hash, the same bucket arithmetic, the same shingle
construction appear on both sides), so an independent hashlib + loop
implementation is the only check that isn't self-referential:

* pipeline_train_val_split — 80/10/10 on md5-64(canon) % 100.
* pipeline_stratified_sample — salted-hash per-language keep rates.
* pipeline_token_budget   — per-source quota fill in salted-hash
                            order (running sum, kept = cum <= budget).
* pipeline_decontaminate  — train docs sharing any 3-gram-hash with
                            the val split (distinct shared hashes).
* pipeline_decontaminate_containment — per-val-doc containment ratio
                            against the train shingle vocabulary.
* pipeline_bigram_lm      — corpus bigram counts WITH multiplicity,
                            familiarity sums, per-mille average.
* text_duplicate_ngrams   — cross-document 8-gram duplication.
* text_char_diversity     — Simpson concentration over canonical
                            chars (the split('','')=[''] fence-post).
* pipeline_source_mix     — token shares + capped keep rates.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.operators.dedup import (
    DUP_NGRAM_N,
    MAX_CROSS_DOC_DUP_FRAC,
)
from duckdb_redis_olap_scanner_spark.operators.text import (
    SAMPLE_RATE_DEFAULT,
    SAMPLE_RATES,
    SAMPLE_SALT,
)
from duckdb_redis_olap_scanner_spark.plans import catalog
from duckdb_redis_olap_scanner_spark.plans.pipeline_ops5 import TOKEN_BUDGET

from .conftest import SF_DIR
from .third_opinion_refs import _canon, _md5_64, _tokens


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(
        f"{SF_DIR}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )


def _split_bucket(text: str) -> int:
    return _md5_64(_canon(text)) % 100


def _ngrams(text: str, n: int) -> set[str]:
    toks = _tokens(text)
    return {" ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)}


def test_train_val_split_matches_hashlib(spark, reg, docs_pd):
    got = {
        r.split: (int(r.n_docs), int(r.first_doc))
        for r in reg["pipeline_train_val_split"].fn(spark, SF_DIR).collect()
    }
    agg: dict = {}
    for r in docs_pd.itertuples(index=False):
        b = _split_bucket(r.text)
        s = "train" if b < 80 else ("val" if b < 90 else "test")
        n, first = agg.get(s, (0, int(r.doc_id)))
        agg[s] = (n + 1, min(first, int(r.doc_id)))
    assert got == agg and set(got) == {"train", "val", "test"}


def test_stratified_sample_matches_hashlib(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (r.lang, int(r.sample_bucket))
        for r in reg["pipeline_stratified_sample"].fn(spark, SF_DIR)
        .collect()
    }
    ref = {}
    for r in docs_pd.itertuples(index=False):
        b = _md5_64(SAMPLE_SALT + _canon(r.text)) % 100
        if b < SAMPLE_RATES.get(r.lang, SAMPLE_RATE_DEFAULT):
            ref[int(r.doc_id)] = (r.lang, b)
    assert got == ref and 0 < len(got) < len(docs_pd)


def test_token_budget_matches_python_quota_fill(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (r.source, int(r.n_toks), int(r.cum_toks),
                        bool(r.kept))
        for r in reg["pipeline_token_budget"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    per_source: dict = defaultdict(list)
    for r in docs_pd.itertuples(index=False):
        ok = (_md5_64("budget|" + r.text) if r.text is not None else -1)
        n = len(_tokens(r.text)) if r.text is not None else 0
        per_source[r.source].append((ok, int(r.doc_id), n))
    for source, rows in per_source.items():
        cum = 0
        for _, doc_id, n in sorted(rows):
            cum += n
            ref[doc_id] = (source, n, cum, cum <= TOKEN_BUDGET)
    assert got == ref and len(got) == len(docs_pd)
    # both branches exercised, per the constant's sizing comment
    assert any(v[3] for v in got.values())
    assert any(not v[3] for v in got.values())


def test_decontaminate_matches_python_sets(spark, reg, docs_pd):
    got = {
        int(r.doc_id): int(r.shared_shingles)
        for r in reg["pipeline_decontaminate"].fn(spark, SF_DIR).collect()
    }
    val_hashes: set = set()
    train: dict = {}
    for r in docs_pd.itertuples(index=False):
        hs = {_md5_64(s) for s in _ngrams(r.text, 3)}
        b = _split_bucket(r.text)
        if b < 80:
            train[int(r.doc_id)] = hs
        elif b < 90:
            val_hashes |= hs
    ref = {}
    for doc_id, hs in train.items():
        shared = len(hs & val_hashes)
        if shared > 0:
            ref[doc_id] = shared
    assert got == ref and len(got) > 0


def test_decontaminate_containment_matches_python(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (int(r.n_shingles), int(r.hit_shingles),
                        float(r.containment), bool(r.contaminated))
        for r in reg["pipeline_decontaminate_containment"].fn(spark, SF_DIR)
        .collect()
    }
    train_hashes: set = set()
    val: dict = {}
    for r in docs_pd.itertuples(index=False):
        # per-doc DISTINCT shingles, then hashed (a hash collision
        # between two distinct shingles stays two rows — mirror that
        # by keeping a LIST of hashes of the distinct-shingle set)
        hs = [_md5_64(s) for s in _ngrams(r.text, 3)]
        b = _split_bucket(r.text)
        if b < 80:
            train_hashes.update(hs)
        elif b < 90 and hs:
            val[int(r.doc_id)] = hs
    ref = {}
    for doc_id, hs in val.items():
        hit = sum(1 for h in hs if h in train_hashes)
        cont = hit / len(hs)
        ref[doc_id] = (len(hs), hit, cont, cont >= 0.7)
    assert got == ref and len(got) > 0


def test_bigram_lm_matches_python_counts(spark, reg, docs_pd):
    """Bigram familiarity WITH multiplicity: corpus-wide occurrence
    counts summed over each doc's bigram OCCURRENCES (not distinct),
    exact per-mille average."""
    got = {
        int(r.doc_id): (int(r.n_bigrams), int(r.familiarity),
                        int(r.avg_milli))
        for r in reg["pipeline_bigram_lm"].fn(spark, SF_DIR).collect()
    }
    per_doc: dict = {}
    corpus: Counter = Counter()
    for r in docs_pd.itertuples(index=False):
        toks = _tokens(r.text)
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        per_doc[int(r.doc_id)] = bgs
        corpus.update(bgs)
    ref = {}
    for doc_id, bgs in per_doc.items():
        fam = sum(corpus[b] for b in bgs)
        n = len(bgs)
        ref[doc_id] = (n, fam, 1000 * fam // n if n > 0 else 0)
    assert got == ref and len(got) == len(docs_pd)


def test_duplicate_ngrams_match_python_df(spark, reg, docs_pd):
    """Cross-document 8-gram duplication: per doc, the fraction of its
    DISTINCT 8-grams whose document frequency is >= 2."""
    got = {
        int(r.doc_id): (int(r.n_grams), int(r.n_dup_grams),
                        None if r.dup_frac is None else float(r.dup_frac),
                        bool(r.dup_ok))
        for r in reg["text_duplicate_ngrams"].fn(spark, SF_DIR).collect()
    }
    grams = {
        int(r.doc_id): _ngrams(r.text, DUP_NGRAM_N)
        for r in docs_pd.itertuples(index=False)
    }
    df: Counter = Counter()
    for gs in grams.values():
        df.update({_md5_64(g) for g in gs})
    ref = {}
    for doc_id, gs in grams.items():
        hs = [_md5_64(g) for g in gs]
        n = len(hs)
        dup = sum(1 for h in hs if df[h] >= 2)
        frac = dup / n if n > 0 else None
        ref[doc_id] = (n, dup, frac,
                       n == 0 or frac <= MAX_CROSS_DOC_DUP_FRAC)
    assert got == ref and len(got) == len(docs_pd)


def test_char_diversity_matches_python_counter(spark, reg, docs_pd):
    """Simpson concentration over canonical-text chars; the empty
    canonical text degenerates to one ''-char (split('','') fence-
    post) with simpson exactly 1e9."""
    import math

    got = {
        int(r.doc_id): (int(r.n_chars_canon), int(r.distinct_chars),
                        int(r.simpson_x1e9), bool(r.diverse_ok))
        for r in reg["text_char_diversity"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for r in docs_pd.itertuples(index=False):
        ct = _canon(r.text)
        counts = Counter(ct) if ct else Counter({"": 1})
        n = sum(counts.values())
        ssq = sum(c * c for c in counts.values())
        simpson = math.floor((ssq * 1e9) / float(n * n))
        ref[int(r.doc_id)] = (n, len(counts), simpson,
                              simpson < 200_000_000)
    assert got == ref and len(got) == len(docs_pd)


def test_source_mix_matches_python(spark, reg, docs_pd):
    import math

    got = {
        r.source: (int(r.n_docs), int(r.n_tokens),
                   int(r.token_share_x1e9), int(r.keep_rate_x1e6))
        for r in reg["pipeline_source_mix"].fn(spark, SF_DIR).collect()
    }
    per: dict = defaultdict(lambda: [0, 0])
    for r in docs_pd.itertuples(index=False):
        per[r.source][0] += 1
        per[r.source][1] += len(_tokens(r.text))
    total = sum(t for _, t in per.values())
    n_sources = len(per)
    ref = {}
    for source, (nd, nt) in per.items():
        share = math.floor((nt * 1e9) / float(total))
        keep = math.floor(min(1.0, float(total) / float(n_sources * nt))
                          * 1e6)
        ref[source] = (nd, nt, share, keep)
    assert got == ref and len(got) > 1
