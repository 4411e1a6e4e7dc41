"""Third-opinion audit, batch 9 (r16): tokenizers (BPE + wordpiece)
and the remaining cohort/distribution specs.

The tokenizer entries are iterative, driver-coordinated algorithms —
the hardest class to oracle-check (both engine sides replay the same
merge/vocab tables). This batch re-implements them from the published
algorithm descriptions with plain python dict loops:

* pipeline_bpe_train   — Sennrich BPE on the word-frequency table:
                         chars as initial symbols, argmax pair by
                         (count desc, pair asc), greedy left-to-right
                         non-overlapping apply per merge.
* pipeline_bpe_encode  — apply the merges in training order, pin the
                         per-doc token stream via its md5.
* pipeline_tokenize_ids — greedy wordpiece: longest vocab-word prefix,
                         single-char ## continuations, whole-word
                         [UNK] on any out-of-alphabet char, and the
                         order-pinning polynomial id-hash.
* pipeline_oov_stats   — per-doc OOV rate against the top-30 df vocab.
* text_vocabulary      — top-50 (df desc, tok asc) with coverage.
* events_retention_cohorts — the retention triangle from a loop
                         (Monday-truncated ISO weeks).
* events_hourly_uniques — exact distinct users per (day, hour).
* orders_basket_size_distribution — distribution of group sizes.
* text_top_terms_per_source — group-wise top-3 with the total-order
                         tie-break.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.operators.retrieval import (
    BPE_N_MERGES,
    OOV_VOCAB_SIZE,
    WP_HASH_BASE,
    WP_HASH_MOD,
    WP_UNK_ID,
)
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR
from .third_opinion_refs import _tokens


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "source"]
    )


def _is_word(t: str) -> bool:
    return t != "" and all("a" <= c <= "z" or "0" <= c <= "9" for c in t)


def _sym_string(word: str) -> str:
    return "||" + "||".join(word) + "||"


def _syms(s: str) -> list[str]:
    return [x for x in s.split("||") if x != ""]


def _python_bpe_train(docs_pd, n_merges: int = BPE_N_MERGES):
    """Sennrich BPE over the corpus word-frequency table; returns the
    merge list [(rank, lhs, rhs, merged, pair_freq)] and the final
    per-original-word symbol strings are NOT needed (encode replays
    the merges from scratch)."""
    freq: Counter = Counter()
    for text in docs_pd["text"]:
        for t in _tokens(text):
            if _is_word(t):
                freq[t] += 1
    words = {w: _sym_string(w) for w in freq}
    merges = []
    while len(merges) < n_merges:
        counts: Counter = Counter()
        for w, s in words.items():
            sy = _syms(s)
            for a, b in zip(sy, sy[1:]):
                counts[(a, b)] += freq[w]
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merged = a + b
        merges.append((len(merges) + 1, a, b, merged, cnt))
        pat, rep = f"|{a}||{b}|", f"|{merged}|"
        words = {w: s.replace(pat, rep) for w, s in words.items()}
    return merges


@pytest.fixture(scope="module")
def bpe_merges(docs_pd):
    """The Sennrich training reference, computed once per module
    (review finding r16: train and encode each re-ran it)."""
    return _python_bpe_train(docs_pd)


def test_bpe_train_matches_python_sennrich(spark, reg, bpe_merges):
    got = sorted(
        (int(r.merge_rank), r.lhs, r.rhs, r.merged, int(r.pair_freq))
        for r in reg["pipeline_bpe_train"].fn(spark, SF_DIR).collect()
    )
    assert got == bpe_merges and len(got) == BPE_N_MERGES


def test_bpe_encode_matches_python_apply(spark, reg, docs_pd,
                                         bpe_merges):
    got = {
        int(r.doc_id): (int(r.n_words), int(r.n_bpe_tokens), r.tokens_md5)
        for r in reg["pipeline_bpe_encode"].fn(spark, SF_DIR).collect()
    }
    merges = bpe_merges
    ref = {}
    for r in docs_pd.itertuples(index=False):
        streams = []
        n_sym = 0
        for t in _tokens(r.text):
            if not _is_word(t):
                continue
            s = _sym_string(t)
            for _, a, b, m, _cnt in merges:
                s = s.replace(f"|{a}||{b}|", f"|{m}|")
            sy = _syms(s)
            n_sym += len(sy)
            streams.append(" ".join(sy))
        stream = " ".join(streams)  # word-position order == text order
        ref[int(r.doc_id)] = (
            len(streams), n_sym,
            hashlib.md5(stream.encode("utf-8")).hexdigest()
            if streams else hashlib.md5(b"").hexdigest(),
        )
    assert got == ref and len(got) == len(docs_pd)


def _df_vocab(docs_pd, k: int, drop_empty: bool):
    df: Counter = Counter()
    for text in docs_pd["text"]:
        df.update(set(_tokens(text)))
    items = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
    if drop_empty:
        items = [(t, n) for t, n in items if t != ""]
    return items[:k]


def test_vocabulary_matches_python_df(spark, reg, docs_pd):
    got = sorted(
        (r.tok, int(r.df_docs), float(r.coverage))
        for r in reg["text_vocabulary"].fn(spark, SF_DIR).collect()
    )
    n_docs = len(docs_pd)
    ref = sorted(
        (t, n, n / n_docs) for t, n in _df_vocab(docs_pd, 50, False)
    )
    # this synthetic corpus has < 50 distinct tokens, so LIMIT 50
    # returns the whole vocabulary — both sides must agree on that
    assert got == ref and 0 < len(got) <= 50


def test_oov_stats_match_python(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (int(r.n_tok), int(r.n_invocab), float(r.oov_rate))
        for r in reg["pipeline_oov_stats"].fn(spark, SF_DIR).collect()
    }
    vocab = {t for t, _ in _df_vocab(docs_pd, OOV_VOCAB_SIZE, False)}
    ref = {}
    for r in docs_pd.itertuples(index=False):
        toks = _tokens(r.text)
        inv = sum(1 for t in toks if t in vocab)
        ref[int(r.doc_id)] = (len(toks), inv,
                              (len(toks) - inv) / len(toks))
    assert got == ref and len(got) == len(docs_pd)


def test_wordpiece_ids_match_python_greedy(spark, reg, docs_pd):
    """Greedy wordpiece from the documented rules: longest vocab-word
    PREFIX (not iterative longest-match), single-char continuation
    pieces, whole-word [UNK] when any needed char is outside the
    vocabulary alphabet, ids and their order pinned by the fold
    h -> (h*131 + id + 1) % 1e9+7."""
    got = {
        int(r.doc_id): (int(r.n_ids), int(r.n_unk), int(r.ids_hash))
        for r in reg["pipeline_tokenize_ids"].fn(spark, SF_DIR).collect()
    }
    words = [t for t, _ in _df_vocab(docs_pd, OOV_VOCAB_SIZE + 1, True)]
    words = words[:OOV_VOCAB_SIZE]
    wid = {w: i + 1 for i, w in enumerate(words)}
    chars = sorted({c for w in words for c in w})
    W = len(words)
    init_id = {c: W + 2 * (i + 1) - 1 for i, c in enumerate(chars)}
    cont_id = {c: W + 2 * (i + 1) for i, c in enumerate(chars)}

    def encode_word(w: str) -> list[int]:
        if w == "":
            return []
        best = max((v for v in words if w.startswith(v)),
                   key=len, default=None)
        if best is not None:
            first, skip = wid[best], len(best)
        elif w[0] in init_id:
            first, skip = init_id[w[0]], 1
        else:
            return [WP_UNK_ID]
        rest = w[skip:]
        if any(c not in cont_id for c in rest):
            return [WP_UNK_ID]
        return [first] + [cont_id[c] for c in rest]

    ref = {}
    for r in docs_pd.itertuples(index=False):
        ids: list[int] = []
        for t in _tokens(r.text):
            ids.extend(encode_word(t))
        h = 0
        for x in ids:
            h = (h * WP_HASH_BASE + x + 1) % WP_HASH_MOD
        ref[int(r.doc_id)] = (len(ids), ids.count(WP_UNK_ID), h)
    assert got == ref and len(got) == len(docs_pd)


def test_retention_cohorts_match_python_loop(spark, reg):
    got = {
        (r.cohort_week, int(r.week_offset)): int(r.n_users)
        for r in reg["events_retention_cohorts"].fn(spark, SF_DIR).collect()
    }
    e = pd.read_parquet(f"{SF_DIR}/events.parquet",
                        columns=["user_id", "ts"])
    e["week"] = e["ts"].dt.normalize() - pd.to_timedelta(
        e["ts"].dt.dayofweek, unit="D"
    )
    agg: Counter = Counter()
    for uid, grp in e.groupby("user_id"):
        weeks = sorted(set(grp["week"]))
        cohort = weeks[0]
        for w in weeks:
            agg[(cohort.strftime("%Y-%m-%d"),
                 (w - cohort).days // 7)] += 1
    assert got == dict(agg) and len(got) > 0


def test_hourly_uniques_match_python_sets(spark, reg):
    got = {
        (r.day, int(r.hour)): (int(r.n_users), int(r.n_events))
        for r in reg["events_hourly_uniques"].fn(spark, SF_DIR).collect()
    }
    e = pd.read_parquet(f"{SF_DIR}/events.parquet",
                        columns=["user_id", "ts"])
    users: dict = defaultdict(set)
    n: Counter = Counter()
    for uid, ts in zip(e["user_id"], e["ts"]):
        key = (ts.strftime("%Y-%m-%d"), ts.hour)
        users[key].add(uid)
        n[key] += 1
    ref = {k: (len(users[k]), n[k]) for k in n}
    assert got == ref and len(got) > 0


def test_basket_distribution_matches_python(spark, reg):
    got = {
        int(r.basket): (int(r.n_orders), int(r.n_lines))
        for r in reg["orders_basket_size_distribution"].fn(spark, SF_DIR)
        .collect()
    }
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_orderkey"])
    sizes = Counter(Counter(li["l_orderkey"]).values())
    ref = {b: (n, b * n) for b, n in sizes.items()}
    assert got == ref and len(got) > 0


def test_top_terms_per_source_match_python(spark, reg, docs_pd):
    got = sorted(
        (r.source, r.tok, int(r.n), int(r.rnk))
        for r in reg["text_top_terms_per_source"].fn(spark, SF_DIR)
        .collect()
    )
    counts: dict = defaultdict(Counter)
    for r in docs_pd.itertuples(index=False):
        counts[r.source].update(t for t in _tokens(r.text) if t != "")
    ref = []
    for source, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        ref.extend((source, t, n, rnk)
                   for rnk, (t, n) in enumerate(top, start=1))
    assert got == sorted(ref) and len(got) > 0
