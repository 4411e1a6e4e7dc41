"""Reference-implementation checks for the round-6 pipeline operators
on RANDOMIZED corpora (seeded): the oracle-parity suite pins each
operator against DuckDB on the fixed test tables; these tests pin the
same semantics against independent pure-Python implementations on
data the fixed tables can't represent (adversarial doc lengths, empty
docs, negative embeddings, ties), so a bug that happens to cancel on
the synthetic corpus still gets caught.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from duckdb_redis_olap_scanner_spark.operators import packing as PK
from duckdb_redis_olap_scanner_spark.operators import quantize as QZ
from duckdb_redis_olap_scanner_spark.operators import retrieval as R
from duckdb_redis_olap_scanner_spark.operators import text as T
from duckdb_redis_olap_scanner_spark.operators.dedup import (
    duplicate_ngram_stats,
)

P = 1_000_000_007
VOCAB = ["alpha", "beta", "gamma", "delta", "spark", "window", "merge", "x1"]


def md5_hash64_ref(s: str) -> int:
    """Pure-Python twin of text.md5_hash64 (little-endian u64 of the
    LAST 8 md5 digest bytes, mod 1e9+7) — validated against DuckDB
    md5_number_lower."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little") % P


def _random_docs(seed: int, n_docs: int = 40):
    rng = np.random.RandomState(seed)
    docs = []
    for i in range(n_docs):
        n = int(rng.randint(0, 30))  # includes empty docs
        docs.append((i, " ".join(rng.choice(VOCAB, n)) if n else ""))
    return docs


@pytest.fixture(scope="module")
def rand_docs_df(spark):
    return spark.createDataFrame(
        _random_docs(7), "doc_id long, text string"
    )


def _toks(text: str) -> list[str]:
    # tokens_col twin: split lower(trim(text)) on \s+ — Java split of
    # "" yields [""], one empty token.
    return text.strip().lower().split() or [""]


def test_bm25_matches_python_reference(spark, rand_docs_df):
    terms = ("spark", "window", "merge")
    docs = _random_docs(7)
    tf = {i: {t: _toks(s).count(t) for t in terms} for i, s in docs}
    dl = {i: len(_toks(s)) for i, s in docs}
    n = len(docs)
    total = sum(dl.values())
    df_ = {t: sum(1 for i, _ in docs if tf[i][t] > 0) for t in terms}
    avgdl = float(total) / n
    k1, b = R.BM25_K1, R.BM25_B

    def score(i):
        s = 0.0
        for t in terms:
            idf = (float(n - df_[t]) + 0.5) / (float(df_[t]) + 0.5)
            tfd = float(tf[i][t])
            s += (idf * (tfd * (k1 + 1.0))) / (
                tfd + k1 * ((1.0 - b) + (b * float(dl[i])) / avgdl)
            )
        return s

    expect = sorted(
        ((i, score(i)) for i, _ in docs if score(i) > 0),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    got = [
        (r.doc_id, r.score)
        for r in R.bm25_topk(rand_docs_df, terms=terms).collect()
    ]
    assert got == expect  # bit-exact: same IEEE ops in the same order


def test_repetition_stats_match_python_reference(spark, rand_docs_df):
    from collections import Counter

    got = {
        r.doc_id: r
        for r in T.with_repetition_stats(rand_docs_df).collect()
    }
    for i, s in _random_docs(7):
        toks = _toks(s)
        bigrams = [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        top = max(Counter(bigrams).values()) if bigrams else 0
        r = got[i]
        assert r.n_tok == len(toks)
        assert r.n_distinct == len(set(toks))
        assert r.top_bigram_cnt == top
        assert r.dup_token_frac == (len(toks) - len(set(toks))) / len(toks)


def test_chunk_documents_match_python_reference(spark, rand_docs_df):
    got: dict = {}
    for r in T.chunk_documents(rand_docs_df).collect():
        got.setdefault(r.doc_id, []).append(r)
    for i, s in _random_docs(7):
        toks = _toks(s)
        rows = sorted(got[i], key=lambda r: r.chunk_idx)
        starts = list(range(0, len(toks), T.CHUNK_STRIDE))
        assert [r.start_tok for r in rows] == starts
        for r in rows:
            chunk = toks[r.start_tok : r.start_tok + T.CHUNK_TOKENS]
            assert r.chunk_len == len(chunk)
            assert r.chunk_hash == md5_hash64_ref(" ".join(chunk))


def test_pack_sequences_match_python_reference(spark, rand_docs_df):
    def canon(s: str) -> str:
        import re

        return re.sub(r"\s+", " ", s.strip()).lower()

    docs = _random_docs(7)
    rows = [
        (i, len(_toks(s)), md5_hash64_ref(canon(s))) for i, s in docs
    ]
    expect = {}
    by_bucket: dict = {}
    for i, n, h in rows:
        by_bucket.setdefault(h % PK.N_PACK_BUCKETS, []).append((h, i, n))
    for bucket, members in by_bucket.items():
        off = 0
        for h, i, n in sorted(members):
            first = off // PK.PACK_SEQ_LEN
            last = (off + n - 1) // PK.PACK_SEQ_LEN
            expect[i] = (bucket, n, off, first, last - first + 1)
            off += n
    got = {
        r.doc_id: (r.bucket, r.n_tok, r.start_tok, r.first_seq, r.n_seqs)
        for r in PK.pack_sequences(rand_docs_df).collect()
    }
    assert got == expect


def test_duplicate_ngrams_match_python_reference(spark, rand_docs_df):
    n = 8
    docs = _random_docs(7)
    grams = {
        i: {
            " ".join(_toks(s)[j : j + n])
            for j in range(len(_toks(s)) - n + 1)
        }
        for i, s in docs
    }
    from collections import Counter

    freq = Counter(g for gs in grams.values() for g in gs)
    got = {
        r.doc_id: r for r in duplicate_ngram_stats(rand_docs_df).collect()
    }
    for i, _ in docs:
        r = got[i]
        assert r.n_grams == len(grams[i])
        assert r.n_dup_grams == sum(1 for g in grams[i] if freq[g] >= 2)


def test_quantize_matches_numpy_reference(spark):
    rng = np.random.RandomState(11)
    vecs = [
        (i, [float(np.float32(x)) for x in rng.randn(16)]) for i in range(25)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in QZ.quantize_int8(df).collect()}
    for i, v in vecs:
        r = got[i]
        maxabs = max(abs(x) for x in v)
        scale = 127.0 / maxabs
        q = [int(np.floor(x * scale + 0.5)) for x in v]
        assert r.scale == scale
        assert r.qvec == ",".join(str(x) for x in q)
        assert all(abs(x) <= 127 for x in q)
        # Left-fold reconstruction error, same op order as the engine.
        err = 0.0
        for x, qi in zip(v, q):
            err = err + (x - qi / scale) * (x - qi / scale)
        assert r.sq_err == err


def test_kmeans_refine_is_argmax_of_integer_means(spark, tables):
    """Self-consistency at the semantic level: recompute the integer-
    mean centroids from the operator's own cell0 output and check each
    cell1 is the (dot desc, cell asc) argmax against them."""
    from duckdb_redis_olap_scanner_spark.operators.similarity import (
        kmeans_refine,
    )

    emb = {
        int(r.vec_id): np.floor(
            np.asarray(r.embedding, dtype=np.float64) * 1000.0
        ).astype(np.int64)
        for r in tables["embeddings"].select("vec_id", "embedding").collect()
    }
    out = kmeans_refine(tables["embeddings"]).collect()
    sums: dict = {}
    cnts: dict = {}
    for r in out:
        sums[r.cell0] = sums.get(r.cell0, 0) + emb[r.vec_id]
        cnts[r.cell0] = cnts.get(r.cell0, 0) + 1
    cells = sorted(sums)
    M = {
        c: np.sign(sums[c]) * (np.abs(sums[c]) // cnts[c]) for c in cells
    }
    for r in out:
        dots = {c: int(emb[r.vec_id] @ M[c]) for c in cells}
        best = min(cells, key=lambda c: (-dots[c], c))
        assert r.cell1 == best, (r.vec_id, r.cell1, best)


def test_vocabulary_and_oov_match_python_reference(spark, rand_docs_df):
    from collections import Counter

    docs = _random_docs(7)
    df_counts = Counter(
        t for _, s in docs for t in set(_toks(s))
    )
    order = sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [
        (r.tok, r.df_docs)
        for r in R.vocabulary_topk(rand_docs_df, k=5).collect()
    ]
    assert got == order[:5]

    vocab = {t for t, _ in order[: R.OOV_VOCAB_SIZE]}
    got_oov = {r.doc_id: r for r in R.oov_stats(rand_docs_df).collect()}
    for i, s in docs:
        toks = _toks(s)
        inv = sum(1 for t in toks if t in vocab)
        r = got_oov[i]
        assert (r.n_tok, r.n_invocab) == (len(toks), inv)
        assert r.oov_rate == (len(toks) - inv) / len(toks)


def test_pii_scrub_matches_python_reference(spark):
    import re

    rows = [
        (0, "reach me at jane.doe@example.com or 555-123-4567 now"),
        (1, "no pii here at all"),
        (2, "two mails a@b.io c.d@e.org and 123-456-7890"),
        (3, "not-a-phone 12-345-6789 not-an-email a@@b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.scrub_pii(df).collect()}
    for i, s in rows:
        emails = re.findall(T.PII_EMAIL_RE, s)
        phones = re.findall(T.PII_PHONE_RE, s)
        clean = re.sub(
            T.PII_PHONE_RE, "<PHONE>", re.sub(T.PII_EMAIL_RE, "<EMAIL>", s)
        )
        r = got[i]
        assert (r.n_emails, r.n_phones) == (len(emails), len(phones)), s
        assert r.len_delta == len(s) - len(clean)
        import hashlib as h

        assert r.clean_md5 == h.md5(clean.encode()).hexdigest()


def test_char_diversity_matches_python_reference(spark, rand_docs_df):
    import re
    from collections import Counter

    got = {
        r.doc_id: r for r in T.with_char_diversity(rand_docs_df).collect()
    }
    for i, s in _random_docs(7):
        canon = re.sub(r"\s+", " ", s.strip()).lower()
        chars = list(canon) if canon else [""]
        c = Counter(chars)
        n = len(chars)
        sq = sum(v * v for v in c.values())
        import math

        r = got[i]
        assert (r.n_chars_canon, r.distinct_chars) == (n, len(c))
        # Same op order as the engines: double multiply, double divide,
        # then floor (NOT integer //, which would skip the float round).
        assert r.simpson_x1e9 == math.floor((sq * 1e9) / (n * n))


def _wordpiece_ref(docs, vocab_size=30):
    """Pure-Python twin of retrieval.wordpiece_encode_stats: induce
    the df-top-k + char-piece vocabulary, then greedy longest-match
    encode (word id preferred on length ties, whole-word [UNK] on any
    out-of-alphabet char)."""
    from collections import Counter

    df = Counter()
    for _did, text in docs:
        for t in set(_toks(text)):
            if t != "":
                df[t] += 1
    words = sorted(df, key=lambda t: (-df[t], t))[:vocab_size]
    chars = sorted({c for w in words for c in w})
    W = len(words)
    wid = {w: i + 1 for i, w in enumerate(words)}
    start = {c: W + 2 * i + 1 for i, c in enumerate(chars)}
    cont = {c: W + 2 * i + 2 for i, c in enumerate(chars)}
    out = {}
    for did, text in docs:
        ids = []
        for w in _toks(text):
            if w == "":
                continue
            best = max(
                (x for x in words if w.startswith(x)), key=len, default=None
            )
            if best is not None:
                first, rest = wid[best], w[len(best):]
            elif w[0] in start:
                first, rest = start[w[0]], w[1:]
            else:
                ids.append(0)
                continue
            cs = [cont.get(c) for c in rest]
            if any(c is None for c in cs):
                ids.append(0)
            else:
                ids.extend([first] + cs)
        h = 0
        for x in ids:
            h = (h * R.WP_HASH_BASE + x + 1) % R.WP_HASH_MOD
        out[did] = (len(ids), sum(1 for x in ids if x == 0), h)
    return out


def test_wordpiece_matches_python_reference(spark):
    """Adversarial corpus the fixed tables can't represent: >30
    distinct tokens (so some fall out of vocab and char-segment),
    words formed by concatenating vocab words (greedy longest-match
    prefix territory), out-of-alphabet chars (UNK), empty and NULL
    docs."""
    rng = np.random.RandomState(11)
    pool = (
        [f"w{i:02d}" for i in range(45)]
        + ["alphabeta", "betagamma", "sparkwindow"]  # vocab-word prefixes
        + ["x¿9", "ümlaut", "☃snow"]  # chars outside the alphabet
        + VOCAB
    )
    docs = []
    for i in range(60):
        n = int(rng.randint(0, 25))
        docs.append((i, " ".join(rng.choice(pool, n)) if n else ""))
    docs.append((60, None))
    docs.append((61, "   "))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_ids, r.n_unk, r.ids_hash)
        for r in R.wordpiece_encode_stats(sdf).collect()
    }
    want = _wordpiece_ref([(d, t or "") for d, t in docs])
    assert got == want
    # the adversarial pool must actually exercise both rare paths
    assert sum(u for _n, u, _h in want.values()) > 0  # UNKs present
    assert any(n > 0 for n, _u, _h in want.values())


def test_segment_dedup_matches_python_reference(spark, rand_docs_df):
    from collections import Counter

    from duckdb_redis_olap_scanner_spark.operators.dedup import (
        SEG_WORDS,
        segment_dedup,
    )

    docs = _random_docs(7)
    segs_per_doc: dict = {}
    cnt: Counter = Counter()
    for i, s in docs:
        toks = _toks(s)
        segs = [
            " ".join(toks[k : k + SEG_WORDS])
            for k in range(0, len(toks), SEG_WORDS)
        ]
        segs_per_doc[i] = segs
        cnt.update(md5_hash64_ref(x) for x in segs)
    got = {r.doc_id: r for r in segment_dedup(rand_docs_df).collect()}
    for i, _s in docs:
        segs = segs_per_doc[i]
        kept = [x for x in segs if cnt[md5_hash64_ref(x)] == 1]
        r = got[i]
        assert r.n_segs == len(segs)
        assert r.n_kept == len(kept)
        assert (
            r.kept_md5 == hashlib.md5(" ".join(kept).encode()).hexdigest()
        )


def test_quality_classifier_matches_python_reference(spark):
    # rand_docs_df's vocabulary contains no stopwords, which would leave
    # stop_milli identically zero — build a corpus that exercises every
    # feature, including ties at the cpt center and heavy repetition.
    rows = [
        (0, "the spark of the window is the merge to go"),
        (1, "alpha alpha alpha alpha alpha"),
        (2, "a b c d e f g h i j k l"),
        (3, "supercalifragilistic expialidocious pneumonoultramicroscopic"),
        (4, "the the the the the the"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.quality_classifier(df).collect()}
    for i, s in rows:
        toks = _toks(s)
        t = len(toks)
        sc = sum(1 for x in toks if x in T.STOPWORDS)
        d = len(set(toks))
        c = len(s)
        stop, uniq, cpt = 1000 * sc // t, 1000 * d // t, 1000 * c // t
        margin = (
            T.CLS_STOP_W * stop
            + T.CLS_UNIQ_W * uniq
            - abs(cpt - T.CLS_CPT_CENTER) // T.CLS_CPT_W_DIV
            + T.CLS_BIAS
        )
        r = got[i]
        assert (
            r.stop_milli,
            r.uniq_milli,
            r.cpt_milli,
            r.margin,
            r.keep,
        ) == (stop, uniq, cpt, margin, margin > 0)


def test_bigram_familiarity_matches_python_reference(spark, rand_docs_df):
    from collections import Counter

    docs = _random_docs(7)
    cnt: Counter = Counter()
    per_doc: dict = {}
    for i, s in docs:
        toks = _toks(s)
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        per_doc[i] = bgs
        cnt.update(md5_hash64_ref(b) for b in bgs)
    got = {r.doc_id: r for r in T.bigram_familiarity(rand_docs_df).collect()}
    for i, _s in docs:
        bgs = per_doc[i]
        fam = sum(cnt[md5_hash64_ref(b)] for b in bgs)
        r = got[i]
        assert r.n_bigrams == len(bgs)
        assert r.familiarity == fam
        assert r.avg_milli == (1000 * fam // len(bgs) if bgs else 0)


def test_random_projection_matches_numpy_reference(spark):
    from duckdb_redis_olap_scanner_spark.operators import similarity as S

    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 64).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: [r[f"p{j}"] for j in range(S.RP_OUT_DIM)]
        for r in S.random_projection(df).collect()
    }
    W = np.array(S.hyperplane_weights(S.RP_OUT_DIM, 64), dtype=np.int64)
    q = np.floor(vecs.astype(np.float64) * 1000.0).astype(np.int64)
    exp = q @ W.T
    for i in range(20):
        assert got[i] == list(exp[i])


def test_segment_dedup_identity_and_annihilation(spark):
    """Two algebraic properties that pin the reassembly semantics:
    (a) identity — with globally unique words every segment is
    corpus-unique, so the rejoined text must equal the canonical
    input exactly; (b) annihilation — an exact duplicate pair loses
    ALL its segments on both copies (symmetric removal)."""
    from duckdb_redis_olap_scanner_spark.operators.dedup import (
        segment_dedup,
    )

    uniq = [
        (i, " ".join(f"w{i}x{j}" for j in range(5 + 3 * i)))
        for i in range(6)
    ]
    dup = [(100, "copy copy copy me now"), (101, "copy copy copy me now")]
    df = spark.createDataFrame(uniq + dup, "doc_id long, text string")
    got = {r.doc_id: r for r in segment_dedup(df).collect()}
    for i, s in uniq:
        r = got[i]
        assert r.n_kept == r.n_segs
        assert r.kept_md5 == hashlib.md5(s.encode()).hexdigest()
    for i, _s in dup:
        r = got[i]
        assert r.n_kept == 0
        assert r.kept_md5 == hashlib.md5(b"").hexdigest()


def test_bpe_train_matches_python_reference(spark):
    """Independent textbook BPE (dict-of-tuples, greedy merge) on a
    corpus engineered with repeats, ties, and back-to-back pairs —
    including the 'aaa' case where greedy left-to-right application
    must produce ('aa', 'a')."""
    from collections import Counter

    from duckdb_redis_olap_scanner_spark.operators.retrieval import (
        bpe_train_merges,
    )

    rows = [
        (0, "banana bandana banana"),
        (1, "aaa aaaa banana"),
        (2, "cat catalog cataract"),
        (3, "na na na banana"),
        (4, "x1 x1 x1 x1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # Reference implementation.
    freq: Counter = Counter()
    for _i, s in rows:
        for w in s.strip().lower().split():
            freq[tuple(w)] += 1
    ref = []
    for rank in range(1, 9):
        pc: Counter = Counter()
        for sym, f in freq.items():
            for j in range(len(sym) - 1):
                pc[(sym[j], sym[j + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        ref.append((rank, a, b, a + b, cnt))
        out: Counter = Counter()
        for sym, f in freq.items():
            merged, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    merged.append(a + b)
                    j += 2
                else:
                    merged.append(sym[j])
                    j += 1
            out[tuple(merged)] += f
        freq = out

    got = sorted(
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_freq)
        for r in bpe_train_merges(df).collect()
    )
    assert got == ref


def test_bpe_encode_matches_python_reference(spark):
    """Train + apply on the same adversarial corpus: the encoded
    stream must equal the reference segmentation word by word."""
    import hashlib as _hl
    from collections import Counter

    from duckdb_redis_olap_scanner_spark.operators.retrieval import (
        bpe_encode_stats,
        bpe_train_merges,
    )

    rows = [
        (0, "banana bandana banana"),
        (1, "aaa aaaa banana"),
        (2, "cat catalog cataract"),
        (3, "na na na banana"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        (r.lhs, r.rhs) for r in bpe_train_merges(df).collect()
    ]

    def encode(word):
        sym = list(word)
        for a, b in merges:
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            sym = out
        return sym

    got = {r.doc_id: r for r in bpe_encode_stats(df).collect()}
    import re

    for i, s in rows:
        words = [
            w for w in s.strip().lower().split()
            if re.fullmatch("[a-z0-9]+", w)
        ]
        streams = [" ".join(encode(w)) for w in words]
        r = got[i]
        assert r.n_words == len(words)
        assert r.n_bpe_tokens == sum(len(encode(w)) for w in words)
        assert r.tokens_md5 == _hl.md5(" ".join(streams).encode()).hexdigest()


def test_bpe_train_batched_matches_python_reference(spark):
    """The batch_k>1 scale path pinned against an independent Python
    implementation of the same batched algorithm: per round, order
    pairs by (count DESC, pair ASC), greedily select up to k
    symbol-disjoint pairs from the top 4k candidates, apply them
    sequentially, repeat. Also asserts batch_k=1 stays byte-identical
    to the exact sequential path."""
    from collections import Counter

    from duckdb_redis_olap_scanner_spark.operators.retrieval import (
        bpe_train_merges,
    )

    rows = [
        (0, "banana bandana banana"),
        (1, "aaa aaaa banana"),
        (2, "cat catalog cataract"),
        (3, "na na na banana"),
        (4, "x1 x1 x1 x1"),
        (5, "zig zag zig zag zigzag"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_merges, k = 10, 3

    def ref_batched(n_merges, k):
        freq: Counter = Counter()
        for _i, s in rows:
            for w in s.strip().lower().split():
                freq[tuple(w)] += 1
        out_merges = []
        while len(out_merges) < n_merges:
            want = min(k, n_merges - len(out_merges))
            pc: Counter = Counter()
            for sym, f in freq.items():
                for j in range(len(sym) - 1):
                    pc[(sym[j], sym[j + 1])] += f
            if not pc:
                break
            top = sorted(
                pc.items(),
                key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"),
            )[: max(1, 4 * want)]
            used: set = set()
            selected = []
            for (a, b), cnt in top:
                if len(selected) == want:
                    break
                if {a, b, a + b} & used:
                    continue
                used.update((a, b, a + b))
                selected.append((a, b, cnt))
            if not selected:
                break
            for a, b, cnt in selected:
                out_merges.append(
                    (len(out_merges) + 1, a, b, a + b, cnt)
                )
                nxt: Counter = Counter()
                for sym, f in freq.items():
                    merged, j = [], 0
                    while j < len(sym):
                        if (
                            j + 1 < len(sym)
                            and sym[j] == a
                            and sym[j + 1] == b
                        ):
                            merged.append(a + b)
                            j += 2
                        else:
                            merged.append(sym[j])
                            j += 1
                    nxt[tuple(merged)] += f
                freq = nxt
        return out_merges

    got = sorted(
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_freq)
        for r in bpe_train_merges(df, n_merges, batch_k=k).collect()
    )
    assert got == ref_batched(n_merges, k)

    exact = sorted(
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_freq)
        for r in bpe_train_merges(df, n_merges).collect()
    )
    assert exact == ref_batched(n_merges, 1)


def test_equidepth_histogram_matches_python_reference(spark, tmp_path):
    """Equi-depth bucket assignment re-derived independently: bucket of
    a value = floor(NB * rank_before / total) over the sorted distinct
    values, ties sharing a bucket."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_redis_olap_scanner_spark.plans.catalog import registry
    from duckdb_redis_olap_scanner_spark.plans.pipeline_ops5 import (
        EQD_BUCKETS,
    )

    vals = [1.0, 1.0, 1.0, 2.5, 2.5, 3.0, 7.75, 7.75, 7.75, 7.75, 100.0]
    n = len(vals)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + i for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["t"] * n),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    import math
    from collections import Counter

    cents = [math.floor(v * 100) for v in vals]
    cnt = Counter(cents)
    total = len(cents)
    ref: dict = {}
    cum = 0
    for c in sorted(cnt):
        b = min(EQD_BUCKETS * cum // total, EQD_BUCKETS - 1)
        r = ref.setdefault(b, [0, 1 << 62, -(1 << 62), 0])
        r[0] += cnt[c]
        r[1] = min(r[1], c)
        r[2] = max(r[2], c)
        r[3] += 1
        cum += cnt[c]

    got = {
        r.bucket: (r.n_events, r.lo_cents, r.hi_cents, r.n_distinct)
        for r in registry()["events_equidepth_histogram"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {b: tuple(v) for b, v in ref.items()}


def test_curriculum_shards_match_python_reference(spark):
    """Shard boundaries re-derived independently from the margin
    multiset: shard of a doc = floor(NS * docs_with_strictly_higher
    _margin / total), all same-margin docs sharing a shard."""
    from collections import Counter

    from duckdb_redis_olap_scanner_spark.operators.text import (
        CLS_BIAS,
        CLS_CPT_CENTER,
        CLS_CPT_W_DIV,
        CLS_STOP_W,
        CLS_UNIQ_W,
        STOPWORDS,
    )
    from duckdb_redis_olap_scanner_spark.plans.catalog import registry
    from duckdb_redis_olap_scanner_spark.plans.pipeline_ops5 import (
        NUM_SHARDS,
    )

    rows = [(i, t) for i, t in _random_docs(11) if t]  # skip empties: NULL-free
    # Write as the documents table shape.
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    tmp = tempfile.mkdtemp()
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(t) for _, t in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp}/documents.parquet")

    def margin(text):
        toks = _toks(text)
        t = len(toks)
        s = sum(1 for x in toks if x in STOPWORDS)
        d = len(set(toks))
        c = len(text)
        sm, um, cm = 1000 * s // t, 1000 * d // t, 1000 * c // t
        return (
            CLS_STOP_W * sm + CLS_UNIQ_W * um
            - abs(cm - CLS_CPT_CENTER) // CLS_CPT_W_DIV + CLS_BIAS
        )

    margins = [margin(t) for _, t in rows]
    toks_n = [len(_toks(t)) for _, t in rows]
    total = len(margins)
    mc = Counter(margins)
    ref: dict = {}
    cum = 0
    for m in sorted(mc, reverse=True):
        shard = min(NUM_SHARDS * cum // total, NUM_SHARDS - 1)
        for mm, tn in zip(margins, toks_n):
            if mm == m:
                r = ref.setdefault(shard, [0, 0, 1 << 62, -(1 << 62)])
                r[0] += 1
                r[1] += tn
                r[2] = min(r[2], m)
                r[3] = max(r[3], m)
        cum += mc[m]

    got = {
        r.shard: (r.n_docs, r.sum_tokens, r.min_margin, r.max_margin)
        for r in registry()["pipeline_curriculum_shards"]
        .fn(spark, tmp)
        .collect()
    }
    assert got == {b: tuple(v) for b, v in ref.items()}


def test_bpe_auto_batch_k_resolution():
    """Default batch_k resolves adaptively: exact sequential argmax up
    to BPE_SEQUENTIAL_MAX merges (the oracle-reproducible regime),
    batched beyond — so a 30k-merge production vocabulary runs ~470
    Spark jobs by default instead of 30k."""
    from duckdb_redis_olap_scanner_spark.operators.retrieval import (
        BPE_SEQUENTIAL_MAX,
        _auto_batch_k,
    )

    assert _auto_batch_k(1) == 1
    assert _auto_batch_k(8) == 1
    assert _auto_batch_k(BPE_SEQUENTIAL_MAX) == 1
    assert _auto_batch_k(BPE_SEQUENTIAL_MAX + 1) == 2
    assert _auto_batch_k(512) == 8
    assert _auto_batch_k(30_000) == BPE_SEQUENTIAL_MAX
    # job count is sub-linear: rounds = ceil(n / k)
    n = 30_000
    rounds = -(-n // _auto_batch_k(n))
    assert rounds <= 470


def test_let_bind_semantics(spark):
    """let_bind(fields, body) == body applied to the raw expressions —
    the binding changes evaluation COUNT, never values (incl. NULLs
    inside the bound struct)."""
    import pyspark.sql.functions as F

    from duckdb_redis_olap_scanner_spark.operators.util import let_bind

    df = spark.range(5).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.col("id") * 10).alias("v"),
    )
    bound = let_bind(
        {"a": F.col("v") + 1, "b": F.col("id")},
        lambda s: F.coalesce(s["a"], F.lit(-1)) * s["b"] + s["b"],
    )
    raw = F.coalesce(F.col("v") + 1, F.lit(-1)) * F.col("id") + F.col("id")
    rows = df.select(bound.alias("x"), raw.alias("y")).collect()
    assert all(r["x"] == r["y"] for r in rows)


def test_incremental_dedup_matches_python_reference(spark):
    """incremental_dedup == batch-collapse minus history fingerprints,
    on adversarial data: within-batch duplicates, cross-set duplicates
    that only collide after canonicalization (case / whitespace), and
    batch-only novel docs."""
    from duckdb_redis_olap_scanner_spark.operators.dedup import (
        incremental_dedup,
    )

    history = spark.createDataFrame(
        [(0, "Alpha  Beta"), (2, "gamma"), (4, "")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (11, "alpha beta"),      # dup of history 0 post-canon
            (13, "delta"),           # novel
            (15, " DELTA  "),        # dup of 13 post-canon
            (17, "epsilon"),         # novel
            (19, "   "),             # canon "" — dup of history 4
        ],
        "doc_id long, text string",
    )

    def canon(s: str) -> str:
        import re

        return re.sub(r"\s+", " ", s).strip().lower()

    hist_fp = {canon(t) for _, t in [(0, "Alpha  Beta"), (2, "gamma"), (4, "")]}
    batch: dict[str, list[int]] = {}
    for i, t in [(11, "alpha beta"), (13, "delta"), (15, " DELTA  "),
                 (17, "epsilon"), (19, "   ")]:
        batch.setdefault(canon(t), []).append(i)
    want = {
        min(ids): len(ids)
        for c, ids in batch.items()
        if c not in hist_fp
    }

    got = {
        r.keep_id: r.batch_dup_cnt
        for r in incremental_dedup(history, incoming).collect()
    }
    assert got == want == {13: 2, 17: 1}


def test_incremental_minhash_matches_python_reference(spark):
    """incremental_minhash_dedup == the pure-Python LSH replay on a
    randomized corpus split by parity: shingle → 8 minhashes → 4 band
    buckets → cross-set collisions → exact Jaccard over shingle-hash
    sets — verifying the cross-set join keeps exactly the pairs the
    sequential replay keeps (incl. near-identical doc pairs planted
    across the parity boundary)."""
    from duckdb_redis_olap_scanner_spark.operators.dedup import (
        BAND_ROWS,
        MINHASH_A,
        MINHASH_B,
        N_MINHASH,
        incremental_minhash_dedup,
    )

    rng = np.random.RandomState(11)
    docs = []
    for i in range(24):
        n = int(rng.randint(3, 18))
        docs.append((i, " ".join(rng.choice(VOCAB, n))))
    # planted cross-parity near-dups: odd doc = even doc + one token
    for base in (2, 8, 14):
        docs.append((100 + base + 1, docs[base][1] + " spark"))
        docs.append((200 + base, docs[base][1]))  # exact twin, even id

    def sh_hashes(text: str) -> set:
        toks = _toks(text)
        grams = {
            " ".join(toks[k : k + 3]) for k in range(len(toks) - 2)
        }
        return {md5_hash64_ref(g) for g in grams}

    def bands(hs: set):
        if not hs:
            return []
        ms = [
            min((a * h + b) % P for h in hs)
            for a, b in zip(MINHASH_A, MINHASH_B)
        ]
        return [
            (j, ms[BAND_ROWS * j] * P + ms[BAND_ROWS * j + 1])
            for j in range(N_MINHASH // BAND_ROWS)
        ]

    hs_of = {i: sh_hashes(t) for i, t in docs}
    want = set()
    for bi, bt in docs:
        if bi % 2 == 0:
            continue
        for hi, ht in docs:
            if hi % 2 == 1:
                continue
            if not set(bands(hs_of[bi])) & set(bands(hs_of[hi])):
                continue
            common = len(hs_of[bi] & hs_of[hi])
            union = len(hs_of[bi] | hs_of[hi])
            if union and common / union >= 0.2:
                want.add((bi, hi, common))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.match_id, r.common)
        for r in incremental_minhash_dedup(
            history=df.filter("doc_id % 2 = 0"),
            incoming=df.filter("doc_id % 2 = 1"),
            threshold=0.2,
        ).collect()
    }
    assert got == want
    # the planted near-dups must actually be in the result
    assert any(b == 103 for b, _h, _c in got)


@pytest.mark.parametrize("seed", [3, 19, 42])
def test_incremental_dedup_algebra_vs_full_dedup(spark, seed):
    """The incremental/full algebra: for U = history ∪ incoming,
    survivors(incremental) are exactly the fingerprints of
    exact_dedup(U) that history doesn't own — with identical keep_id
    (min over U == min over batch when the fp is batch-only) and
    dup_cnt. Random corpora with forced collisions on a tiny
    vocabulary."""
    from duckdb_redis_olap_scanner_spark.operators.dedup import (
        exact_dedup,
        incremental_dedup,
    )

    rng = np.random.RandomState(seed)
    rows = [
        (i, " ".join(rng.choice(VOCAB[:3], rng.randint(0, 3))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    history = df.filter("doc_id % 3 = 0")
    incoming = df.filter("doc_id % 3 != 0")

    inc = {
        r.content_fp: (r.keep_id, r.batch_dup_cnt)
        for r in incremental_dedup(history, incoming).collect()
    }
    hist_fps = {
        r.content_fp for r in exact_dedup(history).collect()
    }
    full = {
        r.content_fp: (r.keep_id, r.dup_cnt)
        for r in exact_dedup(df).collect()
    }
    batch = {
        r.content_fp: (r.keep_id, r.dup_cnt)
        for r in exact_dedup(incoming).collect()
    }
    want = {
        fp: v for fp, v in batch.items() if fp not in hist_fps
    }
    assert inc == want
    for fp, (keep_id, cnt) in inc.items():
        assert full[fp] == (keep_id, cnt)


def test_incremental_minhash_equals_cross_parity_slice_of_full_lsh(spark):
    """Cross-implementation algebra: the full corpus self-join
    (minhash_lsh_dedup) restricted to cross-parity pairs, reoriented
    to (odd, even), must equal incremental_minhash_dedup(even, odd) —
    identical band constants means identical candidate buckets, so
    the two independent join formulations must agree pair for pair,
    including common counts and jaccard."""
    from duckdb_redis_olap_scanner_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_dedup,
    )

    rng = np.random.RandomState(23)
    docs = []
    for i in range(30):
        n = int(rng.randint(3, 15))
        docs.append((i, " ".join(rng.choice(VOCAB, n))))
    # planted near-dups across parity: even base → odd twin, odd → even
    docs.append((51, docs[4][1] + " merge"))
    docs.append((60, docs[9][1] + " merge"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    full = {
        (r.doc_a, r.doc_b): (r.common, round(r.jaccard, 12))
        for r in minhash_lsh_dedup(df, threshold=0.2).collect()
    }
    cross = {}
    for (a, b), v in full.items():
        if a % 2 == b % 2:
            continue
        odd, even = (a, b) if a % 2 == 1 else (b, a)
        cross[(odd, even)] = v

    inc = {
        (r.doc_id, r.match_id): (r.common, round(r.jaccard, 12))
        for r in incremental_minhash_dedup(
            history=df.filter("doc_id % 2 = 0"),
            incoming=df.filter("doc_id % 2 = 1"),
            threshold=0.2,
        ).collect()
    }
    assert inc == cross
    assert inc  # non-vacuous: the planted pairs must collide


def test_decontaminate_containment_matches_python_reference(spark):
    """Containment vs a pure-Python replay on adversarial docs: empty
    and sub-3-token held-out docs (no shingles → absent from output),
    a held-out doc fully quoted inside a longer train doc
    (containment 1.0 despite low pairwise Jaccard), and partial
    overlaps straddling the 0.7 flag."""
    from duckdb_redis_olap_scanner_spark.operators.dedup import (
        decontaminate_containment,
    )

    rng = np.random.RandomState(31)
    docs = [
        (i, " ".join(rng.choice(VOCAB, int(rng.randint(0, 12)))))
        for i in range(60)
    ]
    # a long "train-ish" doc and a short quote of its middle
    long_doc = " ".join(rng.choice(VOCAB, 40))
    docs.append((200, long_doc))
    docs.append((201, " ".join(long_doc.split()[10:16])))

    def canon(s: str) -> str:
        import re

        return re.sub(r"\s+", " ", s).strip().lower()

    def sh_hashes(text: str) -> set:
        toks = _toks(text)
        return {
            md5_hash64_ref(" ".join(toks[k : k + 3]))
            for k in range(len(toks) - 2)
        }

    buckets = {i: md5_hash64_ref(canon(t)) % 100 for i, t in docs}
    vocab = set()
    for i, t in docs:
        if buckets[i] < 80:
            vocab |= sh_hashes(t)
    want = {}
    for i, t in docs:
        if not (80 <= buckets[i] < 90):
            continue
        hs = sh_hashes(t)
        if not hs:
            continue  # shingle-less docs never reach the join
        # NOTE: the operator counts per exploded DISTINCT SHINGLE row;
        # two shingles colliding to one hash still count twice — but
        # md5-64 collisions won't occur on this corpus, so set
        # cardinality is the faithful replay here.
        hits = len(hs & vocab)
        want[i] = (len(hs), hits, hits / len(hs), hits / len(hs) >= 0.7)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (
            r.n_shingles,
            r.hit_shingles,
            round(r.containment, 12),
            r.contaminated,
        )
        for r in decontaminate_containment(df).collect()
    }
    want = {k: (a, b, round(c, 12), d) for k, (a, b, c, d) in want.items()}
    assert got == want
    assert want  # the split must actually produce held-out docs
