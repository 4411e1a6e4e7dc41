"""Third-opinion audit, batch 4 (r16): text / dedup / pipeline specs.

Independent re-derivations (hashlib + python sets/loops, no Spark, no
DuckDB) of the LLM-pipeline entries whose Spark implementation and
DuckDB oracle share the most hand-written math — the surface where a
spec misreading would pass the cross-engine gate in both engines:

* text_bm25_topk        — BM25 from the formula (rational idf,
                          (N-df+0.5)/(df+0.5)) with the documented
                          fixed association order; ranks exact, scores
                          bit-exact (IEEE ops are exactly rounded, so
                          python doubles reproduce them).
* pipeline_pack_sequences / pipeline_pack_manifest — the concat-and-
                          chunk layout simulated with a literal
                          running-offset loop per bucket, manifest by
                          interval clipping.
* pipeline_quantize_int8 — scale/codes/left-fold error from numpy +
                          python floats in the documented order.
* dedup_simhash         — sign-of-bit-sum signature over distinct
                          token hashes, re-derived bit by bit.
* dedup_ngram_jaccard   — exact shingle-set Jaccard from python sets.
* dedup_minhash_lsh     — the WHOLE pipeline (shingle -> md5-64 ->
                          K permuted minima -> bands of 2 -> candidate
                          pairs -> exact Jaccard over hash sets)
                          re-implemented with hashlib + dict loops.
* dedup_minhash_clusters / dedup_cluster_survivors — connected
                          components via union-find (vs the entry's
                          iterative min-label propagation and the
                          oracle's recursive CTE — a THIRD algorithm).
* text_repetition_stats — Gopher-style repetition fractions by loop.

The md5-64 hash (little-endian u64 of the LAST 8 md5 bytes mod 1e9+7)
is re-derived from hashlib bytes, independent of both Spark's
md5/conv/decimal chain and DuckDB's md5_number_lower.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.operators.dedup import (
    BAND_ROWS,
    MINHASH_A,
    MINHASH_B,
    N_MINHASH,
    SIMHASH_BITS,
)
from duckdb_redis_olap_scanner_spark.operators.packing import (
    N_PACK_BUCKETS,
    PACK_SEQ_LEN,
)
from duckdb_redis_olap_scanner_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    QUERY_TERMS,
)
from duckdb_redis_olap_scanner_spark.operators.text import (
    HASH_P,
    MAX_DUP_TOKEN_FRAC,
    MAX_TOP_BIGRAM_FRAC,
)
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR

from .third_opinion_refs import (  # noqa: F401 — shared twins
    _canon,
    _md5_64,
    _shingles,
    _tokens,
)


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )


def test_bm25_matches_python_formula(spark, reg, docs_pd):
    got = [
        (int(r.doc_id), int(r.dl),
         *[int(r[f"tf_{t}"]) for t in QUERY_TERMS], float(r.score))
        for r in reg["text_bm25_topk"].fn(spark, SF_DIR).collect()
    ]
    per_doc = []
    for r in docs_pd.itertuples(index=False):
        toks = _tokens(r.text)
        per_doc.append(
            (int(r.doc_id), len(toks),
             tuple(sum(1 for t in toks if t == q) for q in QUERY_TERMS))
        )
    n_docs = len(per_doc)
    total_dl = sum(dl for _, dl, _ in per_doc)
    df = [sum(1 for _, _, tfs in per_doc if tfs[i] > 0)
          for i in range(len(QUERY_TERMS))]
    avgdl = total_dl / n_docs
    scored = []
    for doc_id, dl, tfs in per_doc:
        score = 0.0
        first = True
        for i in range(len(QUERY_TERMS)):
            tf = float(tfs[i])
            idf = ((n_docs - df[i]) + 0.5) / (df[i] + 0.5)
            denom = tf + BM25_K1 * ((1.0 - BM25_B)
                                    + (BM25_B * float(dl)) / avgdl)
            term = (idf * (tf * (BM25_K1 + 1.0))) / denom
            score = term if first else score + term
            first = False
        if score > 0:
            scored.append((doc_id, dl, tfs, score))
    scored.sort(key=lambda x: (-x[3], x[0]))
    ref = [(d, dl, *tfs, s) for d, dl, tfs, s in scored[:10]]
    assert [g[:-1] for g in got] == [r[:-1] for r in ref] and len(got) > 0
    for g, r in zip(got, ref):
        assert g[-1] == r[-1], (g, r)  # bit-exact: same IEEE op order


def test_pack_sequences_matches_python_layout(spark, reg, docs_pd):
    """The packed layout simulated literally: per bucket, lay docs
    head-to-tail in (hash, doc_id) order and record each doc's offset
    and the seq range its token interval [start, start+n_tok) spans."""
    got = {
        int(r.doc_id): (int(r.bucket), int(r.n_tok), int(r.start_tok),
                        int(r.first_seq), int(r.n_seqs))
        for r in reg["pipeline_pack_sequences"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    per_bucket: dict = defaultdict(list)
    for r in docs_pd.itertuples(index=False):
        h = _md5_64(_canon(r.text))
        per_bucket[h % N_PACK_BUCKETS].append(
            (h, int(r.doc_id), len(_tokens(r.text)))
        )
    for bucket, rows in per_bucket.items():
        off = 0
        for _, doc_id, n_tok in sorted(rows):
            first = off // PACK_SEQ_LEN
            last = (off + n_tok - 1) // PACK_SEQ_LEN
            ref[doc_id] = (bucket, n_tok, off, first, last - first + 1)
            off += n_tok
    assert got == ref and len(got) == len(docs_pd)


def test_pack_manifest_matches_python_clipping(spark, reg, docs_pd):
    got = {
        (int(r.bucket), int(r.seq)): (int(r.n_docs), int(r.n_tokens),
                                      float(r.fill_frac))
        for r in reg["pipeline_pack_manifest"].fn(spark, SF_DIR).collect()
    }
    per_bucket: dict = defaultdict(list)
    for r in docs_pd.itertuples(index=False):
        h = _md5_64(_canon(r.text))
        per_bucket[h % N_PACK_BUCKETS].append(
            (h, int(r.doc_id), len(_tokens(r.text)))
        )
    agg: dict = defaultdict(lambda: [0, 0])
    for bucket, rows in per_bucket.items():
        off = 0
        for _, _, n_tok in sorted(rows):
            for seq in range(off // PACK_SEQ_LEN,
                             (off + n_tok - 1) // PACK_SEQ_LEN + 1):
                lo = max(off, seq * PACK_SEQ_LEN)
                hi = min(off + n_tok, (seq + 1) * PACK_SEQ_LEN)
                agg[(bucket, seq)][0] += 1
                agg[(bucket, seq)][1] += hi - lo
            off += n_tok
    ref = {
        k: (nd, nt, nt / float(PACK_SEQ_LEN))
        for k, (nd, nt) in agg.items()
    }
    assert got == ref and len(got) > 0


def test_quantize_int8_matches_python_floats(spark, reg):
    """scale = 127/max|x|, codes = floor(x*scale + 0.5) (half-up for
    BOTH signs — the documented deviation from engine round()), error
    = left-fold of squared reconstruction deltas. Python doubles
    replay the exact op order, so every value must be bit-exact."""
    got = {
        int(r.vec_id): (r.scale, r.qvec, r.sq_err)
        for r in reg["pipeline_quantize_int8"].fn(spark, SF_DIR).collect()
    }
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ref = {}
    for r in emb.itertuples(index=False):
        v = [float(x) for x in r.embedding]  # float32 -> double, exact
        amax = max(abs(x) for x in v)
        if amax == 0.0:
            ref[int(r.vec_id)] = (None, None, None)
            continue
        scale = 127.0 / amax
        qv = [math.floor(x * scale + 0.5) for x in v]
        err = 0.0
        for a, b in zip(v, qv):
            err = err + (a - b / scale) * (a - b / scale)
        ref[int(r.vec_id)] = (scale, ",".join(str(q) for q in qv), err)
    assert got == ref and len(got) == len(emb)


def test_simhash_matches_python_bits(spark, reg, docs_pd):
    got = {
        int(r.doc_id): int(r.simhash)
        for r in reg["dedup_simhash"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for r in docs_pd.itertuples(index=False):
        hs = [_md5_64(t) for t in set(_tokens(r.text))]
        sig = 0
        for b in range(SIMHASH_BITS):
            s = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if s > 0:
                sig |= 1 << b
        ref[int(r.doc_id)] = sig
    assert got == ref and len(got) == len(docs_pd)


def test_ngram_jaccard_matches_python_sets(spark, reg, docs_pd):
    got = sorted(
        (int(r.doc_a), int(r.doc_b), int(r.common), float(r.jaccard))
        for r in reg["dedup_ngram_jaccard"].fn(spark, SF_DIR).collect()
    )
    sh = {
        int(r.doc_id): _shingles(r.text)
        for r in docs_pd.itertuples(index=False)
        if r.doc_id < 60
    }
    ids = sorted(sh)
    ref = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            common = len(sh[a] & sh[b])
            if common == 0:
                continue  # inner joins drop no-overlap pairs
            j = common / (len(sh[a]) + len(sh[b]) - common)
            if j >= 0.02:
                ref.append((a, b, common, j))
    assert got == sorted(ref) and len(got) > 0


def _python_lsh_pairs(docs_pd, threshold: float = 0.2):
    """hashlib + loops re-implementation of minhash_lsh_dedup."""
    hset = {
        int(r.doc_id): {_md5_64(s) for s in _shingles(r.text)}
        for r in docs_pd.itertuples(index=False)
    }
    hset = {d: s for d, s in hset.items() if s}  # no shingles -> no sig
    buckets: dict = defaultdict(set)
    for d, s in hset.items():
        m = [min((a * h + b) % HASH_P for h in s)
             for a, b in zip(MINHASH_A, MINHASH_B)]
        for j in range(N_MINHASH // BAND_ROWS):
            val = m[BAND_ROWS * j] * HASH_P + m[BAND_ROWS * j + 1]
            buckets[(j, val)].add(d)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cand.add((a, b))
    pairs = []
    for a, b in sorted(cand):
        common = len(hset[a] & hset[b])
        j = common / (len(hset[a]) + len(hset[b]) - common)
        if j >= threshold:
            pairs.append((a, b, common, j))
    return pairs


@pytest.fixture(scope="module")
def lsh_pairs(docs_pd):
    """The full hashlib LSH reference, computed once per module (it
    re-shingles and re-hashes the whole corpus — review finding r16:
    three tests recomputed it)."""
    return _python_lsh_pairs(docs_pd)


def test_minhash_lsh_matches_python_pipeline(spark, reg, docs_pd,
                                             lsh_pairs):
    got = sorted(
        (int(r.doc_a), int(r.doc_b), int(r.common), float(r.jaccard))
        for r in reg["dedup_minhash_lsh"].fn(spark, SF_DIR).collect()
    )
    assert got == lsh_pairs and len(got) > 0


def test_minhash_clusters_match_union_find(spark, reg, lsh_pairs):
    """Connected components over the near-dup pairs via union-find —
    a third algorithm against the entry's min-label propagation and
    the oracle's recursive CTE."""
    got = {
        int(r.doc_id): int(r.cluster_id)
        for r in reg["dedup_minhash_clusters"].fn(spark, SF_DIR).collect()
    }
    pairs = lsh_pairs
    parent: dict = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _, _ in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ref = {d: find(d) for d in parent}
    assert got == ref and len(got) > 0


def test_cluster_survivors_match_union_find(spark, reg, docs_pd,
                                            lsh_pairs):
    got = [
        int(r.doc_id)
        for r in reg["dedup_cluster_survivors"].fn(spark, SF_DIR).collect()
    ]
    pairs = lsh_pairs
    losers = set()
    parent: dict = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _, _ in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for d in parent:
        if find(d) != d:
            losers.add(d)
    ref = sorted(int(d) for d in docs_pd["doc_id"] if int(d) not in losers)
    assert got == ref and len(got) > 0


def test_repetition_stats_match_python_loop(spark, reg, docs_pd):
    got = {
        int(r.doc_id): (int(r.n_tok), int(r.n_distinct),
                        int(r.top_bigram_cnt), float(r.dup_token_frac),
                        None if r.top_bigram_frac is None
                        else float(r.top_bigram_frac),
                        bool(r.rep_ok))
        for r in reg["text_repetition_stats"].fn(spark, SF_DIR).collect()
    }
    ref = {}
    for r in docs_pd.itertuples(index=False):
        toks = _tokens(r.text)
        n = len(toks)
        nd = len(set(toks))
        bg: dict = defaultdict(int)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
        top = max(bg.values()) if bg else 0
        dup_frac = (n - nd) / n
        top_frac = top / (n - 1) if n >= 2 else None
        ok = dup_frac <= MAX_DUP_TOKEN_FRAC and (
            n < 2 or top_frac <= MAX_TOP_BIGRAM_FRAC
        )
        ref[int(r.doc_id)] = (n, nd, top, dup_frac, top_frac, ok)
    assert got == ref and len(got) == len(docs_pd)
