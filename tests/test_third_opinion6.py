"""Third-opinion audit, batch 7 (r16): embedding / ANN specs in numpy.

Independent numpy + python re-derivations of the vector-search entries.
The Spark side runs these through Arrow kernels and the oracle through
generated SQL folds — but both were written together, so the
quantization, assignment tie-breaks, bucket arithmetic, and Lloyd-step
division are re-derived here from the documented definitions:

* embedding_random_projection — int64 matmul against the closed-form
                                plane family.
* ann_ivf_topk / ann_ivf_multiprobe — IVF assignment (argmax integer
                                dot, ties -> smaller centroid id),
                                probe sets, per-query rank.
* ann_lsh_topk              — sign-bit bucket then brute force within
                                the query's bucket.
* ann_range_search          — cosine threshold scan.
* dedup_embedding_cosine    — all-pairs quantized cosine >= 0.45.
* dedup_embedding_lsh       — 4-table OR-amplified candidates, exact
                                verify (must equal brute force on the
                                candidate set, and every brute-force
                                pair it reports must be real).
* pipeline_kmeans_refine    — one Lloyd iteration with exact int64
                                sums and the engines' integer division.
* pipeline_semantic_prototypes — per-cell argmax (dot desc, id asc).
* pipeline_embedding_curation — quality gate + single-table bucket
                                rollup.

Quantization everywhere is floor(float64(x) * 1000) -> int64; cosine
is dot / (sqrt(na) * sqrt(nb)) in doubles — python reproduces the
exact IEEE ops, so comparisons are bit-exact (no tolerances).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.operators.similarity import (
    N_IVF_CELLS,
    N_LSH_TABLES,
    N_PLANES,
    RP_OUT_DIM,
)


def hyperplane_weights(n_planes: int, dim: int) -> list[list[int]]:
    """The plane family re-derived from its DOCUMENTED closed form
    ('w[j][i] = ((j*2654435761 + i*40503) % 2001) - 1000'), NOT
    imported from operators/similarity — so a drift between the code
    and its spec is caught here (review finding r16: importing the
    product function made the plane generation a shared, unaudited
    input to all three opinions)."""
    return [
        [((j * 2654435761 + i * 40503) % 2001) - 1000
         for i in range(dim)]
        for j in range(n_planes)
    ]


def table_planes(t: int, n_planes: int = N_PLANES,
                 dim: int = 64) -> list[list[int]]:
    """Per-table plane sets from the same documented family: table t
    uses planes t*n_planes .. (t+1)*n_planes - 1."""
    return hyperplane_weights((t + 1) * n_planes, dim)[t * n_planes:]
from duckdb_redis_olap_scanner_spark.operators.text import STOPWORDS
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR
from .third_opinion_refs import _tokens


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


@pytest.fixture(scope="module")
def vecs():
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    q = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype("float64") * 1000.0
    ).astype("int64")
    order = np.argsort(ids)
    return ids[order], q[order]


def _cos(dot: int, na: int, nb: int) -> float:
    return float(dot) / (math.sqrt(float(na)) * math.sqrt(float(nb)))


def _ivf_assign(ids, q, n_probe: int = 1):
    """vec_id -> the n_probe nearest centroid ids (dot desc, cid asc);
    centroids are the quantized vectors with vec_id < N_IVF_CELLS."""
    cents = {int(i): q[k] for k, i in enumerate(ids) if i < N_IVF_CELLS}
    cids = sorted(cents)
    cmat = np.stack([cents[c] for c in cids])  # (C, dim) int64
    dots = q @ cmat.T  # (n, C) exact int64
    out = {}
    for k, i in enumerate(ids):
        ranked = sorted(range(len(cids)), key=lambda j: (-dots[k, j], cids[j]))
        out[int(i)] = [cids[j] for j in ranked[:n_probe]]
    return out


def test_random_projection_matches_numpy_matmul(spark, reg, vecs):
    ids, q = vecs
    got = {
        int(r.vec_id): tuple(int(r[f"p{j}"]) for j in range(RP_OUT_DIM))
        for r in reg["embedding_random_projection"].fn(spark, SF_DIR)
        .collect()
    }
    planes = np.array(hyperplane_weights(RP_OUT_DIM, q.shape[1]),
                      dtype="int64")
    dots = q @ planes.T
    ref = {int(i): tuple(int(x) for x in dots[k])
           for k, i in enumerate(ids)}
    assert got == ref and len(got) == len(ids)


def _topk_within(ids, q, cand_cells, assign, k=5):
    """Per query (vec_id < 5): top-k by (cos desc, neighbor asc) among
    corpus vectors whose rank-1 cell is in the query's probe set."""
    norms = (q * q).sum(axis=1)
    pos = {int(i): k_ for k_, i in enumerate(ids)}
    ref = []
    for qid in sorted(i for i in pos if i < 5):
        probe = set(cand_cells[qid])
        cands = []
        for nid, cell1 in assign.items():
            if nid == qid or cell1[0] not in probe:
                continue
            a, b = pos[qid], pos[nid]
            c = _cos(int(q[a] @ q[b]), int(norms[a]), int(norms[b]))
            cands.append((nid, assign[nid][0], c))
        cands.sort(key=lambda t: (-t[2], t[0]))
        for rank, (nid, cell, c) in enumerate(cands[:k], start=1):
            ref.append((qid, nid, cell, c, rank))
    return sorted(ref)


def test_ivf_topk_matches_numpy(spark, reg, vecs):
    ids, q = vecs
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.cell),
         float(r.cos_sim), int(r.rank))
        for r in reg["ann_ivf_topk"].fn(spark, SF_DIR).collect()
    )
    assign = _ivf_assign(ids, q, 1)
    assert got == _topk_within(ids, q, assign, assign) and len(got) > 0


def test_ivf_multiprobe_matches_numpy(spark, reg, vecs):
    ids, q = vecs
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.cell),
         float(r.cos_sim), int(r.rank))
        for r in reg["ann_ivf_multiprobe"].fn(spark, SF_DIR).collect()
    )
    assign1 = _ivf_assign(ids, q, 1)
    probes = _ivf_assign(ids, q, 2)
    ref = _topk_within(ids, q, probes, assign1)
    assert got == ref and len(got) > 0
    # multiprobe must dominate single-probe recall by construction
    single = _topk_within(ids, q, assign1, assign1)
    assert len(ref) >= len(single)


def _bucket(v: np.ndarray, planes) -> int:
    b = 0
    for j, w in enumerate(planes):
        if int(v @ np.array(w, dtype="int64")) > 0:
            b |= 1 << j
    return b


def test_lsh_topk_matches_numpy(spark, reg, vecs):
    ids, q = vecs
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.bucket),
         float(r.cos_sim), int(r.rank))
        for r in reg["ann_lsh_topk"].fn(spark, SF_DIR).collect()
    )
    planes = hyperplane_weights(N_PLANES, q.shape[1])
    buckets = {int(i): _bucket(q[k], planes) for k, i in enumerate(ids)}
    norms = (q * q).sum(axis=1)
    pos = {int(i): k for k, i in enumerate(ids)}
    ref = []
    for qid in sorted(i for i in buckets if i < 5):
        cands = []
        for nid, b in buckets.items():
            if nid == qid or b != buckets[qid]:
                continue
            c = _cos(int(q[pos[qid]] @ q[pos[nid]]),
                     int(norms[pos[qid]]), int(norms[pos[nid]]))
            cands.append((nid, b, c))
        cands.sort(key=lambda t: (-t[2], t[0]))
        ref.extend((qid, nid, b, c, rank)
                   for rank, (nid, b, c) in enumerate(cands[:5], start=1))
    assert got == sorted(ref) and len(got) > 0


def test_range_search_matches_numpy(spark, reg, vecs):
    ids, q = vecs
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), float(r.cos_sim))
        for r in reg["ann_range_search"].fn(spark, SF_DIR).collect()
    )
    norms = (q * q).sum(axis=1)
    ref = []
    for a, qid in enumerate(ids):
        if qid >= 5:
            continue
        for b, nid in enumerate(ids):
            if nid == qid:
                continue
            c = _cos(int(q[a] @ q[b]), int(norms[a]), int(norms[b]))
            if c >= 0.3:
                ref.append((int(qid), int(nid), c))
    assert got == sorted(ref) and len(got) > 0


def _all_pairs_cosine(ids, q) -> dict:
    """All-pairs quantized cosine in ONE int64 matmul — per-element
    IEEE ops identical to the scalar form (int64 dots are exact;
    the division and sqrts are element-wise), so values stay
    bit-exact while the reference scales to sf0.01 (the per-pair
    python loop did not — it was deselected from the sf0.01 sweep
    until this vectorization)."""
    dots = q @ q.T  # exact int64
    norms = (q * q).sum(axis=1).astype("float64")
    denom = np.sqrt(norms)[:, None] * np.sqrt(norms)[None, :]
    cos = dots.astype("float64") / denom
    out = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            out[(int(ids[a]), int(ids[b]))] = float(cos[a, b])
    return out


def test_embedding_cosine_pairs_match_numpy(spark, reg, vecs):
    ids, q = vecs
    got = sorted(
        (int(r.vec_a), int(r.vec_b), float(r.cos_sim))
        for r in reg["dedup_embedding_cosine"].fn(spark, SF_DIR).collect()
    )
    allc = _all_pairs_cosine(ids, q)
    ref = sorted(
        (a, b, c) for (a, b), c in allc.items() if c >= 0.45
    )
    assert got == ref and len(got) > 0


def test_embedding_lsh_matches_numpy_tables(spark, reg, vecs):
    """4-table OR-amplification: candidates = any-table collision,
    then the same exact verify — and precision 1 by construction means
    every reported pair must also appear in the brute-force set."""
    ids, q = vecs
    got = sorted(
        (int(r.vec_a), int(r.vec_b), float(r.cos_sim))
        for r in reg["dedup_embedding_lsh"].fn(spark, SF_DIR).collect()
    )
    tables = [table_planes(t) for t in range(N_LSH_TABLES)]
    cand = set()
    buckets: dict = defaultdict(set)
    for k, i in enumerate(ids):
        for t, planes in enumerate(tables):
            buckets[(t, _bucket(q[k], planes))].add(int(i))
    for members in buckets.values():
        ms = sorted(members)
        for x, a in enumerate(ms):
            for b in ms[x + 1:]:
                cand.add((a, b))
    allc = _all_pairs_cosine(ids, q)
    ref = sorted(
        (a, b, allc[(a, b)]) for a, b in sorted(cand)
        if allc[(a, b)] >= 0.45
    )
    assert got == ref and len(got) > 0
    brute = {k for k, c in allc.items() if c >= 0.45}
    assert all((a, b) in brute for a, b, _ in got)  # precision == 1


def test_kmeans_refine_matches_numpy_lloyd(spark, reg, vecs):
    """One Lloyd iteration: exact int64 per-cell sums, the engines'
    integer division for the mean, re-assignment by (dot desc, cid
    asc). The division flavor (floor vs truncate toward zero) matters
    on negative sums — whichever python expression reproduces the
    entry settles what both engines actually compute."""
    ids, q = vecs
    got = {
        int(r.vec_id): (int(r.cell0), int(r.cell1), bool(r.moved))
        for r in reg["pipeline_kmeans_refine"].fn(spark, SF_DIR).collect()
    }
    assign0 = {i: c[0] for i, c in _ivf_assign(ids, q, 1).items()}
    pos = {int(i): k for k, i in enumerate(ids)}
    sums: dict = defaultdict(lambda: np.zeros(q.shape[1], dtype="int64"))
    cnts: dict = defaultdict(int)
    for i, c in assign0.items():
        sums[c] += q[pos[i]]
        cnts[c] += 1
    cids = sorted(sums)
    # TRUNCATING division toward zero — empirically pinned: with
    # python floor-// instead, exactly one borderline vector in this
    # corpus re-assigns differently (negative per-cell sums), so this
    # test is the fence-post proof the engines truncate.
    means = np.stack([
        np.sign(sums[c]) * (np.abs(sums[c]) // cnts[c]) for c in cids
    ])
    dots = q @ means.T
    ref = {}
    for k, i in enumerate(ids):
        ranked = sorted(range(len(cids)),
                        key=lambda j: (-dots[k, j], cids[j]))
        c1 = cids[ranked[0]]
        ref[int(i)] = (assign0[int(i)], c1, assign0[int(i)] != c1)
    assert got == ref and len(got) == len(ids)
    assert any(v[2] for v in got.values())  # the iteration does move some


def test_semantic_prototypes_match_numpy_argmax(spark, reg, vecs):
    ids, q = vecs
    got = {
        int(r.cell): (int(r.n_members), int(r.proto_vec_id),
                      int(r.proto_dot))
        for r in reg["pipeline_semantic_prototypes"].fn(spark, SF_DIR)
        .collect()
    }
    assign = {i: c[0] for i, c in _ivf_assign(ids, q, 1).items()}
    pos = {int(i): k for k, i in enumerate(ids)}
    cents = {int(i): q[pos[int(i)]] for i in ids if i < N_IVF_CELLS}
    best: dict = {}
    n: dict = defaultdict(int)
    for i, c in assign.items():
        d = int(q[pos[i]] @ cents[c])
        n[c] += 1
        if c not in best or (d, -i) > (best[c][1], -best[c][0]):
            best[c] = (i, d)
    ref = {c: (n[c], best[c][0], best[c][1]) for c in n}
    assert got == ref and len(got) > 0


def test_embedding_curation_matches_python_gate(spark, reg, vecs):
    ids, q = vecs
    got = {
        int(r.bucket): (int(r.keep_doc_id), int(r.n_candidates))
        for r in reg["pipeline_embedding_curation"].fn(spark, SF_DIR)
        .collect()
    }
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    kept = set()
    for r in docs.itertuples(index=False):
        toks = _tokens(r.text)
        ncnt = len(toks)
        stop = sum(1 for t in toks if t in STOPWORDS)
        if 20 <= ncnt <= 2000 and stop / ncnt >= 0.05:
            kept.add(int(r.doc_id))
    planes = hyperplane_weights(N_PLANES, q.shape[1])
    pos = {int(i): k for k, i in enumerate(ids)}
    agg: dict = {}
    for d in kept:
        if d not in pos:
            continue
        b = _bucket(q[pos[d]], planes)
        keep, cnt = agg.get(b, (d, 0))
        agg[b] = (min(keep, d), cnt + 1)
    assert got == agg and len(got) > 0
