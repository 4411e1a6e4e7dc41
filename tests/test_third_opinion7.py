"""Third-opinion audit, batch 8 (r16): the product-quantization stack.

The PQ entries are the most math-dense surface in the repo — codebook
training (seed + one integer-Lloyd step), code assignment tie-breaks,
ADC lookup tables, probe sets, and the residual refinement all appear
hand-written on BOTH the Spark side and the SQL oracle. This batch
re-derives the whole stack in plain python ints from the documented
definitions:

* pipeline_pq_encode    — per-subspace codes + exact L2 residuals.
* ann_pq_adc            — asymmetric-distance top-k (query exact,
                          corpus by codes; LUT = per-subspace L2 from
                          query subvector to each codebook centroid).
* ann_ivf_pq            — coarse cells (argmax dot) gate candidates,
                          raw-vector PQ codes rank inside.
* ann_ivf_pq_residual   — classical IVF-PQ: codes over x − coarse[cell]
                          residuals, one LUT per probed cell.

Shared training semantics being pinned: seeds are the first ks
vectors' (residual) subvectors; assignment ties break to the LOWEST
centroid index (the array_position-first-min contract); the Lloyd
mean uses exact int64 sums with TRUNCATING division; empty cells keep
their seed. All arithmetic is integer, so every comparison is exact.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.operators.similarity import (
    N_IVF_CELLS,
    PQ_KS,
    PQ_M,
)
from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR


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
    # dict insertion order == ascending vec_id
    return {int(i): [int(x) for x in q[k]]
            for k, i in sorted(zip(range(len(ids)), ids), key=lambda t: t[1])}


def _l2(a, b) -> int:
    return sum((x - y) ** 2 for x, y in zip(a, b))


def _dot(a, b) -> int:
    return sum(x * y for x, y in zip(a, b))


def _train_codebooks(subvecs_by_id: dict, seeds: list, sd: int):
    """seed centroids + ONE integer-mean Lloyd step; ties -> lowest
    cell; truncating division; empty cells keep the seed."""
    cent = [list(s) for s in seeds]
    sums = defaultdict(lambda: [0] * sd)
    cnts = defaultdict(int)
    for sub in subvecs_by_id.values():
        c = min(range(len(cent)), key=lambda i: (_l2(sub, cent[i]), i))
        for p in range(sd):
            sums[c][p] += sub[p]
        cnts[c] += 1
    for c, cnt in cnts.items():
        cent[c] = [(abs(s) // cnt) * (1 if s >= 0 else -1)
                   for s in sums[c]]
    return cent


def _pq_train(v: dict, m: int = PQ_M, ks: int = PQ_KS):
    dim = len(next(iter(v.values())))
    sd = dim // m
    cent = []
    for j in range(m):
        seeds = [v[i][j * sd: (j + 1) * sd] for i in sorted(v) if i < ks]
        subs = {i: x[j * sd: (j + 1) * sd] for i, x in v.items()}
        cent.append(_train_codebooks(subs, seeds, sd))
    return cent, sd


def _codes(x: list, cent, sd: int):
    out = []
    for j, cb in enumerate(cent):
        sub = x[j * sd: (j + 1) * sd]
        c = min(range(len(cb)), key=lambda i: (_l2(sub, cb[i]), i))
        out.append(c)
    return out


def test_pq_encode_matches_python_training(spark, reg, vecs):
    got = sorted(
        (int(r.vec_id), int(r.subspace), int(r.code), int(r.sub_dist))
        for r in reg["pipeline_pq_encode"].fn(spark, SF_DIR).collect()
    )
    cent, sd = _pq_train(vecs)
    ref = []
    for i, x in vecs.items():
        for j, cb in enumerate(cent):
            sub = x[j * sd: (j + 1) * sd]
            c = min(range(len(cb)), key=lambda k: (_l2(sub, cb[k]), k))
            ref.append((i, j, c, _l2(sub, cb[c])))
    assert got == sorted(ref) and len(got) == len(vecs) * PQ_M


def test_pq_adc_matches_python_lut(spark, reg, vecs):
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.adc_dist), int(r.rank))
        for r in reg["ann_pq_adc"].fn(spark, SF_DIR).collect()
    )
    cent, sd = _pq_train(vecs)
    codes = {i: _codes(x, cent, sd) for i, x in vecs.items()}
    ref = []
    for qid in sorted(i for i in vecs if i < 3):
        qv = vecs[qid]
        lut = [[_l2(qv[j * sd: (j + 1) * sd], c) for c in cent[j]]
               for j in range(PQ_M)]
        scored = sorted(
            (sum(lut[j][codes[n][j]] for j in range(PQ_M)), n)
            for n in vecs if n != qid
        )
        ref.extend((qid, n, d, rank)
                   for rank, (d, n) in enumerate(scored[:5], start=1))
    assert got == sorted(ref) and len(got) == 15


def _coarse_cells(vecs, n_probe: int = 1):
    coarse = [vecs[i] for i in sorted(vecs) if i < N_IVF_CELLS]
    out = {}
    for i, x in vecs.items():
        dots = sorted(
            ((-_dot(x, c), cid) for cid, c in enumerate(coarse))
        )
        out[i] = [cid for _, cid in dots[:n_probe]]
    return coarse, out


def test_ivf_pq_matches_python(spark, reg, vecs):
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.cell),
         int(r.adc_dist), int(r.rank))
        for r in reg["ann_ivf_pq"].fn(spark, SF_DIR).collect()
    )
    cent, sd = _pq_train(vecs)
    codes = {i: _codes(x, cent, sd) for i, x in vecs.items()}
    _, cell1 = _coarse_cells(vecs, 1)
    _, probes = _coarse_cells(vecs, 2)
    ref = []
    for qid in sorted(i for i in vecs if i < 3):
        qv = vecs[qid]
        lut = [[_l2(qv[j * sd: (j + 1) * sd], c) for c in cent[j]]
               for j in range(PQ_M)]
        probe = set(probes[qid])
        scored = sorted(
            (sum(lut[j][codes[n][j]] for j in range(PQ_M)), n, cell1[n][0])
            for n in vecs
            if n != qid and cell1[n][0] in probe
        )
        ref.extend((qid, n, cell, d, rank)
                   for rank, (d, n, cell) in enumerate(scored[:5], start=1))
    assert got == sorted(ref) and len(got) > 0


def test_ivf_pq_residual_matches_python(spark, reg, vecs):
    """Classical IVF-PQ: codebooks trained on residuals (seed residuals
    from the first ks vectors), corpus codes over x - coarse[cell(x)],
    one query LUT per probed cell over the query's own residual."""
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.cell),
         int(r.adc_dist), int(r.rank))
        for r in reg["ann_ivf_pq_residual"].fn(spark, SF_DIR).collect()
    )
    coarse, cell1 = _coarse_cells(vecs, 1)
    dim = len(next(iter(vecs.values())))
    sd = dim // PQ_M
    resid = {
        i: [a - b for a, b in zip(x, coarse[cell1[i][0]])]
        for i, x in vecs.items()
    }
    cent = []
    for j in range(PQ_M):
        seeds = [resid[i][j * sd: (j + 1) * sd]
                 for i in sorted(vecs) if i < PQ_KS]
        subs = {i: r[j * sd: (j + 1) * sd] for i, r in resid.items()}
        cent.append(_train_codebooks(subs, seeds, sd))
    codes = {i: _codes(r, cent, sd) for i, r in resid.items()}
    _, probes = _coarse_cells(vecs, 2)
    ref = []
    for qid in sorted(i for i in vecs if i < 3):
        qv = vecs[qid]
        scored = []
        for cell in probes[qid]:
            qr = [a - b for a, b in zip(qv, coarse[cell])]
            lut = [[_l2(qr[j * sd: (j + 1) * sd], c) for c in cent[j]]
                   for j in range(PQ_M)]
            for n in vecs:
                if n == qid or cell1[n][0] != cell:
                    continue
                scored.append(
                    (sum(lut[j][codes[n][j]] for j in range(PQ_M)), n, cell)
                )
        scored.sort()
        ref.extend((qid, n, cell, d, rank)
                   for rank, (d, n, cell) in enumerate(scored[:5], start=1))
    assert got == sorted(ref) and len(got) > 0
