"""Third-opinion audit, adversarial corpus batch 3 (r16): embedding
edge vectors, idle language branches, and a manifest invariant.

* pipeline_quantize_int8 on an ALL-ZERO vector — the NULL-scale
  branch (scale, qvec, sq_err all NULL) that no sf corpus vector
  exercises — plus a single-spike vector whose codes are exact.
* ann_cosine_topk with IDENTICAL corpus vectors — cos exactly 1.0
  ties broken by neighbor id, and the duplicate pair must rank ahead
  of everything else.
* pipeline_stratified_sample with a language OUTSIDE the rate table —
  the default-rate branch (keep rate 100: always kept).
* text_lang_guess on marker-tie content — the fixed en>de>fr>es
  priority chain, exercised at each link.
* pipeline_token_budget where a source's FIRST doc already exceeds
  the budget — kept must be False from row one.
* pipeline_pack_manifest fullness invariant on the REAL sf0.001
  corpus: every sequence except each bucket's LAST is exactly full
  (fill_frac == 1.0) — the property packing exists to deliver.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog
from duckdb_redis_olap_scanner_spark.plans.pipeline_ops5 import TOKEN_BUDGET

from .conftest import SF_DIR
from .third_opinion_refs import _canon, _md5_64, _tokens

DIM = 64


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


def _write_embeddings(path, vecs: dict[int, list[float]]) -> None:
    ids = sorted(vecs)
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [vecs[i] for i in ids], type=pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(ids), type=pa.int32()),
        }
    )
    pq.write_table(t, path)


@pytest.fixture(scope="module")
def quant_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_quant")
    vecs = {
        0: [0.0] * DIM,  # the NULL-scale branch
        1: [0.5] + [0.0] * (DIM - 1),  # single spike: codes 127,0,...
        2: [(-1) ** i * (i + 1) / 100.0 for i in range(DIM)],
        3: [-0.25] * DIM,  # all-negative: |max| from a negative value
    }
    _write_embeddings(d / "embeddings.parquet", vecs)
    return str(d), vecs


@pytest.fixture(scope="module")
def ann_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_ann")
    rng = {}
    for i in range(24):
        base = [math.sin(0.7 * i + 0.13 * j) for j in range(DIM)]
        rng[i] = base
    rng[20] = list(rng[21])  # identical pair among the corpus side
    rng[3] = list(rng[18])  # a query identical to a corpus vector
    _write_embeddings(d / "embeddings.parquet", rng)
    return str(d), rng


def test_quantize_zero_vector_null_branch(spark, reg, quant_dir):
    path, vecs = quant_dir
    got = {
        int(r.vec_id): (r.scale, r.qvec, r.sq_err)
        for r in reg["pipeline_quantize_int8"].fn(spark, path).collect()
    }
    assert got[0] == (None, None, None)  # the branch this test exists for
    ref = {}
    for i, v64 in vecs.items():
        if i == 0:
            continue
        v = [float(np.float32(x)) for x in v64]
        amax = max(abs(x) for x in v)
        scale = 127.0 / amax
        qv = [math.floor(x * scale + 0.5) for x in v]
        err = 0.0
        for a, b in zip(v, qv):
            err = err + (a - b / scale) * (a - b / scale)
        ref[i] = (scale, ",".join(str(q) for q in qv), err)
    assert {k: v for k, v in got.items() if k != 0} == ref
    # the spike vector codes exactly: 127 then zeros
    assert got[1][1] == ",".join(["127"] + ["0"] * (DIM - 1))


def test_ann_cosine_identical_vector_ties(spark, reg, ann_dir):
    path, vecs = ann_dir
    got = sorted(
        (int(r.query_id), int(r.rank), int(r.neighbor_id),
         float(r.cos_sim))
        for r in reg["ann_cosine_topk"].fn(spark, path).collect()
    )
    q = {
        i: np.floor(np.array(v, dtype=np.float32).astype("float64")
                    * 1000.0).astype("int64")
        for i, v in vecs.items()
    }
    norms = {i: int(x @ x) for i, x in q.items()}
    ref = []
    for qid in sorted(i for i in q if i < 5):
        cands = []
        for nid in q:
            if nid == qid:
                continue
            c = float(int(q[qid] @ q[nid])) / (
                math.sqrt(float(norms[qid])) * math.sqrt(float(norms[nid]))
            )
            cands.append((nid, c))
        cands.sort(key=lambda t: (-t[1], t[0]))
        ref.extend((qid, rank, nid, c)
                   for rank, (nid, c) in enumerate(cands[:10], start=1))
    assert got == sorted(ref) and len(got) == 50
    by_q = defaultdict(dict)
    for qid, rank, nid, c in got:
        by_q[qid][rank] = (nid, c)
    # query 3 is bit-identical to corpus vector 18: rank 1 — and the
    # self-cosine is NOT exactly 1.0 in IEEE (n / (sqrt(n)*sqrt(n)) =
    # 1.0000000000000002 here); all three implementations agree on
    # that exact double, which the got==ref compare above already
    # pinned bit-for-bit
    assert by_q[3][1][0] == 18 and abs(by_q[3][1][1] - 1.0) < 1e-15
    # the identical corpus pair 20/21 ties exactly for every query;
    # the neighbor-id tie-break must put 20 immediately before 21
    for qid in by_q:
        ranks = {nid: r for r, (nid, _) in by_q[qid].items()}
        if 20 in ranks and 21 in ranks:
            assert ranks[21] == ranks[20] + 1
            assert by_q[qid][ranks[20]][1] == by_q[qid][ranks[21]][1]


@pytest.fixture(scope="module")
def lang_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_lang")
    texts = {
        # marker ties stepping down the en>de>fr>es priority chain:
        0: "the der le el",      # all four tie at 1 -> en
        1: "der le el",          # de/fr/es tie at 1, en 0 -> de
        2: "le el",              # fr/es tie -> fr
        3: "el los",             # es alone -> es
        4: "xyzzy plugh",        # all zero -> en (>= on all-zeros)
        5: "the the der",        # en strictly wins
    }
    df = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": [texts[k] for k in texts],
            # one lang OUTSIDE the sample-rate table -> default branch
            "lang": ["zz", "en", "fr", "es", "zz", "de"],
            "source": ["s"] * 6,
            "n_chars": [len(texts[k]) for k in texts],
        }
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d), df


def test_lang_guess_priority_chain(spark, reg, lang_dir):
    path, df = lang_dir
    got = {
        int(r.doc_id): r.lang_guess
        for r in reg["text_lang_guess"].fn(spark, path).collect()
    }
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "en", 5: "en"}


def test_stratified_sample_default_rate_branch(spark, reg, lang_dir):
    from duckdb_redis_olap_scanner_spark.operators.text import (
        SAMPLE_RATE_DEFAULT,
        SAMPLE_RATES,
        SAMPLE_SALT,
    )

    path, df = lang_dir
    got = {
        int(r.doc_id): (r.lang, int(r.sample_bucket))
        for r in reg["pipeline_stratified_sample"].fn(spark, path)
        .collect()
    }
    ref = {}
    for r in df.itertuples(index=False):
        b = _md5_64(SAMPLE_SALT + _canon(r.text)) % 100
        if b < SAMPLE_RATES.get(r.lang, SAMPLE_RATE_DEFAULT):
            ref[int(r.doc_id)] = (r.lang, b)
    assert got == ref
    # default rate is 100: every 'zz' doc is kept unconditionally
    assert 0 in got and 4 in got


def test_token_budget_first_doc_over_budget(spark, reg, tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_budget")
    big = " ".join(f"tok{i}" for i in range(TOKEN_BUDGET + 20))
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [big, "a b c", "d e f g"],
            "lang": ["en"] * 3,
            "source": ["only"] * 3,
            "n_chars": [len(big), 5, 7],
        }
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    df.to_parquet(d / "documents.parquet", index=False)
    got = {
        int(r.doc_id): (int(r.n_toks), int(r.cum_toks), bool(r.kept))
        for r in reg["pipeline_token_budget"].fn(spark, str(d)).collect()
    }
    order = sorted(
        (_md5_64("budget|" + r.text), int(r.doc_id), len(_tokens(r.text)))
        for r in df.itertuples(index=False)
    )
    cum = 0
    ref = {}
    for _, doc_id, n in order:
        cum += n
        ref[doc_id] = (n, cum, cum <= TOKEN_BUDGET)
    assert got == ref
    assert not got[0][2]  # the oversized doc can never be kept
    # whether docs 1/2 survive depends on their hash order; if either
    # sorts AFTER the big doc its cum is already blown — assert the
    # rule, not a particular outcome
    for did in (1, 2):
        assert got[did][2] == (got[did][1] <= TOKEN_BUDGET)


def test_pack_manifest_fullness_invariant_real_corpus(spark, reg):
    """Every sequence except each bucket's LAST must be exactly full —
    the property the packing layout exists to deliver, asserted over
    the real sf0.001 corpus."""
    rows = reg["pipeline_pack_manifest"].fn(spark, SF_DIR).collect()
    by_bucket: dict = defaultdict(list)
    for r in rows:
        by_bucket[int(r.bucket)].append((int(r.seq), float(r.fill_frac)))
    assert len(by_bucket) > 1
    partial = 0
    for seqs in by_bucket.values():
        seqs.sort()
        # contiguous sequence ids from 0
        assert [s for s, _ in seqs] == list(range(len(seqs)))
        for s, fill in seqs[:-1]:
            assert fill == 1.0, (s, fill)
        partial += seqs[-1][1] < 1.0
    assert partial >= 1  # at least one bucket has a partial tail


@pytest.fixture(scope="module")
def twin_centroid_dir(tmp_path_factory):
    """A corpus whose IVF seed centroids 2 and 3 are IDENTICAL: every
    vector's dot products to the two cells tie exactly, so the
    (dot desc, cid asc) tie-break decides EVERY assignment between
    them — a fence-post no random corpus exercises."""
    d = tmp_path_factory.mktemp("adv_twin_cent")
    vecs = {}
    for i in range(24):
        vecs[i] = [math.sin(0.9 * i + 0.21 * j) for j in range(DIM)]
    vecs[3] = list(vecs[2])  # identical centroid pair
    _write_embeddings(d / "embeddings.parquet", vecs)
    return str(d), vecs


def test_ivf_identical_centroids_tie_to_lower_cell(spark, reg,
                                                   twin_centroid_dir):
    from .test_third_opinion6 import _ivf_assign, _topk_within

    path, vecs = twin_centroid_dir
    q = np.floor(
        np.stack([np.array(vecs[i], dtype=np.float32)
                  for i in sorted(vecs)]).astype("float64") * 1000.0
    ).astype("int64")
    ids = np.array(sorted(vecs), dtype="int64")
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.cell),
         float(r.cos_sim), int(r.rank))
        for r in reg["ann_ivf_topk"].fn(spark, path).collect()
    )
    assign = _ivf_assign(ids, q, 1)
    assert got == _topk_within(ids, q, assign, assign) and len(got) > 0
    # the tie-break fence-post: quantization makes cells 2 and 3
    # identical, so NOTHING may land in cell 3 (first-max == lowest
    # cid) — including vector 3 itself
    assert all(c[0] != 3 for c in assign.values())
    assert assign[3][0] == 2
    got_cells = {
        int(r.vec_id): int(r.cell0)
        for r in reg["pipeline_kmeans_refine"].fn(spark, path).collect()
    }
    assert got_cells == {i: c[0] for i, c in assign.items()}
    assert 3 not in set(got_cells.values())
