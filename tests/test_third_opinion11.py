"""Third-opinion audit, batch 12 (r16): reshape operators.

Small closing batch — pivot / unpivot / UDTF-lateral re-derived by
loop. These are thin but each has a real fence-post: pivot's
fill-vs-NULL for absent (user, type) cells, unpivot's two-rows-per-
input cardinality, and the UDTF's distinct-then-filter order (distinct
BEFORE the length gate, over raw space-split words, not the \\s+
tokenizer).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from duckdb_redis_olap_scanner_spark.plans import catalog

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def reg():
    import duckdb_redis_olap_scanner_spark.plans  # noqa: F401 — registration

    return catalog.registry()


_TYPES = ("click", "error", "purchase", "signup", "view")


def test_pivot_matches_python_counts(spark, reg):
    got = {
        int(r.user_id): tuple(int(r[t]) for t in _TYPES)
        for r in reg["pivot_event_types"].fn(spark, SF_DIR).collect()
    }
    e = pd.read_parquet(f"{SF_DIR}/events.parquet",
                        columns=["user_id", "event_type"])
    c = Counter(zip(e["user_id"], e["event_type"]))
    ref = {
        int(uid): tuple(c.get((uid, t), 0) for t in _TYPES)
        for uid in set(e["user_id"])
    }
    # NB: at sf0.001 every user has every event type, so the fill(0)
    # branch is idle here; the per-cell counts are still fully pinned.
    assert got == ref and len(got) > 0


def test_unpivot_matches_python_rows(spark, reg):
    import numpy as np

    got = sorted(
        (int(r.p_partkey), r.measure, int(r.val))
        for r in reg["unpivot_measures"].fn(spark, SF_DIR).collect()
    )
    p = pd.read_parquet(
        f"{SF_DIR}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"],
    )
    p = p[p["p_partkey"] < 400]
    ref = []
    for r in p.itertuples(index=False):
        ref.append((int(r.p_partkey), "size", int(r.p_size)))
        ref.append((int(r.p_partkey), "retail_cents",
                    int(np.floor(r.p_retailprice * 100))))
    assert got == sorted(ref) and len(got) == 2 * len(p)


def test_udtf_word_expand_matches_python(spark, reg):
    """Distinct words from a plain SPACE split of lower(text) (not the
    \\s+ tokenizer), THEN the length-> 5 gate."""
    got = sorted(
        (int(r.doc_id), r.word, int(r.wlen))
        for r in reg["udtf_word_expand"].fn(spark, SF_DIR).collect()
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    ref = []
    for r in docs.itertuples(index=False):
        if r.doc_id >= 40:
            continue
        for w in set(r.text.lower().split(" ")):
            if len(w) > 5:
                ref.append((int(r.doc_id), w, len(w)))
    assert got == sorted(ref) and len(got) > 0
