"""ANN quality gate: the approximate paths (multi-table LSH, k-means-refined
IVF) must reach recall@10 ≥ 0.9 vs the exact brute-force ranking on the
sf0.01 embeddings — the near-random worst case for ANN (VERDICT r01 #8)."""

from __future__ import annotations

import os

import pytest

from full_text_index_spark.functions.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)

SF_DIR = "/root/testdata/sf0.01"
QIDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    if not os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")):
        pytest.skip("testdata not present")
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["qid"], set()).add(r["vec_id"])
    return out


def _recall(approx, exact):
    vals = [len(approx.get(q, set()) & exact[q]) / len(exact[q]) for q in exact]
    return sum(vals) / len(vals)


def test_lsh_and_ivf_recall(emb):
    exact = _topk_sets(cosine_topk(emb, QIDS, k=10))
    lsh = _topk_sets(lsh_cosine_topk(emb, QIDS, k=10))
    ivf = _topk_sets(ivf_cosine_topk(emb, QIDS, k=10))
    r_lsh, r_ivf = _recall(lsh, exact), _recall(ivf, exact)
    assert r_lsh >= 0.9, f"LSH recall@10 = {r_lsh}"
    assert r_ivf >= 0.9, f"IVF recall@10 = {r_ivf}"
