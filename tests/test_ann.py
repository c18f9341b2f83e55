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


def test_embedding_near_pairs_exact_on_candidates(emb):
    """embedding_near_pairs must equal a numpy brute force restricted to the
    SAME multi-table LSH blocking: every returned pair passes the threshold,
    and no blocked pair above the threshold is missed."""
    import numpy as np

    from full_text_index_spark.functions.similarity import (
        LSH_PLANES,
        LSH_TABLES,
        PLANE_MOD,
        PLANE_SUB,
        embedding_near_pairs,
    )

    threshold = 0.25
    got = {
        (r["vec_a"], r["vec_b"]): r["sim_i"]
        for r in embedding_near_pairs(emb, threshold=threshold).collect()
    }

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)

    # replicate the deterministic integer hyperplanes
    n_planes_total = LSH_PLANES * LSH_TABLES
    dims = np.arange(1, V.shape[1] + 1, dtype=np.int64)
    planes = np.empty((n_planes_total, V.shape[1]), dtype=np.float64)
    for j in range(n_planes_total):
        planes[j] = ((dims * 2654435761 + j * 40503 + 7) % PLANE_MOD) - PLANE_SUB
    signs = (V @ planes.T > 0).astype(np.int64)  # (n, planes)
    buckets = np.zeros((len(ids), LSH_TABLES), dtype=np.int64)
    for t in range(LSH_TABLES):
        for j in range(LSH_PLANES):
            buckets[:, t] += signs[:, t * LSH_PLANES + j] << j

    norms = np.linalg.norm(V, axis=1)
    sims = (V @ V.T) / np.outer(norms, norms)
    want = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] >= ids[j]:
                continue
            if not (buckets[i] == buckets[j]).any():
                continue
            sim_i = int(np.floor(sims[i, j] * 10_000))
            if sim_i >= int(threshold * 10_000):
                want[(int(ids[i]), int(ids[j]))] = sim_i

    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1  # float64 fold order: <=1 ulp at 1e4
    assert len(want) > 0  # the fixture must actually exercise the path
