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

    # replicate the deterministic integer hyperplanes (j-dependent
    # multiplier — see similarity._plane_weight)
    n_planes_total = LSH_PLANES * LSH_TABLES
    dims = np.arange(1, V.shape[1] + 1, dtype=np.int64)
    planes = np.empty((n_planes_total, V.shape[1]), dtype=np.float64)
    for j in range(n_planes_total):
        planes[j] = (
            (dims * (2654435761 + 40503 * j) + 7 * (j + 1)) % PLANE_MOD
        ) - PLANE_SUB
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


def test_seq_dot_kernel_bit_parity(spark):
    """The Arrow kernel dot (np.cumsum sequential fold) must be BIT-identical
    to the JVM zip_with+aggregate fold — the property that lets the hot
    paths run in numpy while the DuckDB oracle keeps hashing clean."""
    import numpy as np
    import pandas as pd

    from full_text_index_spark.functions import similarity as S
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "a": [rng.standard_normal(d).astype(np.float32)
                  for d in [64] * 40 + [1, 3, 17]],
            "b": [rng.standard_normal(d).astype(np.float32)
                  for d in [64] * 40 + [1, 3, 17]],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = df.select(
        S._dot(F.col("a"), F.col("b")).alias("jvm"),
        S.seq_dot(F.col("a"), F.col("b")).alias("kern"),
    ).collect()
    for r in rows:
        assert r["jvm"] == r["kern"], (r["jvm"], r["kern"])  # exact, not approx


def test_lsh_bucket_kernel_parity(spark):
    """Kernel-computed table buckets == the JVM lsh_bucket expression for
    every table (sign decisions near zero depend on fold order, so this must
    be exact)."""
    import numpy as np
    import pandas as pd

    from full_text_index_spark.functions import similarity as S
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {"v": [rng.standard_normal(32).astype(np.float32) for _ in range(200)]}
    )
    df = spark.createDataFrame(pdf)
    n_planes, n_tables = 5, 3
    kern = S._make_buckets_udf(n_planes, n_tables)
    cols = [
        S.lsh_bucket(F.col("v"), n_planes, plane_offset=t * n_planes).alias(f"j{t}")
        for t in range(n_tables)
    ]
    rows = df.select(kern(F.col("v")).alias("k"), *cols).collect()
    for r in rows:
        assert list(r["k"]) == [r[f"j{t}"] for t in range(n_tables)]


def test_adaptive_ivf_parameters():
    """VERDICT r03 #3: the IVF parameterization must adapt to corpus size —
    lists grow like √N, the probed FRACTION falls as N grows — while
    flooring to the r03-calibrated (16 lists, nprobe 10) at the contract
    scales so the sf0.01 recall gate and oracle parity are unchanged."""
    from full_text_index_spark.functions.similarity import (
        adaptive_centroids,
        adaptive_nprobe,
    )

    assert adaptive_centroids(500) == 16       # sf0.001/sf0.01 fixtures
    assert adaptive_nprobe(16) == 10
    fracs = []
    for n in [500, 2_000, 100_000, 1_000_000_000]:
        nc = adaptive_centroids(n)
        npb = adaptive_nprobe(nc)
        assert npb <= nc or n <= 512
        fracs.append(min(npb / nc, 1.0))
    # probed fraction strictly falls across the scale ladder
    assert all(a > b for a, b in zip(fracs, fracs[1:])), fracs
    assert fracs[-1] < 0.02  # ~1% of lists probed at 10^9 vectors


def test_ivf_recall_on_clustered_tier(spark):
    """Adaptive IVF on a CLUSTERED synthetic tier (the realistic embedding
    shape): recall@10 ≥ 0.9 while re-ranking well under half the corpus —
    the regime the fixed 16-list r03 default could never reach (it probed
    ~62% regardless of N)."""
    import numpy as np
    import pandas as pd

    from full_text_index_spark.functions.similarity import (
        adaptive_centroids,
        adaptive_nprobe,
        ivf_cosine_topk,
    )

    rng = np.random.default_rng(42)
    n, d, n_clusters = 5000, 16, 50
    centers = rng.standard_normal((n_clusters, d))
    owner = rng.integers(0, n_clusters, n)
    vecs = centers[owner] + 0.3 * rng.standard_normal((n, d))
    pdf = pd.DataFrame({
        "vec_id": np.arange(n),
        "embedding": [v.astype(np.float32) for v in vecs],
    })
    emb = spark.createDataFrame(pdf).cache()
    qids = [0, 1, 2, 3, 4]
    stats: dict = {}
    exact = _topk_sets(cosine_topk(emb, qids, k=10))
    approx = _topk_sets(ivf_cosine_topk(emb, qids, k=10, stats=stats))
    r = _recall(approx, exact)
    assert r >= 0.9, f"IVF recall@10 = {r} on clustered tier"
    assert stats["n_centroids"] == adaptive_centroids(n)
    assert stats["nprobe"] == adaptive_nprobe(stats["n_centroids"])
    frac = stats["n_candidates"] / (len(qids) * (n - 1))
    assert frac < 0.5, f"re-ranked fraction {frac:.2f} did not shrink"


def test_resolve_planes_no_count_job():
    """VERDICT r03 #3 (perf): an explicit n_planes or a caller-supplied
    n_vectors must resolve WITHOUT touching the DataFrame at all (the old
    code ran a full-scan count() per embedding-op call).  Passing None as
    the frame proves no DataFrame API is invoked."""
    from full_text_index_spark.functions.similarity import (
        _resolve_planes,
        adaptive_planes,
    )

    assert _resolve_planes(None, 4) == 4
    assert _resolve_planes(None, None, n_vectors=100_000) == adaptive_planes(
        100_000
    )


def test_adaptive_planes_candidate_volume_linear(spark):
    """VERDICT r02 #3: with the adaptive plane count the LSH blocking's
    candidate volume must grow ~linearly in N (fixed planes grow it
    quadratically).  Synthetic pseudo-random vectors, target bucket
    population held constant; 4× the vectors must give well under 16× (the
    quadratic signature) the candidates."""
    from pyspark.sql import functions as F

    from full_text_index_spark.functions import similarity as S

    def make(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: (F.pmod(F.hash(F.col("id"), i), F.lit(1000)) - 500)
                .cast("float"),
            ).alias("embedding"),
        )

    target = 50

    def cand_count(n):
        emb = make(n)
        planes = S.adaptive_planes(n, target_pop=target)
        banded = S._banded(emb, "vec_id", "embedding", planes, S.LSH_TABLES)
        a, b = banded.alias("a"), banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            ).count()
        ), planes

    c1, p1 = cand_count(2000)
    c4, p4 = cand_count(8000)
    assert p4 > p1  # the plane count actually adapted
    ratio = c4 / max(c1, 1)
    assert ratio < 8.0, f"candidate volume grew {ratio:.1f}x for 4x vectors"
