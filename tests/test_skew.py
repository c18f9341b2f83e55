"""Head-term skew: a term occurring in EVERY document (the worst Zipf head)
must still build bounded posting rows per segment and answer queries
rank-identically to the oracle — the north_rule's explicit skew handling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from full_text_index_spark.build import build_index, prepare_corpus
from full_text_index_spark.index import InvertedIndex
from full_text_index_spark.oracle import bm25_oracle
from full_text_index_spark.query import bm25_topk


@pytest.fixture(scope="module")
def skew_setup(spark, tmp_path_factory):
    rng = np.random.default_rng(77)
    n = 400
    texts = []
    for i in range(n):
        # "mega" in every doc, often many times; few rare terms
        body = ["mega"] * int(rng.integers(1, 30))
        body += [f"rare{rng.integers(0, 50)}" for _ in range(int(rng.integers(3, 10)))]
        rng.shuffle(body)
        texts.append(" ".join(body))
    pdf = pd.DataFrame(
        {"url": [f"u://{i}" for i in range(n)], "text": texts}
    )
    root = str(tmp_path_factory.mktemp("skewidx"))
    corpus = prepare_corpus(spark.createDataFrame(pdf))
    build_index(spark, corpus, root, n_segments=4, block_size=8)
    idx = InvertedIndex.open(spark, root)
    ds = idx.doc_stats().select("url", "doc_id").toPandas()
    return idx, pdf.merge(ds, on="url")


def test_head_term_bounded_per_segment(skew_setup):
    idx, _ = skew_setup
    rows = idx.postings().where(F.col("term") == "mega").collect()
    assert len(rows) == idx.n_segments  # one bounded row per segment
    sizes = [r["df_seg"] for r in rows]
    assert sum(sizes) == idx.n_docs  # df == every doc
    assert max(sizes) <= 2 * min(sizes) + 8  # no pathological imbalance


def test_jaccard_head_shingle_capped(spark):
    """A shingle present in EVERY doc (the quadratic-blowup case) must be
    dropped by the df cap: the join fan-out stays bounded and pairs reflect
    only the capped shingle universe (VERDICT r01 #1 / next-round #4)."""
    from full_text_index_spark.functions.dedup import ngram_jaccard_pairs

    n = 300
    head = "h0 h1 h2 h3 h4"  # the same 5-token run in every doc
    rows = []
    for i in range(n):
        # two clone families (near-dups) + the universal head run
        body = f"alpha{i % 2} beta{i % 2} gamma{i % 2} delta{i % 2} eps{i % 2}"
        rows.append((i, f"{head} {body}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(docs, k=5, min_jaccard=0.5, max_shingle_df=200)
    pdf = out.toPandas()
    # head shingle (df=300 > 200) contributes nothing; each clone family of
    # 150 docs still pairs up on its family shingles (df=150 <= cap)
    assert len(pdf) == 2 * (150 * 149) // 2
    assert (pdf["jaccard_i"] == 10_000).all()  # capped sets are identical


def test_skewed_queries_match_oracle(skew_setup):
    idx, docs = skew_setup
    queries = [(0, ["mega"]), (1, ["mega", "rare7"]), (2, ["rare3"])]
    golden = bm25_oracle(docs, queries, k=10)
    qdf = idx.spark.createDataFrame(queries, "qid long, terms array<string>")
    got = (
        bm25_topk(idx, qdf, k=10)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == golden["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], golden["score"], rtol=1e-9)
