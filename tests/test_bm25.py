"""Engine vs oracle rank-identity — the reference's differential test
(reference: utils/compare.c:87-103; oracle role: sau/SAu.c:253-392)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from full_text_index_spark.oracle import bm25_oracle
from full_text_index_spark.query import bm25_topk
from full_text_index_spark.tokenizer import tokenize_py


def _query_set(corpus_pdf: pd.DataFrame) -> list[tuple[int, list[str]]]:
    """Seeded genpatterns analog: terms sampled from the corpus (guaranteed
    hits) + the edge queries from FIXTURES.md §2."""
    rng = np.random.default_rng(1234)
    vocab = {}
    for t in corpus_pdf["text"]:
        for tok in tokenize_py(t):
            vocab[tok] = vocab.get(tok, 0) + 1
    terms = sorted(vocab)
    weights = np.sqrt([vocab[t] for t in terms])
    probs = weights / weights.sum()
    queries: list[tuple[int, list[str]]] = []
    qid = 0
    for n_terms in [1] * 8 + [2] * 8 + [3] * 4:
        pick = rng.choice(len(terms), size=n_terms, replace=False, p=probs)
        queries.append((qid, [terms[i] for i in pick]))
        qid += 1
    head = max(vocab, key=vocab.get)
    queries += [
        (qid, ["absentterm"]),             # never occurs (corpus.py guarantees)
        (qid + 1, ["singletonterm0"]),     # occurs exactly once
        (qid + 2, [head]),                 # Zipf head term
        (qid + 3, [head, head]),           # duplicated term (set semantics)
        (qid + 4, [head, "absentterm"]),   # mixed present/absent
    ]
    return queries


@pytest.fixture(scope="module")
def query_set(tiny_corpus_pdf):
    return _query_set(tiny_corpus_pdf)


@pytest.fixture(scope="module")
def oracle_result(tiny_corpus_pdf, tiny_index):
    docs = tiny_corpus_pdf.copy()
    # same doc_ids the engine derived from url
    ds = tiny_index.doc_stats().select("url", "doc_id").toPandas()
    docs = docs.merge(ds, on="url")
    return docs


def _run_engine(tiny_index, queries, use_blockmax):
    spark = tiny_index.spark
    qdf = spark.createDataFrame(
        [(q, t) for q, t in queries], "qid long, terms array<string>"
    )
    out = bm25_topk(tiny_index, qdf, k=10, use_blockmax=use_blockmax)
    return out.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)


@pytest.mark.parametrize("use_blockmax", [False, True])
def test_rank_identity_vs_oracle(tiny_index, oracle_result, query_set, use_blockmax):
    golden = bm25_oracle(oracle_result, query_set, k=10)
    got = _run_engine(tiny_index, query_set, use_blockmax)
    golden = golden.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert len(got) == len(golden), (len(got), len(golden))
    assert got["qid"].tolist() == golden["qid"].tolist()
    assert got["rank"].tolist() == golden["rank"].tolist()
    assert got["doc_id"].tolist() == golden["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], golden["score"], rtol=1e-9)


def test_blockmax_equals_exact(tiny_index, query_set):
    a = _run_engine(tiny_index, query_set, use_blockmax=True)
    b = _run_engine(tiny_index, query_set, use_blockmax=False)
    pd.testing.assert_frame_equal(a, b)


def test_maxscore_pruning_path_equals_exact(tiny_index, query_set):
    """prune_threshold=0 forces EVERY query through the block-max MaxScore
    pruning path — must still be rank-identical to the exact path."""
    spark = tiny_index.spark
    qdf = spark.createDataFrame(
        [(q, t) for q, t in query_set], "qid long, terms array<string>"
    )
    a = (
        bm25_topk(tiny_index, qdf, k=10, use_blockmax=True, prune_threshold=0)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    b = _run_engine(tiny_index, query_set, use_blockmax=False)
    pd.testing.assert_frame_equal(a, b)


def test_absent_query_returns_empty(tiny_index):
    spark = tiny_index.spark
    qdf = spark.createDataFrame([(0, ["absentterm"])], "qid long, terms array<string>")
    assert bm25_topk(tiny_index, qdf).count() == 0


def test_wildcard_term_search_matches_brute(tiny_corpus_pdf, tiny_index):
    from full_text_index_spark.query import wildcard_term_search

    import re

    patterns = ["ba*", "*aba2", "*bab*", "zzz*q", "bababa0"]
    ds = tiny_index.doc_stats().select("url", "doc_id").toPandas()
    docs = tiny_corpus_pdf.merge(ds, on="url")
    want = {}
    for p in patterns:
        rx = re.compile(
            "^" + ".*".join(re.escape(s) for s in p.split("*")) + "$"
        )
        terms, n_occ, dids = set(), 0, set()
        for _, r in docs.iterrows():
            for t in tokenize_py(r["text"]):
                if rx.match(t):
                    terms.add(t)
                    n_occ += 1
                    dids.add(r["doc_id"])
        want[p] = (len(terms), n_occ, len(dids))
    got = {
        r["pattern"]: (r["n_terms"], r["n_occurrences"], r["n_docs_matching"])
        for r in wildcard_term_search(tiny_index, patterns).collect()
    }
    assert got == want
    assert want["ba*"][0] >= 1          # prefix family exists
    assert want["zzz*q"] == (0, 0, 0)   # zero-filled absent glob


def test_more_like_this_excludes_self_and_ranks_dups_first(spark, tmp_path_factory):
    from full_text_index_spark.build import build_index, prepare_corpus
    from full_text_index_spark.index import InvertedIndex
    from full_text_index_spark.query import more_like_this

    rows = [
        (1, "u://1", "alpha beta gamma delta epsilon zeta"),
        (2, "u://2", "alpha beta gamma delta epsilon eta"),   # near-dup of 1
        (3, "u://3", "totally different words entirely here"),
        (4, "u://4", "alpha beta unrelated tail words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    root = str(tmp_path_factory.mktemp("mltidx"))
    build_index(spark, prepare_corpus(docs), root, n_segments=2, block_size=8)
    idx = InvertedIndex.open(spark, root)
    from pyspark.sql import functions as F

    out = more_like_this(idx, docs.where(F.col("doc_id").isin([1, 3])),
                         k=3, n_query_terms=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["doc_id"]))
    for qid, hits in by_q.items():
        hits.sort()
        assert all(d != qid for _, d in hits)            # self excluded
        assert [r for r, _ in hits] == list(range(1, len(hits) + 1))
    assert by_q[1][0][1] == 2                            # near-dup first


def _broadcast_subtrees(plan: str) -> list[str]:
    """Text of every BroadcastExchange subtree in a physical-plan tree
    string (subtree = following lines with strictly deeper indentation)."""
    lines = plan.splitlines()

    def depth(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" :+-"))

    subtrees = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = depth(ln)
        block = []
        for nxt in lines[i + 1:]:
            if nxt.strip() and depth(nxt) <= d:
                break
            block.append(nxt)
        subtrees.append("\n".join(block))
    return subtrees


def test_bm25_never_broadcasts_the_dictionary(spark, tiny_index):
    """The query⋈term_stats join must broadcast the (driver-resident by
    construction) query side, never the vocab-scale dictionary (VERDICT r05
    #1): no BroadcastExchange subtree may contain the term_stats scan, in
    either the exact-scoring path or collapse_topk."""
    from pyspark.sql import functions as F

    from full_text_index_spark.query import collapse_topk

    queries = spark.createDataFrame(
        [(0, ["the", "a"]), (1, ["fox"])], "qid long, terms array<string>"
    )
    groups = spark.createDataFrame([(1, "g")], "doc_id long, group string")
    plans = [
        bm25_topk(tiny_index, queries, k=5, use_blockmax=False)
        ._jdf.queryExecution().executedPlan().toString(),
        collapse_topk(tiny_index, queries, groups, k=5)
        ._jdf.queryExecution().executedPlan().toString(),
    ]
    for plan in plans:
        assert "term_stats" in plan  # the join is present at all
        for sub in _broadcast_subtrees(plan):
            # broadcasting the query⋈dictionary JOIN RESULT downstream is
            # fine (its cardinality is the query batch); broadcasting the
            # BARE dictionary is the hazard — so a term_stats scan inside a
            # broadcast subtree must be accompanied by the query-batch scan
            # (i.e. it is already semi-joined down to query-term rows)
            if "term_stats" in sub:
                assert "ExistingRDD" in sub, sub
