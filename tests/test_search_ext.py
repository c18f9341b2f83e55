"""Brute-force differentials for the round-4 search-layer extensions:
field-collapsed top-k, significant-terms facet, best-passage selection.

Same posture as test_bm25: a pure-pandas reimplementation is the oracle
(the reference's sau-as-oracle pattern, utils/run_queries.c:420-422),
every engine result must match it exactly (ranks/ids) or to rtol=1e-9
(scores)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from full_text_index_spark.build import build_index, prepare_corpus
from full_text_index_spark.index import InvertedIndex
from full_text_index_spark.oracle import B, K1, RANK_ROUND
from full_text_index_spark.query import (
    best_passage,
    collapse_topk,
    significant_terms,
)
from full_text_index_spark.tokenizer import tokenize_py

@pytest.fixture(scope="module")
def docs_pdf(tiny_corpus_pdf, tiny_index):
    ds = tiny_index.doc_stats().select("url", "doc_id").toPandas()
    return tiny_corpus_pdf.merge(ds, on="url")


@pytest.fixture(scope="module")
def queries(docs_pdf) -> list[tuple[int, list[str]]]:
    """Terms drawn from the FIXTURE corpus's own Zipf vocabulary (by df
    rank) so single-, mid- and multi-term queries all have real result
    sets, plus the absent/singleton edges FIXTURES.md guarantees."""
    df: Counter = Counter()
    for t in docs_pdf["text"]:
        df.update(set(tokenize_py(t)))
    by_rank = [t for t, _ in df.most_common()]
    mid = [t for t in by_rank if 5 <= df[t] <= 60]
    return [
        (0, [by_rank[0]]),                 # head term: biggest result set
        (1, [mid[0], mid[1]]),             # two mid-df terms (AND)
        (2, [by_rank[2], mid[2]]),         # head + mid
        (3, ["absentterm"]),               # no matches → no rows
        (4, ["singletonterm0"]),           # exactly one matching doc
    ]


@pytest.fixture(scope="module")
def qdf(tiny_index, queries):
    return tiny_index.spark.createDataFrame(
        queries, "qid long, terms array<string>"
    )


def _all_scores(docs: pd.DataFrame) -> tuple[dict, dict, dict, float, int]:
    toks = {int(r["doc_id"]): tokenize_py(r["text"]) for _, r in docs.iterrows()}
    doclen = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(doclen.values()) / n
    tf = {d: Counter(t) for d, t in toks.items()}
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())
    return toks, tf, df, avgdl, n


def _scores_for(terms, tf, df, doclen, avgdl, n):
    scores: dict[int, float] = {}
    for t in sorted(set(terms)):
        dft = df.get(t)
        if not dft:
            continue
        idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        for d, c in tf.items():
            f = c.get(t)
            if not f:
                continue
            norm = K1 * (1.0 - B + B * doclen[d] / avgdl)
            scores[d] = scores.get(d, 0.0) + idf * f * (K1 + 1.0) / (f + norm)
    return scores


def _group_of(doc_id: int) -> str:
    return f"src{doc_id % 3}"


def test_collapse_topk_vs_brute_force(tiny_index, docs_pdf, qdf, queries):
    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    doclen = {d: len(t) for d, t in toks.items()}
    k, per_group = 10, 2

    golden = []
    for qid, terms in queries:
        scores = _scores_for(terms, tf, df, doclen, avgdl, n)
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], RANK_ROUND), kv[0])
        )
        kept, per_g = [], Counter()
        for d, s in ranked:
            g = _group_of(d)
            if per_g[g] < per_group:
                per_g[g] += 1
                kept.append((d, g, s))
        for r, (d, g, s) in enumerate(kept[:k], start=1):
            golden.append((qid, r, d, g, s))
    golden = pd.DataFrame(
        golden, columns=["qid", "rank", "doc_id", "group", "score"]
    )

    groups = tiny_index.doc_stats().select(
        "doc_id",
        F.concat(F.lit("src"), (F.col("doc_id") % 3).cast("string"))
        .alias("group"),
    )
    got = (
        collapse_topk(tiny_index, qdf, groups, k=k, per_group=per_group)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == golden["doc_id"].tolist()
    assert got["group"].tolist() == golden["group"].tolist()
    assert got[["qid", "rank"]].values.tolist() == \
        golden[["qid", "rank"]].values.tolist()
    np.testing.assert_allclose(got["score"], golden["score"], rtol=1e-9)
    # collapsing really changed the list vs plain top-k for some query
    # (the fixture corpus has >per_group docs per group in some result set)
    plain = {
        (qid, d)
        for qid, terms in queries
        for d in [
            kv[0]
            for kv in sorted(
                _scores_for(terms, tf, df, doclen, avgdl, n).items(),
                key=lambda kv: (-round(kv[1], RANK_ROUND), kv[0]),
            )[:k]
        ]
    }
    assert {(q, d) for q, _, d, _, _ in golden.itertuples(index=False)} != plain


def test_significant_terms_vs_brute_force(tiny_index, docs_pdf, qdf, spark, queries):
    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    k = 8

    golden = []
    for qid, terms in queries:
        tset = sorted(set(terms))
        fg_docs = [d for d, c in tf.items() if all(t in c for t in tset)]
        if not fg_docs:
            continue
        fg_n = len(fg_docs)
        fg_df: Counter = Counter()
        for d in fg_docs:
            fg_df.update(set(toks[d]))
        rows = []
        for t, fdf in fg_df.items():
            if t in tset:
                continue
            fg_pct = fdf / fg_n
            bg_pct = df[t] / n
            score = (fg_pct - bg_pct) * fg_pct / bg_pct
            rows.append((t, fdf, df[t], score))
        rows.sort(key=lambda r: (-round(r[3], RANK_ROUND), r[0]))
        for r, (t, fdf, bdf, s) in enumerate(rows[:k], start=1):
            golden.append((qid, r, t, fdf, bdf, s))
    golden = pd.DataFrame(
        golden, columns=["qid", "rank", "term", "fg_df", "df", "score"]
    )
    assert len(golden) > 0

    docs_sdf = tiny_index.doc_stats().select("doc_id", "url").join(
        spark.createDataFrame(docs_pdf[["url", "text"]]), "url"
    ).select("doc_id", "text")
    got = (
        significant_terms(tiny_index, docs_sdf, qdf, k=k)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    assert got["term"].tolist() == golden["term"].tolist()
    assert got["fg_df"].tolist() == golden["fg_df"].tolist()
    assert got["df"].tolist() == golden["df"].tolist()
    assert got[["qid", "rank"]].values.tolist() == \
        golden[["qid", "rank"]].values.tolist()
    np.testing.assert_allclose(got["score"], golden["score"], rtol=1e-9)


@pytest.fixture(scope="module")
def pos_index(spark, tiny_corpus_pdf, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("posidx_ext"))
    corpus = prepare_corpus(spark.createDataFrame(tiny_corpus_pdf))
    build_index(spark, corpus, root, n_segments=4, block_size=16,
                positions=True)
    return InvertedIndex.open(spark, root)


def test_best_passage_vs_brute_force(pos_index, docs_pdf, qdf, queries):
    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    width = 8

    golden = []
    for qid, terms in queries:
        tset = sorted(set(terms))
        for d in sorted(tf):
            if not all(t in tf[d] for t in tset):
                continue
            occ = [
                (p + 1, t) for p, t in enumerate(toks[d]) if t in tset
            ]  # 1-based, matching the positional stream
            best = None
            for start, _ in occ:
                inside = [(p, t) for p, t in occ if start <= p < start + width]
                key = (-len({t for _, t in inside}), -len(inside), start)
                if best is None or key < best[0]:
                    best = (key, start, len({t for _, t in inside}), len(inside))
            golden.append((qid, d, best[1], best[2], best[3]))
    golden = pd.DataFrame(
        golden, columns=["qid", "doc_id", "start", "n_terms", "n_occ"]
    )
    assert len(golden) > 0
    # multi-term queries must contribute some n_terms > 1 passage
    assert (golden["n_terms"] > 1).any()

    got = (
        best_passage(pos_index, qdf, width=width)
        .toPandas().sort_values(["qid", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"),
        golden.sort_values(["qid", "doc_id"]).reset_index(drop=True)
        .astype("int64"),
    )

def test_passage_snippets_text_matches_window(spark, pos_index, docs_pdf,
                                              qdf, queries):
    from full_text_index_spark.query import passage_snippets

    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    width = 8
    docs_sdf = pos_index.doc_stats().select("doc_id", "url").join(
        spark.createDataFrame(docs_pdf[["url", "text"]]), "url"
    ).select("doc_id", "text")
    got = (
        passage_snippets(pos_index, docs_sdf, qdf, width=width)
        .toPandas().sort_values(["qid", "doc_id"]).reset_index(drop=True)
    )
    assert len(got) > 0
    for r in got.itertuples(index=False):
        expect = " ".join(toks[r.doc_id][r.start - 1: r.start - 1 + width])
        assert r.snippet == expect, (r.qid, r.doc_id, r.start)
        # the window really contains n_terms distinct query terms
        qt = set(dict(queries)[r.qid])
        assert len(qt & set(expect.split())) == r.n_terms


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_suggest_terms_vs_brute_force(tiny_index, docs_pdf):
    from full_text_index_spark.query import suggest_terms

    cf: Counter = Counter()
    dfc: Counter = Counter()
    for t in docs_pdf["text"]:
        tk = tokenize_py(t)
        cf.update(tk)
        dfc.update(set(tk))
    head = cf.most_common(1)[0][0]
    prefixes = [head[:2], head, "zzzzabsent"]
    k = 5

    golden = []
    for p in sorted(set(prefixes)):
        hits = sorted((t for t in cf if t.startswith(p)),
                      key=lambda t: (-cf[t], t))[:k]
        for r, t in enumerate(hits, 1):
            golden.append((p, r, t, dfc[t], cf[t]))
    golden = pd.DataFrame(
        golden, columns=["prefix", "rank", "term", "df", "cf"])
    assert (golden["prefix"] == head[:2]).any()
    assert not (golden["prefix"] == "zzzzabsent").any()

    got = (suggest_terms(tiny_index, prefixes, k=k).toPandas()
           .sort_values(["prefix", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int64", "df": "int64", "cf": "int64"}),
        golden.sort_values(["prefix", "rank"]).reset_index(drop=True)
        .astype({"rank": "int64", "df": "int64", "cf": "int64"}),
    )


def test_spellcheck_terms_vs_brute_force(tiny_index, docs_pdf):
    from full_text_index_spark.query import spellcheck_terms

    cf: Counter = Counter()
    dfc: Counter = Counter()
    for t in docs_pdf["text"]:
        tk = tokenize_py(t)
        cf.update(tk)
        dfc.update(set(tk))
    head = cf.most_common(1)[0][0]
    typo = head[:-1] + ("x" if head[-1] != "x" else "q")  # 1 edit from head
    queries = [typo, head, "qqqqqqzzzz"]
    k, me = 5, 1

    golden = []
    for q in sorted(set(queries)):
        hits = [(t, _lev(t, q)) for t in cf
                if abs(len(t) - len(q)) <= me and 0 < _lev(t, q) <= me]
        hits.sort(key=lambda h: (h[1], -cf[h[0]], h[0]))
        for r, (t, d) in enumerate(hits[:k], 1):
            golden.append((q, r, t, d, dfc[t], cf[t]))
    golden = pd.DataFrame(
        golden, columns=["query", "rank", "suggestion", "dist", "df", "cf"])
    # the typo form must recover the head term as its top suggestion
    top = golden[(golden["query"] == typo) & (golden["rank"] == 1)]
    assert top["suggestion"].tolist() == [head]

    got = (spellcheck_terms(tiny_index, queries, max_edits=me, k=k)
           .toPandas().sort_values(["query", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int64", "dist": "int64", "df": "int64",
                    "cf": "int64"}),
        golden.sort_values(["query", "rank"]).reset_index(drop=True)
        .astype({"rank": "int64", "dist": "int64", "df": "int64",
                 "cf": "int64"}),
    )

def test_facet_counts_vs_brute_force(tiny_index, docs_pdf, qdf, queries):
    from full_text_index_spark.query import facet_counts

    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    golden = []
    for qid, terms in queries:
        tset = sorted(set(terms))
        fc: Counter = Counter()
        for d, c in tf.items():
            if all(t in c for t in tset):
                fc[_group_of(d)] += 1
        for g in sorted(fc):
            golden.append((qid, g, fc[g]))
    golden = pd.DataFrame(golden, columns=["qid", "facet", "n_docs"])
    assert len(golden) > 0

    facets = tiny_index.doc_stats().select(
        "doc_id",
        F.concat(F.lit("src"), (F.col("doc_id") % 3).cast("string"))
        .alias("facet"),
    )
    got = (facet_counts(tiny_index, facets, qdf)
           .toPandas().sort_values(["qid", "facet"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_docs": "int64"}),
        golden.sort_values(["qid", "facet"]).reset_index(drop=True)
        .astype({"n_docs": "int64"}),
    )


def test_dictionary_ops_never_scan_corpus_or_postings(tiny_index):
    """suggest/spellcheck must be answered from the dictionary ALONE:
    their physical plans read the term_stats parquet and nothing else
    (reference posture: the vocabulary is the smallest stream; at 100 TB
    a suggester that touches postings or text is wrong)."""
    from full_text_index_spark.query import spellcheck_terms, suggest_terms

    for df in (suggest_terms(tiny_index, ["a"], k=3),
               spellcheck_terms(tiny_index, ["abc"], k=3)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = [ln for ln in plan.splitlines() if "FileScan" in ln
                 or "Scan parquet" in ln]
        assert scans, plan[:500]
        for ln in scans:
            assert "term_stats" in ln, ln
        assert "postings" not in plan and "doc_stats" not in plan

def test_boolean_search_vs_brute_force(tiny_index, docs_pdf, spark):
    from full_text_index_spark.query import boolean_search

    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    by_rank = [t for t, _ in Counter(
        {t: c for t, c in df.items()}).most_common()]
    mid = [t for t in by_rank if 5 <= df[t] <= 60]
    a, b, c, d = by_rank[0], mid[0], mid[1], mid[2]
    e = mid[3]
    workload = [
        (0, [a, b], [], []),               # must only
        (1, [a], [], [b]),                 # must + not
        (2, [], [b, c, d], []),            # should only (>=1)
        (3, [], [b, c], [e]),              # should + not
        (4, [a], [c, d], [b]),             # all three roles
        (5, ["absentterm"], [b], []),      # absent must -> no rows
        (6, [a], [], ["absentterm"]),      # absent not -> no exclusions
    ]
    golden = []
    for qid, must, should, must_not in workload:
        for doc in sorted(tf):
            cdoc = tf[doc]
            if any(t not in cdoc for t in set(must)):
                continue
            if any(t in cdoc for t in set(must_not)):
                continue
            ns = sum(1 for t in set(should) if t in cdoc)
            if not must and ns == 0:
                continue
            golden.append((qid, doc, ns))
    golden = pd.DataFrame(golden, columns=["qid", "doc_id", "n_should"])
    for q in (0, 1, 2, 3, 4, 6):
        assert (golden["qid"] == q).any(), q
    assert not (golden["qid"] == 5).any()

    qdf = spark.createDataFrame(
        workload,
        "qid long, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    got = (boolean_search(tiny_index, qdf).toPandas()
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_should": "int64"}),
        golden.sort_values(["qid", "doc_id"]).reset_index(drop=True)
        .astype({"n_should": "int64"}),
    )


def test_boolean_search_rejects_pure_negative(tiny_index, spark):
    from full_text_index_spark.query import boolean_search

    qdf = spark.createDataFrame(
        [(0, [], [], ["anything"])],
        "qid long, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    with pytest.raises(ValueError, match="pure-negative"):
        boolean_search(tiny_index, qdf)

def test_ranked_snippets_vs_brute_force(spark, pos_index, docs_pdf, qdf,
                                        queries):
    from full_text_index_spark.query import ranked_snippets

    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    doclen = {d: len(t) for d, t in toks.items()}
    k, width = 5, 8

    golden = []
    for qid, terms in queries:
        scores = _scores_for(terms, tf, df, doclen, avgdl, n)
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], RANK_ROUND), kv[0])
        )[:k]
        tset = sorted(set(terms))
        for r, (d, s) in enumerate(ranked, 1):
            occ = [(p + 1, t) for p, t in enumerate(toks[d]) if t in tset]
            best = None
            for start, _ in occ:
                inside = [(p, t) for p, t in occ if start <= p < start + width]
                key = (-len({t for _, t in inside}), -len(inside), start)
                if best is None or key < best[0]:
                    best = (key, start, len({t for _, t in inside}),
                            len(inside))
            snip = " ".join(toks[d][best[1] - 1: best[1] - 1 + width])
            golden.append((qid, r, d, s, best[1], best[2], best[3], snip))
    golden = pd.DataFrame(
        golden, columns=["qid", "rank", "doc_id", "score", "start",
                         "n_terms", "n_occ", "snippet"])
    assert len(golden) > 0

    docs_sdf = pos_index.doc_stats().select("doc_id", "url").join(
        spark.createDataFrame(docs_pdf[["url", "text"]]), "url"
    ).select("doc_id", "text")
    got = (ranked_snippets(pos_index, docs_sdf, qdf, k=k, width=width)
           .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    g = golden.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == g["doc_id"].tolist()
    assert got["start"].tolist() == g["start"].tolist()
    assert got["snippet"].tolist() == g["snippet"].tolist()
    assert got["n_terms"].tolist() == g["n_terms"].tolist()
    assert got["n_occ"].tolist() == g["n_occ"].tolist()
    np.testing.assert_allclose(got["score"], g["score"], rtol=1e-9)

def test_phrase_prefix_search_vs_brute_force(pos_index, docs_pdf):
    from full_text_index_spark.query import phrase_prefix_search

    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    cf: Counter = Counter()
    for t in toks.values():
        cf.update(t)
    # a real bigram from the corpus: fixed term + 2-char prefix of follower
    some = next(iter(sorted(toks)))
    seq = toks[some]
    t0, t1 = seq[0], seq[1]
    phrases = [
        f"{t0} {t1[:2]}",         # fixed + prefix (real bigram prefix)
        t1[:2],                    # single-prefix phrase
        f"{t0} zzzz",              # fixed exists, prefix expands to nothing
        "zzzzqq",                  # no expansion at all
    ]
    me = 50

    def expansions(prefix):
        hits = sorted((t for t in cf if t.startswith(prefix)),
                      key=lambda t: (-cf[t], t))[:me]
        return set(hits)

    golden = []
    for p in phrases:
        terms = tokenize_py(p)
        fixed, prefix = terms[:-1], terms[-1]
        exp = expansions(prefix)
        if not exp:
            continue
        m = len(terms)
        for d in sorted(toks):
            seq_d = toks[d]
            cnt = 0
            for s in range(len(seq_d) - m + 1):
                if all(seq_d[s + i] == t for i, t in enumerate(fixed)) \
                        and seq_d[s + m - 1] in exp:
                    cnt += 1
            if cnt:
                golden.append((p, d, cnt))
    golden = pd.DataFrame(
        golden, columns=["phrase", "doc_id", "n_occurrences"])
    assert (golden["phrase"] == phrases[0]).any()
    assert (golden["phrase"] == phrases[1]).any()
    assert not (golden["phrase"] == phrases[2]).any()

    got = (phrase_prefix_search(pos_index, phrases, max_expansions=me)
           .toPandas().sort_values(["phrase", "doc_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_occurrences": "int64"}),
        golden.sort_values(["phrase", "doc_id"]).reset_index(drop=True)
        .astype({"n_occurrences": "int64"}),
    )


def test_phrase_prefix_expansion_cap(pos_index, docs_pdf):
    """max_expansions=1 keeps only the highest-cf completion."""
    from full_text_index_spark.query import phrase_prefix_search

    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    cf: Counter = Counter()
    for t in toks.values():
        cf.update(t)
    # a 1-char prefix with several completions
    first_chars = Counter(t[0] for t in cf)
    ch = first_chars.most_common(1)[0][0]
    top = sorted((t for t in cf if t.startswith(ch)),
                 key=lambda t: (-cf[t], t))[0]
    golden = []
    for d in sorted(toks):
        cnt = sum(1 for t in toks[d] if t == top)
        if cnt:
            golden.append((ch, d, cnt))
    golden = pd.DataFrame(
        golden, columns=["phrase", "doc_id", "n_occurrences"])

    got = (phrase_prefix_search(pos_index, [ch], max_expansions=1)
           .toPandas().sort_values(["phrase", "doc_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_occurrences": "int64"}),
        golden.astype({"n_occurrences": "int64"}),
    )

def test_term_positions_within_docs_differential(pos_index, docs_pdf,
                                                 queries):
    """Block-targeted filtered decode == full decode filtered afterwards,
    including docs spanning block boundaries (fixture block_size=16) and
    absent doc ids."""
    from full_text_index_spark.query import term_positions

    terms = sorted({t for _, ts in queries for t in ts})
    full = (term_positions(pos_index, terms).toPandas()
            .sort_values(["term", "doc_id", "tpos"]).reset_index(drop=True))
    some_docs = sorted(set(full["doc_id"]))[::7] + [10**12]  # + absent id
    filt = (term_positions(pos_index, terms, within_docs=some_docs)
            .toPandas().sort_values(["term", "doc_id", "tpos"])
            .reset_index(drop=True))
    expect = (full[full["doc_id"].isin(set(some_docs))]
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(filt, expect)
    assert len(filt) > 0


# ---------------------------------------------------------------------------
# ADVICE r04 regression tests
# ---------------------------------------------------------------------------

def test_phrase_prefix_all_dead_prefixes_returns_empty(pos_index):
    """A batch where EVERY phrase is a single-token prefix with no
    dictionary completion must return an empty frame, not raise
    CANNOT_INFER_EMPTY_SCHEMA on the empty slots table (ADVICE r04)."""
    from full_text_index_spark.query import phrase_prefix_search

    got = phrase_prefix_search(pos_index, ["zzzzqq", "qqzzy"]).toPandas()
    assert len(got) == 0
    assert list(got.columns) == ["phrase", "doc_id", "n_occurrences"]


def test_collapse_topk_keeps_ungrouped_docs(tiny_index, docs_pdf, qdf,
                                            queries):
    """Docs absent from doc_groups collapse under a NULL group instead of
    vanishing from results (Elasticsearch missing-collapse-field
    semantics, ADVICE r04)."""
    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    doclen = {d: len(t) for d, t in toks.items()}
    k, per_group = 10, 2

    golden = []
    for qid, terms in queries:
        scores = _scores_for(terms, tf, df, doclen, avgdl, n)
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], RANK_ROUND), kv[0])
        )
        kept, per_g = [], Counter()
        for d, s in ranked:
            # odd docs are ungrouped -> ES null group (one shared bucket)
            g = _group_of(d) if d % 2 == 0 else None
            if per_g[g] < per_group:
                per_g[g] += 1
                kept.append((d, g, s))
        for r, (d, g, s) in enumerate(kept[:k], start=1):
            golden.append((qid, r, d, g, s))
    golden = pd.DataFrame(
        golden, columns=["qid", "rank", "doc_id", "group", "score"]
    )
    assert golden["group"].isna().any()   # the fixture exercises the branch

    groups = (
        tiny_index.doc_stats()
        .where(F.col("doc_id") % 2 == 0)   # odd docs intentionally missing
        .select(
            "doc_id",
            F.concat(F.lit("src"), (F.col("doc_id") % 3).cast("string"))
            .alias("group"),
        )
    )
    got = (
        collapse_topk(tiny_index, qdf, groups, k=k, per_group=per_group)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == golden["doc_id"].tolist()
    assert [g if pd.notna(g) else None for g in got["group"]] == \
        golden["group"].where(golden["group"].notna(), None).tolist()
    np.testing.assert_allclose(got["score"], golden["score"], rtol=1e-9)


def test_boolean_search_null_role_arrays(tiny_index, docs_pdf, spark):
    """NULL role arrays behave exactly like [] (ADVICE r04): a null-must
    query with should terms matches, and null must AND should still
    raises the pure-negative error."""
    from full_text_index_spark.query import boolean_search

    toks, tf, df, avgdl, n = _all_scores(docs_pdf)
    by_rank = [t for t, _ in Counter(
        {t: c for t, c in df.items()}).most_common()]
    a = by_rank[0]

    qdf = spark.createDataFrame(
        [(0, None, [a], None)],
        "qid long, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    got = boolean_search(tiny_index, qdf).toPandas()
    expect = sorted(d for d, c in tf.items() if a in c)
    assert sorted(got["doc_id"]) == expect

    bad = spark.createDataFrame(
        [(1, None, None, [a])],
        "qid long, must array<string>, should array<string>, "
        "must_not array<string>",
    )
    with pytest.raises(ValueError, match="pure-negative"):
        boolean_search(tiny_index, bad)


def test_best_windows_linear_on_pathological_tf(spark, tmp_path):
    """One doc with tf≈10⁴ of a query term must NOT create a quadratic
    (10⁸-row) group (VERDICT r04 #4 — the old anchors×occurrences
    self-join did).  The linear sweep finishes fast and still picks the
    analytically-known best window."""
    import time as _time

    from full_text_index_spark.query import best_passage

    N, W = 10_000, 16
    text = "alpha " * N + "beta " + "alpha " * 10
    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "url": ["u://0", "u://1"],
        "text": [text.strip(), "alpha beta gamma"],
    })
    root = str(tmp_path / "skewidx")
    build_index(spark, prepare_corpus(spark.createDataFrame(pdf)), root,
                n_segments=2, block_size=64, positions=True)
    idx = InvertedIndex.open(spark, root)
    q = spark.createDataFrame([(0, ["alpha", "beta"])],
                              "qid long, terms array<string>")
    t0 = _time.perf_counter()
    got = {r["doc_id"]: r for r in best_passage(idx, q, width=W).collect()}
    wall = _time.perf_counter() - t0
    # alpha at tpos 1..N, beta at N+1, alpha at N+2..N+11: every window
    # containing beta has n_terms=2 and n_occ=W (all positions occupied);
    # smallest such start is N+1-(W-1)
    assert got[0]["start"] == N + 1 - (W - 1)
    assert got[0]["n_terms"] == 2
    assert got[0]["n_occ"] == W
    assert got[1]["start"] == 1 and got[1]["n_terms"] == 2
    assert wall < 60, f"pathological-tf best_passage took {wall:.1f}s"


def test_search_page_composes_its_parts(pos_index, docs_pdf, qdf, queries,
                                        spark):
    """The composed page must equal its four parts run separately:
    ranked_snippets rows, facet_counts sidebar strings, suggest_terms
    completion strings (VERDICT r04 #7 — composition may share work but
    never change results)."""
    from full_text_index_spark.query import (
        facet_counts,
        ranked_snippets,
        search_page,
        suggest_terms,
    )

    docs = pos_index.spark.createDataFrame(
        docs_pdf[["doc_id", "text"]]
    )
    facets = pos_index.doc_stats().select(
        "doc_id",
        F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string"))
        .alias("facet"),
    )
    prefix_of = {qid: terms[0][:2] for qid, terms in queries}
    qp = spark.createDataFrame(
        [(qid, terms, prefix_of[qid]) for qid, terms in queries],
        "qid long, terms array<string>, prefix string",
    )
    got = (search_page(pos_index, docs, facets, qp, k=5, width=8,
                       n_suggest=3)
           .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True))

    rs = (ranked_snippets(pos_index, docs, qdf, k=5, width=8)
          .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["qid", "rank", "doc_id", "score", "start", "n_terms", "n_occ",
             "snippet"]].astype({"rank": "int64"}),
        rs.astype({"rank": "int64"}),
    )

    fc = facet_counts(pos_index, facets, qdf).toPandas()
    want_facets = {
        qid: "|".join(sorted(f"{r.facet}:{int(r.n_docs)}"
                             for r in g.itertuples()))
        for qid, g in fc.groupby("qid")
    }
    st = suggest_terms(
        pos_index, sorted(set(prefix_of.values())), k=3
    ).toPandas()
    want_sugg = {
        pref: "|".join(g.sort_values("rank")["term"])
        for pref, g in st.groupby("prefix")
    }
    for row in got.itertuples():
        assert row.facets == want_facets.get(row.qid, "")
        assert row.suggestions == want_sugg.get(prefix_of[row.qid], "")
    assert (got["facets"] != "").any() and (got["suggestions"] != "").any()


def test_best_windows_fuzz_vs_bruteforce(spark):
    """Randomized differential for the linear `_best_windows` sweep: the
    brute-force window evaluation (every anchor × every occurrence) is the
    oracle.  Covers duplicate positions across terms (two terms at the same
    tpos), singleton groups, dense clusters and sparse tails — the cases
    where the searchsorted/difference-array bookkeeping could drift."""
    import random

    from full_text_index_spark.query import _best_windows

    rng = random.Random(4242)
    for width in (1, 3, 8):
        rows, want = [], {}
        for g in range(40):
            n_terms_pool = rng.randint(1, 4)
            terms = [f"t{i}" for i in range(n_terms_pool)]
            n_occ = rng.randint(1, 30)
            span = rng.choice([5, 12, 40, 200])
            occ = sorted(
                {(rng.randint(1, span), rng.choice(terms)) for _ in range(n_occ)}
            )
            for p, t in occ:
                rows.append((0, g, t, p))
            best = None
            for s, _ in occ:
                in_w = [(p, t) for p, t in occ if s <= p < s + width]
                key = (len({t for _, t in in_w}), len(in_w), -s)
                if best is None or key > best[0]:
                    best = (key, s)
            k, s = best
            want[(0, g)] = (s, k[0], k[1])
        occ_df = spark.createDataFrame(
            rows, "qid long, doc_id long, term string, tpos long"
        )
        got = {
            (r["qid"], r["doc_id"]): (r["start"], r["n_terms"], r["n_occ"])
            for r in _best_windows(occ_df, width).collect()
        }
        assert got == want, f"width={width}"
