"""count / locate / extract / display parity + corpus invariants
(reference query classes: utils/interface.h:59-92; extractor invariant per
BASELINE.json input_hint)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from full_text_index_spark.build import prepare_corpus
from full_text_index_spark.corpus import extract_text
from full_text_index_spark.query import display, extract, term_count, term_locate
from full_text_index_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def corpus_df(spark, tiny_corpus_pdf):
    return prepare_corpus(spark.createDataFrame(tiny_corpus_pdf))


def test_extractor_byte_identity(corpus_df):
    """sha256(extract_text(html)) == sha256(text) for every url."""
    bad = (
        corpus_df.withColumn("re_text", extract_text(F.col("html")))
        .where(F.sha2(F.encode(F.col("re_text"), "UTF-8"), 256)
               != F.sha2(F.encode(F.col("text"), "UTF-8"), 256))
        .count()
    )
    assert bad == 0


def test_term_count_matches_brute_force(tiny_index, tiny_corpus_pdf):
    cf = Counter()
    df = Counter()
    for t in tiny_corpus_pdf["text"]:
        toks = tokenize_py(t)
        cf.update(toks)
        df.update(set(toks))
    probe = [max(cf, key=cf.get), "singletonterm0", "absentterm"]
    got = {r["term"]: (r["df"], r["cf"]) for r in term_count(tiny_index, probe).collect()}
    for t in probe:
        assert got[t] == (df.get(t, 0), cf.get(t, 0)), t


def test_term_locate_matches_brute_force(tiny_index, tiny_corpus_pdf):
    ds = tiny_index.doc_stats().select("url", "doc_id").toPandas()
    url2id = dict(zip(ds["url"], ds["doc_id"]))
    term = "singletonterm0"
    expected = {}
    for _, row in tiny_corpus_pdf.iterrows():
        c = Counter(tokenize_py(row["text"]))
        if term in c:
            expected[url2id[row["url"]]] = c[term]
    got = {r["doc_id"]: r["tf"] for r in term_locate(tiny_index, [term]).collect()}
    assert got == expected


def test_extract_bytewise(spark, corpus_df, tiny_corpus_pdf):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    for _, r in tiny_corpus_pdf.sample(10, random_state=3).iterrows():
        n = len(r["text"])
        fro = int(rng.integers(0, n))
        ln = int(rng.choice([10, 100]))
        rows.append((r["url"], fro, min(fro + ln - 1, n - 1)))
    intervals = spark.createDataFrame(rows, "url string, from_char int, to_char int")
    got = {r["url"]: r for r in extract(corpus_df, intervals).collect()}
    texts = dict(zip(tiny_corpus_pdf["url"], tiny_corpus_pdf["text"]))
    for url, fro, to in rows:
        assert got[url]["snippet"] == texts[url][fro: to + 1]


def test_display_all_occurrences_matches_brute_force(spark, tiny_index, corpus_df):
    """Snippet matrix (reference: utils/interface.h:81-92): one row per
    occurrence, char positions regex-verified, per-doc occurrence count ==
    the index's tf."""
    import re

    from full_text_index_spark.query import display_all_occurrences, term_locate

    def check(index, docs_df, term, numc):
        out = display_all_occurrences(index, docs_df, [term], numc=numc).toPandas()
        texts = {r["doc_id"]: r["text"] for r in docs_df.collect()}
        pat = re.compile(r"(?<![a-z0-9])" + term + r"(?![a-z0-9])")
        expected = []
        for d in sorted(texts):
            lt = texts[d].lower()
            for i, m in enumerate(pat.finditer(lt), start=1):
                p = m.start() + 1
                lo = max(p - numc, 1)
                expected.append((term, d, i, p,
                                 texts[d][lo - 1: lo - 1 + len(term) + 2 * numc]))
        got = sorted(
            (r.term, r.doc_id, r.occ_idx, r.cpos, r.snippet)
            for r in out.itertuples(index=False)
        )
        assert got == sorted(expected)
        # per-doc occurrence count equals the index tf (the locate invariant)
        tfs = {r["doc_id"]: r["tf"] for r in term_locate(index, [term]).collect()}
        assert out.groupby("doc_id").size().to_dict() == tfs
        return len(got)

    assert check(tiny_index, corpus_df.select("doc_id", "url", "text"),
                 "bababa0", 20) > 0

    # punctuation/case boundaries: "dup-licates" contributes a hit (dash is
    # a token boundary), "DUP." matches case-insensitively
    import pandas as pd

    from full_text_index_spark.build import build_index
    from full_text_index_spark.index import InvertedIndex

    punct = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "url": ["u://x1", "u://x2", "u://x3"],
        "text": ["Dup! dup, dup-licates and DUP.", "no hits here", "dup"],
    }))
    import tempfile

    root = tempfile.mkdtemp(prefix="dispidx_")
    build_index(spark, punct, root, n_segments=2, block_size=8)
    pidx = InvertedIndex.open(spark, root)
    assert check(pidx, punct, "dup", 10) == 5


def test_display_contains_term(spark, tiny_index, corpus_df):
    qdf = spark.createDataFrame([(0, ["singletonterm0"])], "qid long, terms array<string>")
    rows = display(tiny_index, corpus_df, qdf, numc=20, k=5).collect()
    assert len(rows) == 1
    assert "singletonterm0" in rows[0]["snippet"]


def test_extract_text_newline_docs(spark):
    """'.' must span line terminators ((?s)): text containing '\\n' would
    otherwise extract as '' with no error."""
    import pandas as pd

    pdf = pd.DataFrame({
        "html": [b"<html><body>line one\nline two</body></html>",
                 b"<html><body>plain</body></html>"],
        "text": ["line one\nline two", "plain"],
    })
    df = spark.createDataFrame(pdf)
    rows = df.withColumn("re_text", extract_text(F.col("html"))).collect()
    for r in rows:
        assert r["re_text"] == r["text"]
