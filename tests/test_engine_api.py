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


def test_display_contains_term(spark, tiny_index, corpus_df):
    qdf = spark.createDataFrame([(0, ["singletonterm0"])], "qid long, terms array<string>")
    rows = display(tiny_index, corpus_df, qdf, numc=20, k=5).collect()
    assert len(rows) == 1
    assert "singletonterm0" in rows[0]["snippet"]
