"""SQL surface: ``match(col, 'query')`` must be answered FROM THE INDEX —
the rewritten plan semi-joins postings-derived doc ids and never reads the
text column for filtering (VERDICT r03 missing #3)."""

from __future__ import annotations

import contextlib
import io

import pytest

from full_text_index_spark.sql import MatchRewriter
from full_text_index_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def docs_parquet(spark, small_docs, tmp_path_factory):
    """documents as a real parquet scan so EXPLAIN shows ReadSchema."""
    path = str(tmp_path_factory.mktemp("sqldocs") / "docs.parquet")
    small_docs.write.parquet(path)
    return path


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_match_results_equal_naive_filter(spark, tiny_index, small_docs,
                                          docs_parquet):
    spark.read.parquet(docs_parquet).createOrReplaceTempView("docs_sql")
    rw = MatchRewriter(spark, tiny_index)
    df = rw.sql(
        "SELECT doc_id, url FROM docs_sql "
        "WHERE match(text, 'bababa0 cebaba1') ORDER BY doc_id"
    )
    got = [r["doc_id"] for r in df.collect()]
    rows = small_docs.select("doc_id", "text").collect()
    want = sorted(
        r["doc_id"] for r in rows
        if {"bababa0", "cebaba1"} <= set(tokenize_py(r["text"]))
    )
    assert got == want
    assert got, "probe terms must actually co-occur in the fixture"


def test_match_plan_is_postings_semijoin_no_text_scan(spark, tiny_index,
                                                      docs_parquet):
    spark.read.parquet(docs_parquet).createOrReplaceTempView("docs_sql")
    rw = MatchRewriter(spark, tiny_index)
    df = rw.sql(
        "SELECT url FROM docs_sql WHERE match(text, 'bababa0 cebaba1')"
    )
    plan = _plan_of(df)
    # the match side reads the index's postings parquet...
    assert "postings" in plan, plan
    # ...joined as a semi join (IN-subquery → LeftSemi)
    assert "LeftSemi" in plan, plan
    # ...and the documents scan never reads the text column: every scan of
    # the docs parquet prunes to (doc_id, url)
    segments = plan.split("\n\n")
    doc_scans = [s for s in segments if "sqldocs" in s and "ReadSchema" in s]
    assert doc_scans, plan
    for s in doc_scans:
        read_schema = [ln for ln in s.splitlines() if "ReadSchema" in ln]
        assert read_schema and all("text" not in ln for ln in read_schema), s


def test_match_multiple_predicates_and_absent_terms(spark, tiny_index,
                                                    small_docs, docs_parquet):
    spark.read.parquet(docs_parquet).createOrReplaceTempView("docs_sql")
    rw = MatchRewriter(spark, tiny_index)
    toks = {
        r["doc_id"]: set(tokenize_py(r["text"]))
        for r in small_docs.select("doc_id", "text").collect()
    }
    # two match() predicates in one query combine like any SQL predicates —
    # use a rarer second term so the difference set is non-empty
    rare = "singletonterm0"
    df = rw.sql(
        "SELECT doc_id FROM docs_sql "
        f"WHERE match(text, 'bababa0') AND NOT match(text, '{rare}')"
    )
    ids = {r["doc_id"] for r in df.collect()}
    want = {d for d, ts in toks.items() if "bababa0" in ts and rare not in ts}
    assert ids == want and ids
    # a vocabulary miss yields an empty result, not an error
    assert rw.sql(
        "SELECT doc_id FROM docs_sql WHERE match(text, 'zzzmissing')"
    ).count() == 0


def test_match_rejects_empty_query(spark, tiny_index):
    rw = MatchRewriter(spark, tiny_index)
    with pytest.raises(ValueError, match="no terms"):
        rw.rewrite("SELECT 1 FROM t WHERE match(text, '...')")


def test_match_rejects_wrong_column(spark, tiny_index):
    """One index covers one text column: match(title, ...) against a
    text-column rewriter must raise, not silently answer for `text`."""
    rw = MatchRewriter(spark, tiny_index)
    with pytest.raises(ValueError, match="covers column 'text'"):
        rw.rewrite("SELECT 1 FROM t WHERE match(title, 'alpha')")
    # qualified references to the indexed column still pass
    assert "IN (SELECT doc_id" in rw.rewrite(
        "SELECT 1 FROM t WHERE match(t.text, 'alpha')"
    )


def test_match_any_and_phrase(spark, tiny_index, small_docs, docs_parquet):
    spark.read.parquet(docs_parquet).createOrReplaceTempView("docs_sql")
    rows = small_docs.select("doc_id", "text").collect()
    toks = {r["doc_id"]: set(tokenize_py(r["text"])) for r in rows}
    rw = MatchRewriter(spark, tiny_index, corpus=small_docs)

    got_any = {
        r["doc_id"]
        for r in rw.sql(
            "SELECT doc_id FROM docs_sql "
            "WHERE match_any(text, 'singletonterm0 cebaba1')"
        ).collect()
    }
    want_any = {d for d, ts in toks.items()
                if "singletonterm0" in ts or "cebaba1" in ts}
    assert got_any == want_any and got_any

    # phrase: pick a raw adjacent word pair that tokenization round-trips
    # (phrase_search verifies against RAW text, token-anchored)
    phrase = None
    for r in rows:
        words = r["text"].split(" ")
        for a, b in zip(words, words[1:]):
            if (a and b and a == "".join(tokenize_py(a))
                    and b == "".join(tokenize_py(b))):
                phrase = f"{a} {b}"
                break
        if phrase:
            break
    assert phrase is not None
    got_ph = {
        r["doc_id"]
        for r in rw.sql(
            f"SELECT doc_id FROM docs_sql WHERE match_phrase(text, '{phrase}')"
        ).collect()
    }
    # phrase_search's verify rule: token-anchored RAW-text substring
    want_ph = {r["doc_id"] for r in rows if f" {phrase} " in f" {r['text']} "}
    assert got_ph == want_ph and got_ph

    # phrase without a corpus is a clear error, not silence
    with pytest.raises(ValueError, match="needs the corpus"):
        MatchRewriter(spark, tiny_index).rewrite(
            "SELECT 1 FROM t WHERE match_phrase(text, 'a b')"
        )


def test_match_phrase_case_and_custom_columns(spark, tmp_path):
    """match_phrase must honor the tokenizer's normalization (an
    uppercase query matches lowercase text, like match()) and the
    rewriter's configured id/text column names."""
    import pandas as pd
    from pyspark.sql import functions as F

    from full_text_index_spark.build import build_index, prepare_corpus
    from full_text_index_spark.index import InvertedIndex
    from full_text_index_spark.sql import MatchRewriter

    pdf = pd.DataFrame({
        "url": ["http://s/1", "http://s/2"],
        "text": ["join hash strategies", "hash only here"],
    })
    root = str(tmp_path / "sqlidx")
    corpus = prepare_corpus(spark.createDataFrame(pdf))
    build_index(spark, corpus, root, n_segments=2, block_size=16)
    idx = InvertedIndex.open(spark, root)
    renamed = corpus.select(
        F.col("doc_id").alias("id"), F.col("text").alias("body")
    )
    renamed.createOrReplaceTempView("docs_cc")
    rw = MatchRewriter(spark, idx, corpus=renamed, id_col="id",
                       text_col="body")
    got = {
        r["id"]
        for r in rw.sql(
            "SELECT id FROM docs_cc WHERE match_phrase(body, 'Join Hash')"
        ).collect()
    }
    want = {
        r["doc_id"]
        for r in corpus.where(F.col("text").contains("join hash")).collect()
    }
    assert got == want and got
