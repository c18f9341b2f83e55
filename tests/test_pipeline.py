"""Curation pipeline (functions/pipeline.curate): gate precedence and the
edge cases the parity fixture can't produce — exact duplicates (the
synthetic corpus has none) and zero-token docs (no quality row)."""

import pandas as pd

from full_text_index_spark.functions.pipeline import (
    MAX_STOP_I,
    MIN_TOKENS,
    MIN_UNIQ_I,
    curate,
)


# 17 distinct tokens, 0 stopwords, en-trigram score 10 (unique max) —
# passes all three gates
GOOD = ("weathered lighthouse keepers singing beyond distant anchored "
        "mountains thermal winds echo grand canyons beneath golden "
        "themes tonight")


def _docs(spark, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    return spark.createDataFrame(pdf)


def test_curate_gate_precedence_and_edges(spark):
    rows = [
        (0, GOOD, "en"),                      # ok
        (1, GOOD, "en"),                      # exact dup of 0 → dup
        (2, "tiny doc", "en"),                # < MIN_TOKENS → quality
        (3, "", "en"),                        # zero tokens → quality (null row)
        (4, ("spam " * 40).strip(), "en"),    # uniq ratio 1/40 → quality
        (5, "zzqx vvkk wwjj qqpp mmnn bbcc ddff gghh jjkk llrr ttyy uuii "
            "ooaa sseE rrtt nnmm", "en"),     # no profile trigram → lang
    ]
    got = (
        curate(_docs(spark, rows))
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[0, "reason"] == "ok" and bool(got.loc[0, "keep"])
    # doc 1 duplicates doc 0: dup outranks every later gate; canonical kept
    assert got.loc[1, "reason"] == "dup" and not bool(got.loc[1, "keep"])
    assert int(got.loc[0, "group_size"]) == 2
    assert got.loc[2, "reason"] == "quality"
    assert got.loc[3, "reason"] == "quality" and int(got.loc[3, "n_tokens"]) == 0
    assert got.loc[4, "reason"] == "quality"
    assert int(got.loc[4, "uniq_ratio_i"]) < MIN_UNIQ_I
    assert got.loc[5, "reason"] == "lang"
    # every input doc got a verdict row (audit table, not just survivors)
    assert len(got) == len(rows)


def test_curate_thresholds_are_integer_scaled(spark):
    # the gates compare against the same x10^4 integer features the
    # standalone quality_score op emits — no float thresholds anywhere
    assert MIN_TOKENS == 15 and MIN_UNIQ_I == 3200 and MAX_STOP_I == 1500
    got = curate(_docs(spark, [(0, GOOD, "en")])).toPandas()
    assert set(got.columns) == {
        "doc_id", "keep", "reason", "lang_pred", "n_tokens",
        "uniq_ratio_i", "stop_ratio_i", "group_size",
    }
