"""The three tokenizer renderings (Spark Column / Python / DuckDB SQL) must
agree byte-for-byte on messy input — the whole differential-oracle method
rests on this (SURVEY.md §5; compare.c's exact-equality discipline)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from full_text_index_spark.tokenizer import tokenize_py, tokens_col, tokens_sql

CASES = [
    "plain lowercase words",
    "MiXeD CaSe And UPPER",
    "punct,u.at;io:n! and (brackets) [too] {yes}",
    "digits 123 mix3d t0kens 00 7",
    "  leading and trailing   ",
    "tabs\tand\nnewlines\r\nmixed",
    "unicode séparé naïve café 北京 привет",
    "hyphen-ated under_scored dot.ted",
    "",
    "!!!",
    "a",
]


@pytest.mark.parametrize("text", CASES)
def test_three_renderings_agree(spark, text):
    py = tokenize_py(text)

    df = spark.createDataFrame([(text,)], "text string")
    spark_toks = df.select(tokens_col(F.col("text")).alias("t")).first()["t"]

    con = duckdb.connect()
    sql_toks = [
        r[0]
        for r in con.execute(
            f"SELECT unnest(list_filter({tokens_sql('?')}, t -> t <> ''))",
            [text],
        ).fetchall()
    ]
    assert list(spark_toks) == py, f"spark != py on {text!r}"
    assert sql_toks == py, f"duckdb != py on {text!r}"
