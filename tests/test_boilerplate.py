"""Boilerplate removal: hand-built corpus with known repeated chunks,
order preservation, all-boilerplate docs, and chunker edge cases."""

import pyspark.sql.functions as F

from full_text_index_spark.functions.boilerplate import (
    boilerplate_segments,
    remove_boilerplate,
    segment_chunks,
)

BOILER = "subscribe to our newsletter"  # becomes chunks of w tokens


def _corpus(spark):
    # 6 docs share a footer; unique 6-token bodies keep the footer
    # CHUNK-ALIGNED (chunking is positional); one doc is ONLY the footer
    rows = []
    for i in range(6):
        body = " ".join(f"u{i}w{j}" for j in range(6))
        rows.append((i, body + " na nb nc"))
    rows.append((6, "na nb nc"))
    rows.append((7, "solo body doc without footer here"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunker_widths(spark):
    df = spark.createDataFrame([(0, "a b c d e f g")], "doc_id long, text string")
    (row,) = df.select(segment_chunks(F.col("text"), 3).alias("c")).collect()
    assert row.c == ["a b c", "d e f", "g"]


def test_boilerplate_detection(spark):
    docs = _corpus(spark)
    segs = {r.seg for r in boilerplate_segments(docs, chunk_w=3, min_df=5).collect()}
    assert "na nb nc" in segs
    assert not any(s.startswith("u0") for s in segs)


def test_removal_preserves_order_and_counts(spark):
    docs = _corpus(spark)
    out = {r.doc_id: r for r in remove_boilerplate(docs, 3, 5).collect()}
    assert len(out) == 8
    # footer chunk gone from every aligned doc, bodies survive in order
    assert out[0].clean_text == "u0w0 u0w1 u0w2 u0w3 u0w4 u0w5"
    assert out[0].n_chunks_removed == 1
    assert out[7].n_chunks_removed == 0
    # and the full expectation recomputed from the chunker itself:
    raw = docs.select(
        "doc_id", segment_chunks(F.col("text"), 3).alias("c")
    ).collect()
    boiler = {r.seg for r in boilerplate_segments(docs, 3, 5).collect()}
    for row in raw:
        want = " ".join(c for c in row.c if c not in boiler)
        assert out[row.doc_id].clean_text == want
        assert out[row.doc_id].n_chunks_removed == sum(
            1 for c in row.c if c in boiler
        )


def test_all_boilerplate_doc_keeps_empty_row(spark):
    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(5)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in remove_boilerplate(docs, 3, 5).collect()}
    assert len(out) == 5
    assert all(r.clean_text == "" and r.n_chunks_removed == 1 for r in out.values())


def test_below_threshold_untouched(spark):
    docs = _corpus(spark)
    out = remove_boilerplate(docs, chunk_w=3, min_df=50)
    joined = docs.join(out, "doc_id")
    assert joined.where(F.col("text") != F.col("clean_text")).count() == 0
    assert out.agg(F.sum("n_chunks_removed")).first()[0] == 0
