"""Corpus-level boilerplate removal (CCNet-style paragraph dedup): a
text segment repeated across ≥ min_df distinct documents is boilerplate
(headers, footers, cookie banners, license blurbs) and is stripped from
every document, preserving the order of what remains.

Webtext splits on newlines; the synthetic corpus has none, so the
segmenter is a fixed-width token chunker (``chunk_w`` tokens per
segment, trailing partial chunk kept) — the df-count / anti-join /
reassembly dataflow is identical either way and ``segment_chunks`` is
the only piece a newline corpus would swap out.

Scale path: one explode → one distinct+groupBy for segment df.  The
boilerplate set is by construction the df-head of the segment
distribution — tiny relative to the corpus at any scale (raising min_df
with corpus size keeps it so) — so membership is a BROADCAST left-anti
join: documents re-aggregate without shuffling their segments against a
segment-keyed table.  Reassembly is one groupBy(doc_id) carrying only
kept segments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_W = 3
DEFAULT_MIN_DF = 5


def segment_chunks(text: Column, chunk_w: int = DEFAULT_CHUNK_W) -> Column:
    """array<string> of ceil(n_tokens/chunk_w) fixed-width token chunks
    (last one may be short).  Guarded for empty token arrays: Spark's
    sequence(0, -1) would count DOWN, not produce an empty array."""
    toks = F.split(text, " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_w)).cast("int")
    return F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * chunk_w + 1, chunk_w)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def boilerplate_segments(
    docs: DataFrame,
    chunk_w: int = DEFAULT_CHUNK_W,
    min_df: int = DEFAULT_MIN_DF,
) -> DataFrame:
    """(seg, df) for every segment appearing in ≥ min_df distinct docs."""
    return (
        docs.select(
            "doc_id", F.explode(segment_chunks(F.col("text"), chunk_w)).alias("seg")
        )
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )


def remove_boilerplate(
    docs: DataFrame,
    chunk_w: int = DEFAULT_CHUNK_W,
    min_df: int = DEFAULT_MIN_DF,
) -> DataFrame:
    """(doc_id, clean_text, n_chunks_removed): every document with its
    boilerplate segments stripped (order of survivors preserved; a doc
    that was ALL boilerplate keeps an empty clean_text row).

    Two corpus scans, not three: the boilerplate df-count needs its own
    pass, but totals ride on the SAME exploded rows as the survivors — a
    broadcast left join tags boilerplate segments and one groupBy derives
    clean_text, n_total and n_kept together (posexplode_outer keeps
    zero-chunk docs in the aggregate, which a plain posexplode would
    drop)."""
    boiler = boilerplate_segments(docs, chunk_w, min_df).select(
        "seg", F.lit(True).alias("_boiler")
    )
    segs = docs.select(
        "doc_id",
        F.posexplode_outer(
            segment_chunks(F.col("text"), chunk_w)
        ).alias("pos", "seg"),
    )
    survivor = F.col("_boiler").isNull() & F.col("seg").isNotNull()
    return (
        segs.join(F.broadcast(boiler), "seg", "left")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    # when() without otherwise → NULL for boilerplate rows,
                    # which collect_list drops
                    F.array_sort(
                        F.collect_list(F.when(survivor, F.struct("pos", "seg")))
                    ),
                    lambda x: x["seg"],
                ),
            ).alias("clean_text"),
            (F.count("seg") - F.count(F.when(survivor, F.lit(1))))
            .cast("long")
            .alias("n_chunks_removed"),
        )
        .select("doc_id", "clean_text", "n_chunks_removed")
    )
