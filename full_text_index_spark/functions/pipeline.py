"""End-to-end training-data curation: the composition a corpus-cleaning
pipeline actually runs in front of indexing — quality gate, language gate,
exact dedup — as ONE declarative DataFrame plan.

The reference engine stops at index/query (SURVEY.md §2); this module is
part of the training-data-pipeline surface layered on top.  The feature
expressions are shared with the standalone operators
(textstats.quality_feature_cols / lang_score_cols / lang_pred_expr), but
the pipeline FUSES them: ONE scan of documents computes md5 + quality
features + language scores in a single codegen'd projection, and the
dedup group statistics (canonical id, group size) come from a window over
content_key — ONE hash exchange, no joins.  The naive composition (call
each verified op, join on doc_id) planned 10 parquet scans and 10
exchanges at 500 docs; at 100 TB that is 10 reads of the corpus for a
single-pass problem.

Scale: scan → project → Exchange(content_key) → window → project.  The
only shuffle carries (doc_id, content_key, 5 ints, lang_pred) — no text —
so its volume is ~40 bytes/doc regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from full_text_index_spark.functions.textstats import (
    lang_pred_expr,
    lang_score_cols,
    quality_feature_cols,
)

# Deterministic gates (integer-scaled ×10^4 like the feature columns).
MIN_TOKENS = 15       # shorter docs carry too little signal
MIN_UNIQ_I = 3200     # unique-token ratio below 0.32 → boilerplate/spam
MAX_STOP_I = 1500     # stopword ratio above 0.15 → low-content filler


def curate(docs: DataFrame) -> DataFrame:
    """Per-doc curation verdict: keep boolean + first failing gate.

    Gate precedence (first hit wins): ``dup`` (not the canonical copy of
    its content group) → ``quality`` (MIN_TOKENS / MIN_UNIQ_I /
    MAX_STOP_I) → ``lang`` (trigram language ID says 'und') → ``ok``.

    Output: (doc_id, keep, reason, lang_pred, n_tokens, uniq_ratio_i,
    stop_ratio_i, group_size) for every input doc — the audit table a
    curation run keeps, not just the survivors."""
    feat = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_key"),
        *quality_feature_cols(),
        *lang_score_cols(),
    ).select(
        "doc_id", "content_key", "n_tokens", "uniq_ratio_i", "stop_ratio_i",
        lang_pred_expr().alias("lang_pred"),
    )
    w = Window.partitionBy("content_key")
    grouped = feat.select(
        "*",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    )
    quality_fail = (
        (F.col("n_tokens") < MIN_TOKENS)
        | (F.col("uniq_ratio_i") < MIN_UNIQ_I)
        | (F.col("stop_ratio_i") > MAX_STOP_I)
    )
    reason = (
        F.when(F.col("doc_id") != F.col("canonical_id"), F.lit("dup"))
        .when(quality_fail, F.lit("quality"))
        .when(F.col("lang_pred") == "und", F.lit("lang"))
        .otherwise(F.lit("ok"))
    )
    return grouped.select(
        "doc_id",
        (reason == "ok").alias("keep"),
        reason.alias("reason"),
        "lang_pred",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "uniq_ratio_i",
        "stop_ratio_i",
        "group_size",
    )
