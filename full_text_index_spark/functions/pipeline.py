"""End-to-end training-data curation: the composition a corpus-cleaning
pipeline actually runs in front of indexing — quality gate, language gate,
exact dedup — as ONE declarative DataFrame plan.

The reference engine stops at index/query (SURVEY.md §2); this module is
part of the training-data-pipeline surface layered on top.  Each stage is
the already-verified operator (textstats.quality_score, textstats.lang_id,
dedup.exact_dedup); the pipeline only joins their outputs on doc_id and
folds the keep/drop decision into columns, so Catalyst sees one plan and
can share the documents scan across stages.

Scale: three joins on doc_id over same-partitioned aggregates; no stage
collects to the driver.  The dedup stage's groupBy(md5) is the only
content-keyed shuffle; quality/lang are per-row column expressions that
stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from full_text_index_spark.functions.dedup import exact_dedup
from full_text_index_spark.functions.textstats import lang_id, quality_score

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
    q = quality_score(docs).select(
        "doc_id", "n_tokens", "uniq_ratio_i", "stop_ratio_i"
    )
    lang = lang_id(docs).select("doc_id", "lang_pred")
    dd = exact_dedup(docs).select("doc_id", "is_duplicate", "group_size")
    joined = (
        docs.select("doc_id")
        .join(dd, "doc_id")
        .join(q, "doc_id", "left")  # n_tokens==0 docs have no quality row
        .join(lang, "doc_id")
    )
    quality_fail = (
        F.col("n_tokens").isNull()
        | (F.col("n_tokens") < MIN_TOKENS)
        | (F.col("uniq_ratio_i") < MIN_UNIQ_I)
        | (F.col("stop_ratio_i") > MAX_STOP_I)
    )
    reason = (
        F.when(F.col("is_duplicate"), F.lit("dup"))
        .when(quality_fail, F.lit("quality"))
        .when(F.col("lang_pred") == "und", F.lit("lang"))
        .otherwise(F.lit("ok"))
    )
    return joined.select(
        "doc_id",
        (reason == "ok").alias("keep"),
        reason.alias("reason"),
        "lang_pred",
        F.coalesce("n_tokens", F.lit(0)).cast("int").alias("n_tokens"),
        F.coalesce("uniq_ratio_i", F.lit(0)).alias("uniq_ratio_i"),
        F.coalesce("stop_ratio_i", F.lit(0)).alias("stop_ratio_i"),
        "group_size",
    )
