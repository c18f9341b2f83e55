"""Index-accelerated arbitrary-substring search: character k-gram postings.

The reference's whole reason to exist is substring search over ANY byte
pattern — ``count``/``locate`` (reference: utils/interface.h:59-66) answer
case- and punctuation-bearing patterns that cross token boundaries straight
from the compact structure (backward search, ssa/SSA.cpp:242-261), and its
workload generator samples raw substrings (utils/genpatterns.c:196-218).
The token index can't see those patterns; the round-1 fallback (a full
corpus scan per batch) rescans the text the index exists to avoid.

This module is the Spark-native substring self-index:

* **Build** — the SAME SPIMI pipeline as the token index (build.build_index)
  fed a *character k-gram stream*: every text position contributes
  ``(doc_id, gram = text[i:i+k], cpos = i)``, case-preserving, punctuation
  and whitespace included.  Positions pack into the existing delta-gap +
  varbyte positional stream, so a gram index is just an inverted index whose
  "terms" are k-char substrings — one wide (segment, gram) shuffle, parquet
  segments, manifests, resumability all inherited.

* **Query** — for a pattern P of length L ≥ k, every window
  ``g_i = P[i:i+k]`` (i = 0..L−k) must occur at aligned position p+i.  If
  all windows align, every char of P is covered, so the match is EXACT — no
  text access, no verify scan.  The plan is one join of decoded gram
  positions against a broadcast (pattern, slot, gram) table + one
  aggregation (the batched phrase plan over chars instead of tokens);
  constant stage count for any number of patterns.

* **Adaptive cutover** — ``substring_search`` keeps the whole-corpus scan
  for tiny corpora or patterns shorter than k, the SMALLFILESIZE analog
  (reference: fm/fm_index.h:20-22 — Boyer–Moore scan below a size cutoff,
  fm/fm_search.c:417-498), with IDENTICAL overlapping-occurrence semantics
  so the two paths are interchangeable.

Scale: gram postings are ~L rows per doc pre-aggregation — the cost of any
positional substring index (the reference's suffix arrays are 4-8 bytes per
text byte; the packed gram stream lands at ~2-3 bytes/char).  Queries touch
only the L−k+1 gram rows per segment (parquet predicate pushdown on the
sorted ``term`` column), so query cost scales with posting-list length, not
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_text_index_spark.build import IndexPaths, build_index
from full_text_index_spark.index import InvertedIndex
from full_text_index_spark.query import term_positions

GRAM_K_DEFAULT = 3
# adaptive cutover (fm/fm_index.h:20-22 SMALLFILESIZE analog): below this
# many corpus text bytes a codegen'd scan beats touching the gram index
SMALL_CORPUS_BYTES = 64 * 1024


def make_gram_stream(k: int):
    """A build stream producing (doc_id, segment, term=k-gram, tpos=1-based
    char position) — raw text, case-preserving (the reference's memcmp
    semantics, sau/SAu.c:70-86)."""

    def stream(docs: DataFrame) -> DataFrame:
        t = F.col("text")
        grams = F.when(
            F.length(t) >= k,
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (k - 1)),
                lambda i: t.substr(i, F.lit(k)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        carry = [c for c in ("doclen",) if c in docs.columns]
        return (
            docs.select(
                "doc_id", "segment", *carry,
                F.posexplode(grams).alias("p0", "term"),
            )
            .withColumn("tpos", F.col("p0") + 1)
            .drop("p0")
        )

    return stream


def build_gram_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    *,
    k: int = GRAM_K_DEFAULT,
    n_segments: int = 32,
    block_size: int = 128,
    **kwargs,
) -> IndexPaths:
    """Build the character k-gram substring index (positions are mandatory —
    they ARE the payload)."""
    return build_index(
        spark, corpus, out_dir,
        n_segments=n_segments, block_size=block_size, positions=True,
        stream=make_gram_stream(k), unit=f"chargram-{k}", **kwargs,
    )


def append_gram_generation(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    generation: int,
    *,
    k: int = GRAM_K_DEFAULT,
    n_segments: int = 32,
    block_size: int = 128,
) -> None:
    """Incrementally append documents to an existing k-gram substring index
    (generation-disjoint, idempotent — streaming.append_generation with the
    char-gram stream).  The reference's indexes are immutable
    (utils/interface.h:34-44); here new text becomes substring-searchable
    without rebuilding the old generations."""
    from full_text_index_spark.streaming import append_generation

    append_generation(
        spark, docs, out_dir, generation,
        n_segments=n_segments, block_size=block_size, positions=True,
        stream=make_gram_stream(k), unit=f"chargram-{k}",
    )


def _gram_k(index: InvertedIndex) -> int:
    unit = index.meta.get("unit", "token")
    if not unit.startswith("chargram-"):
        raise ValueError(
            f"substring search needs a chargram index (unit={unit!r}); "
            "build one with build_gram_index"
        )
    return int(unit.split("-", 1)[1])


def substring_locate(index: InvertedIndex, patterns: list[str]) -> DataFrame:
    """`locate` for arbitrary substrings (reference: utils/interface.h:66):
    every exact, case-sensitive, OVERLAPPING occurrence as
    (pattern, doc_id, cpos) with cpos the 1-based character position —
    answered entirely from the k-gram postings (no text access).

    Patterns shorter than the index's k are rejected — route them through
    the scan path (scan_substring_locate / substring_search)."""
    k = _gram_k(index)
    spark = index.spark
    slot_rows = []
    for p in patterns:
        if len(p) < k:
            raise ValueError(
                f"pattern {p!r} shorter than gram size {k}; use the scan path"
            )
        for i in range(len(p) - k + 1):
            slot_rows.append((p, i, p[i:i + k], len(p) - k + 1))
    slots = spark.createDataFrame(
        slot_rows, "pattern string, slot int, term string, n_slots int"
    )
    grams = sorted({r[2] for r in slot_rows})
    gp = term_positions(index, grams)
    # aligned window start p0 = cpos − slot; a DISTINCT hit per slot means
    # every char of the pattern matched (windows cover all of P)
    return (
        gp.join(F.broadcast(slots), "term")
        .select(
            "pattern", "n_slots", "doc_id", "slot",
            (F.col("tpos") - F.col("slot")).alias("cpos"),
        )
        .groupBy("pattern", "n_slots", "doc_id", "cpos")
        .agg(F.count_distinct("slot").alias("n_hit"))
        .where(F.col("n_hit") == F.col("n_slots"))
        .select("pattern", "doc_id", "cpos")
    )


def _count_from_locate(located: DataFrame, patterns_df: DataFrame) -> DataFrame:
    agg = located.groupBy("pattern").agg(
        F.count_distinct("doc_id").alias("n_docs_matching"),
        F.count("*").alias("n_occurrences"),
    )
    return patterns_df.join(agg, "pattern", "left").select(
        "pattern",
        F.coalesce("n_docs_matching", F.lit(0)).alias("n_docs_matching"),
        F.coalesce("n_occurrences", F.lit(0)).alias("n_occurrences"),
    )


def substring_count(index: InvertedIndex, patterns: list[str]) -> DataFrame:
    """`count` for arbitrary substrings (reference: utils/interface.h:59):
    (pattern, n_docs_matching, n_occurrences) with OVERLAPPING occurrence
    counting; absent patterns report zeros."""
    pdf = index.spark.createDataFrame([(p,) for p in patterns], "pattern string")
    return _count_from_locate(substring_locate(index, patterns), pdf)


def scan_substring_locate(docs: DataFrame, patterns: list[str]) -> DataFrame:
    """Whole-corpus scan with IDENTICAL semantics to substring_locate
    (case-sensitive, overlapping, 1-based char positions) — the small-corpus
    branch of the adaptive strategy (fm/fm_search.c:417-498 analog).  One
    codegen'd pass over the text; no index required, any pattern length."""
    spark = docs.sparkSession
    pdf = spark.createDataFrame([(p,) for p in patterns], "pattern string")
    t, pat = F.col("text"), F.col("pattern")
    hits = F.when(
        (F.length(pat) >= 1) & (F.length(t) >= F.length(pat)),
        F.filter(
            F.sequence(F.lit(1), F.length(t) - F.length(pat) + 1),
            lambda i: t.substr(i, F.length(pat)) == pat,
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        docs.crossJoin(F.broadcast(pdf))
        .select("pattern", "doc_id", F.explode(hits).alias("cpos"))
        .withColumn("cpos", F.col("cpos").cast("long"))
    )


def scan_substring_count(docs: DataFrame, patterns: list[str]) -> DataFrame:
    """Scan-path count with the same output contract as substring_count."""
    pdf = docs.sparkSession.createDataFrame(
        [(p,) for p in patterns], "pattern string"
    )
    return _count_from_locate(scan_substring_locate(docs, patterns), pdf)


def substring_search(
    docs: DataFrame,
    index: InvertedIndex | None,
    patterns: list[str],
    *,
    small_corpus_bytes: int = SMALL_CORPUS_BYTES,
) -> DataFrame:
    """Adaptive substring locate (the reference's index-vs-scan choice,
    fm/fm_index.h:20-22): the scan path for tiny corpora, missing index, or
    patterns shorter than the gram size; the k-gram index otherwise.  Both
    paths share exact semantics, so the choice is purely a cost decision."""
    if index is None:
        return scan_substring_locate(docs, patterns)
    k = _gram_k(index)
    if any(len(p) < k for p in patterns):
        return scan_substring_locate(docs, patterns)
    corpus_bytes = index.meta.get("corpus_bytes")
    if corpus_bytes is not None and corpus_bytes < small_corpus_bytes:
        return scan_substring_locate(docs, patterns)
    return substring_locate(index, patterns)
