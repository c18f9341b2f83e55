"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data-pipeline dedup over the same documents model the index uses.
All four are compositions of JVM-side DataFrame ops (higher-order array
functions; the only shuffles are the groupBys/self-joins inherent to the
algorithms).  Hashes are the deterministic cross-engine polynomial hash from
textstats.token_hash so the DuckDB oracle reproduces every signature exactly.

Scale notes: exact dedup is one hash-groupBy; shingle/minhash/simhash
self-joins are blocked by (band/bucket) keys so the join fan-out is bounded
by bucket size, the standard LSH trick for 10^12-row dedup; skewed buckets
are AQE-handled and can be salted by raising bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from full_text_index_spark.functions.textstats import HASH_P, token_hash
from full_text_index_spark.tokenizer import tokens_col

# minhash parameters — mirrored literally in the SQL oracle
MINHASH_FUNCS = 16
MINHASH_BANDS = 4  # 4 rows per band
MINHASH_SHINGLE = 3
JACCARD_SHINGLE = 5


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact content dedup by md5(text): every doc mapped to the canonical
    (min doc_id) member of its content group."""
    keyed = docs.select("doc_id", F.md5(F.col("text")).alias("content_key"))
    canon = keyed.groupBy("content_key").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        keyed.join(canon, "content_key")
        .select(
            "doc_id",
            "content_key",
            "canonical_id",
            "group_size",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


def _shingles(k: int):
    """array<string> of k-token shingles of the text's token array."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks) - (k - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n), lambda i: F.concat_ws(" ", F.slice(toks, i, k))
        ),
    ).otherwise(F.array().cast("array<string>"))


JACCARD_MAX_DF = 256  # shingles in more docs than this are dropped pre-join


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = JACCARD_SHINGLE, min_jaccard: float = 0.1,
    max_shingle_df: int = JACCARD_MAX_DF,
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over k-token shingle sets, blocked by
    shared shingle (docs sharing no shingle can't pass any threshold > 0).

    Scale guard (VERDICT r01 #1): a shingle present in d docs contributes
    O(d²) join rows, so Zipf-head shingles are dropped when their df exceeds
    ``max_shingle_df`` — they carry the least Jaccard information, and the
    self-join fan-out becomes bounded by df_cap² per shingle.  Jaccard is
    then computed over the CAPPED shingle universe (set sizes too), which
    keeps the measure an exact Jaccard of well-defined sets — deterministic
    and mirrored verbatim in the DuckDB oracle.
    Output: (doc_a, doc_b, inter, union_sz, jaccard_i = floor(j·10^4))."""
    sh_all = docs.select(
        "doc_id", F.explode(F.array_distinct(_shingles(k))).alias("shingle")
    )
    df_counts = sh_all.groupBy("shingle").agg(F.count("*").alias("sh_df"))
    sh = (
        sh_all.join(df_counts.where(F.col("sh_df") <= max_shingle_df), "shingle")
        .select("doc_id", "shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("union_sz", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .withColumn(
            "jaccard_i",
            F.floor(F.col("inter") * 10_000 / F.col("union_sz")).cast("long"),
        )
    )
    return out.where(
        F.col("jaccard_i") >= int(min_jaccard * 10_000)
    ).select("doc_a", "doc_b", "inter", "union_sz", "jaccard_i")


def containment_pairs(
    docs: DataFrame, k: int = JACCARD_SHINGLE, min_containment: float = 0.5,
    max_shingle_df: int = JACCARD_MAX_DF,
) -> DataFrame:
    """ASYMMETRIC near-dup: containment(src in dst) =
    |S(src) ∩ S(dst)| / |S(src)| over k-token shingle sets — catches the
    quote/superset/boilerplate-wrapper cases a symmetric Jaccard misses
    (a page embedding a whole smaller doc has low Jaccard but containment
    ~1 for the smaller doc).  Same shared-shingle blocking and Zipf-head
    df cap as `ngram_jaccard_pairs` (fan-out bounded by df_cap² per
    shingle; the measure is exact containment of the CAPPED sets,
    mirrored verbatim in the oracle).  One undirected intersection join
    feeds BOTH directions.
    Output: (src_doc, dst_doc, inter, src_sz, containment_i)."""
    sh_all = docs.select(
        "doc_id", F.explode(F.array_distinct(_shingles(k))).alias("shingle")
    )
    df_counts = sh_all.groupBy("shingle").agg(F.count("*").alias("sh_df"))
    sh = (
        sh_all.join(df_counts.where(F.col("sh_df") <= max_shingle_df),
                    "shingle")
        .select("doc_id", "shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("n_b")), "doc_b")
    )
    directed = inter.select(
        F.col("doc_a").alias("src_doc"), F.col("doc_b").alias("dst_doc"),
        "inter", F.col("n_a").alias("src_sz"),
    ).unionByName(inter.select(
        F.col("doc_b").alias("src_doc"), F.col("doc_a").alias("dst_doc"),
        "inter", F.col("n_b").alias("src_sz"),
    ))
    out = directed.withColumn(
        "containment_i",
        F.floor(F.col("inter") * 10_000 / F.col("src_sz")).cast("long"),
    )
    return out.where(
        F.col("containment_i") >= int(min_containment * 10_000)
    ).select("src_doc", "dst_doc", "inter", "src_sz", "containment_i")


def minhash_signatures(docs: DataFrame, n_funcs: int = MINHASH_FUNCS,
                       shingle_k: int = MINHASH_SHINGLE) -> DataFrame:
    """(doc_id, j, minhash): n_funcs min-wise hashes over shingle hashes,
    h_j(x) = ((2j+1)·x + 7919j + 1) mod P."""
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(_shingles(shingle_k))).alias("shingle")
    ).withColumn("h", token_hash(F.col("shingle")))
    js = F.explode(F.sequence(F.lit(0), F.lit(n_funcs - 1))).alias("j")
    return (
        sh.select("doc_id", "h", js)
        .withColumn(
            "hj",
            ((F.lit(2) * F.col("j") + 1) * F.col("h") + F.lit(7919) * F.col("j") + 1)
            % F.lit(HASH_P),
        )
        .groupBy("doc_id", "j")
        .agg(F.min("hj").alias("minhash"))
    )


def minhash_lsh_pairs(docs: DataFrame, n_funcs: int = MINHASH_FUNCS,
                      bands: int = MINHASH_BANDS,
                      shingle_k: int = MINHASH_SHINGLE) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on all rows of ≥1 LSH band.
    Output (doc_a, doc_b, n_bands_shared)."""
    rows_per_band = n_funcs // bands
    sig = minhash_signatures(docs, n_funcs, shingle_k)
    band = (
        sig.withColumn("band", (F.col("j") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",", F.transform(F.array_sort(F.collect_list(
                    F.struct("j", "minhash"))), lambda s: s["minhash"].cast("string"))
            ).alias("band_key")
        )
    )
    a, b = band.alias("a"), band.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_shared"))
    )


def simhash(docs: DataFrame, bits: int = 31) -> DataFrame:
    """Per-doc SimHash over tf-weighted term hashes: bit b is 1 iff
    Σ_t tf(t)·(2·bit_b(h(t))−1) > 0. Output (doc_id, simhash)."""
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    th = tf.withColumn("h", token_hash(F.col("term")))
    # NB: F.shiftleft/shiftright require a literal shift — use the SQL forms,
    # which accept column shift amounts
    bitted = th.select(
        "doc_id", "tf", "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    ).withColumn(
        "w",
        F.col("tf") * (F.lit(2) * F.expr("shiftright(h, b) & 1") - 1),
    )
    return (
        bitted.groupBy("doc_id", "b")
        .agg(F.sum("w").alias("s"))
        .withColumn("bit", (F.col("s") > 0).cast("long"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("bit") * F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
            .alias("simhash")
        )
    )


def simhash_near_pairs(docs: DataFrame, bits: int = 31,
                       max_hamming: int = 6, band_bits: int = 8) -> DataFrame:
    """Hamming-near pairs via banded exact-match blocking then exact
    bit_count(xor) filter. Output (doc_a, doc_b, hamming)."""
    sh = simhash(docs, bits)
    n_bands = (bits + band_bits - 1) // band_bits
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_key",
        F.expr(f"shiftright(simhash, band * {band_bits}) & {(1 << band_bits) - 1}"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
    )
    return pairs.where(F.col("hamming") <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )
