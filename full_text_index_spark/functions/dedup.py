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

Cache contract: the pair ops persist their blocking tables (band/bucket
rows) so the self-join's build side computes once instead of re-running
its lineage per probe.  The entries stay pinned for the SparkSession —
Spark cannot unpersist a lazy result's inputs before the caller acts on
it — so a long-lived session interleaving many UNRELATED dedup batches
should ``spark.catalog.clearCache()`` between them (bench.py does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from full_text_index_spark.functions.textstats import HASH_P, token_hash
from full_text_index_spark.functions.util import widen_partitions
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


def _capped_shingles(docs: DataFrame, k: int, max_shingle_df: int) -> DataFrame:
    """(doc_id, shingle) distinct per doc, Zipf-head shingles above the df
    cap dropped.  Persisted: the callers feed it to BOTH self-join sides
    plus the per-doc size aggregate, and an un-persisted plan re-executes
    the explode + df-count shuffle once per consumer."""
    from pyspark import StorageLevel

    sh_all = docs.select(
        "doc_id", F.explode(F.array_distinct(_shingles(k))).alias("shingle")
    )
    df_counts = sh_all.groupBy("shingle").agg(F.count("*").alias("sh_df"))
    return (
        sh_all.join(df_counts.where(F.col("sh_df") <= max_shingle_df), "shingle")
        .select("doc_id", "shingle")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


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
    sh = _capped_shingles(docs, k, max_shingle_df)
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
    sh = _capped_shingles(docs, k, max_shingle_df)
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


def minhash_signatures_expr(docs: DataFrame, n_funcs: int = MINHASH_FUNCS,
                            shingle_k: int = MINHASH_SHINGLE) -> DataFrame:
    """Column-expression rendering of `minhash_signatures` — kept as the
    in-Spark differential oracle for the Arrow kernel (tests compare the two
    bit-for-bit; the DuckDB oracle is the third independent rendering).
    Explode shingles → token_hash → explode j → min per (doc, j).  Correct
    but interpreted-HOF-bound: token_hash is a per-char aggregate lambda
    Catalyst cannot codegen, so this path costs seconds even on MB-scale
    corpora — the kernel does the identical integer math vectorized."""
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


def _make_minhash_kernel(n_funcs: int, shingle_k: int):
    """mapInPandas kernel: (doc_id, text) → (doc_id, sig array<long>), the
    full n_funcs-wide min-wise signature per doc, numpy-vectorized.

    Bit-identical to `minhash_signatures_expr` / the DuckDB oracle by
    construction: tokens are the same lowercase-[a-z0-9]+ runs, the shingle
    hash folds the same (acc·31 + codepoint) mod P sequence Spark's
    `ascii()` sees (UTF-32 codepoints, never UTF-8 bytes), and the affine
    family is the same ((2j+1)·x + 7919j + 1) mod P.  The polynomial is
    composed per-token — H(" ".join(w)) = fold(acc·31^len(t) + h0(t), with
    an (acc·31 + 32) space step between tokens) — so each token's chars are
    Horner-folded once, not once per window.  All int64; every intermediate
    < 2^62 (acc, h0 < P = 2^31−1; pw < P)."""
    import numpy as np
    import pandas as pd

    from full_text_index_spark.functions.textstats import HASH_SEED
    from full_text_index_spark.tokenizer import tokenize_py

    P = HASH_P
    js = np.arange(n_funcs, dtype=np.int64)
    mult = 2 * js + 1
    add = 7919 * js + 1

    def kern(iterator):
        empty = pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "sig": pd.Series(dtype=object),
        })
        for pdf in iterator:
            # NULL text → no tokens → absent, matching the expr path
            tok_lists = [
                tokenize_py(s) if isinstance(s, str) else [] for s in pdf["text"]
            ]
            n_toks = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            flat = [t for lst in tok_lists for t in lst]
            if not flat:
                yield empty
                continue
            lens = np.fromiter((len(t) for t in flat), dtype=np.int64,
                               count=len(flat))
            cp = np.frombuffer(
                "".join(flat).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            # per-token seed-0 Horner hash + 31^len, char positions vectorized
            h0 = np.zeros(len(flat), np.int64)
            pw = np.ones(len(flat), np.int64)
            for p in range(int(lens.max())):
                m = lens > p
                h0[m] = (h0[m] * 31 + cp[offs[:-1][m] + p]) % P
                pw[m] = (pw[m] * 31) % P
            # one window per shingle start, ragged across docs
            cnt = np.maximum(n_toks - (shingle_k - 1), 0)
            base = np.concatenate(([0], np.cumsum(n_toks)))[:-1]
            cum = np.concatenate(([0], np.cumsum(cnt)))
            idx0 = (np.repeat(base, cnt)
                    + np.arange(cum[-1]) - np.repeat(cum[:-1], cnt))
            win_doc = np.repeat(np.arange(len(tok_lists), dtype=np.int64), cnt)
            acc = np.full(cum[-1], HASH_SEED, np.int64)
            for q in range(shingle_k):
                t = idx0 + q
                acc = (acc * pw[t] + h0[t]) % P
                if q < shingle_k - 1:
                    acc = (acc * 31 + 32) % P  # the " " joiner
            if not len(acc):
                yield empty
                continue
            # distinct (doc, shingle-hash), then min per (doc, j)
            ukey = np.unique((win_doc << 31) | acc)
            ud, uh = ukey >> 31, ukey & ((1 << 31) - 1)
            hj = (uh[:, None] * mult[None, :] + add[None, :]) % P
            bnd = np.flatnonzero(np.diff(ud, prepend=-1))
            mins = np.minimum.reduceat(hj, bnd, axis=0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy()[ud[bnd]],
                "sig": list(mins),
            })

    return kern


def _minhash_sig(docs: DataFrame, n_funcs: int, shingle_k: int) -> DataFrame:
    """(doc_id, sig array<long>) via the Arrow kernel — zero shuffles; docs
    with no shingle (fewer than shingle_k tokens) are absent, as everywhere.
    Scale shape: per-doc-local work — at 100 TB this is a map stage over
    the input's own partitioning; narrow inputs are widened first so the
    kernel actually uses the cluster (functions.util.widen_partitions)."""
    return widen_partitions(docs.select("doc_id", "text")).mapInPandas(
        _make_minhash_kernel(n_funcs, shingle_k),
        schema="doc_id long, sig array<long>",
    )


def minhash_signatures(docs: DataFrame, n_funcs: int = MINHASH_FUNCS,
                       shingle_k: int = MINHASH_SHINGLE) -> DataFrame:
    """(doc_id, j, minhash): n_funcs min-wise hashes over shingle hashes,
    h_j(x) = ((2j+1)·x + 7919j + 1) mod P.  Computed by the vectorized
    Arrow kernel (`_make_minhash_kernel`); `minhash_signatures_expr` is the
    same math as Spark column expressions and the differential oracle."""
    return _minhash_sig(docs, n_funcs, shingle_k).select(
        "doc_id", F.posexplode("sig").alias("j", "minhash")
    )


def minhash_lsh_pairs(docs: DataFrame, n_funcs: int = MINHASH_FUNCS,
                      bands: int = MINHASH_BANDS,
                      shingle_k: int = MINHASH_SHINGLE) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on all rows of ≥1 LSH band.
    Output (doc_a, doc_b, n_bands_shared).  Band keys are sliced from the
    in-row signature array (no collect_list re-pack); the only shuffle is
    the (band, band_key) self-join — the one inherent to LSH blocking.
    The band table is persisted (memory-and-disk, ~bands short rows per
    doc) so the signature kernel runs ONCE — an un-persisted self-join
    re-executes the lineage for each side, doubling the kernel cost."""
    from pyspark import StorageLevel

    if not 1 <= bands <= n_funcs:
        raise ValueError(
            f"minhash_lsh_pairs: bands must satisfy 1 <= bands <= n_funcs "
            f"(got bands={bands}, n_funcs={n_funcs})"
        )
    rows_per_band = n_funcs // bands
    # Band j covers funcs [j*rpb, (j+1)*rpb) for ALL n_funcs functions —
    # when bands does not divide n_funcs the remainder forms one short
    # trailing band (slice past the array end returns the tail), matching
    # the oracle's `j // rpb` banding; dropping those funcs would silently
    # lose candidate pairs that agree only on the partial band.
    n_band_slots = -(-n_funcs // rows_per_band)
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(n_band_slots - 1)),
        lambda b: F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                lambda m: m.cast("string"),
            ),
        ),
    )
    band = _minhash_sig(docs, n_funcs, shingle_k).select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key")
    ).persist(StorageLevel.MEMORY_AND_DISK)
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


def _make_simhash_kernel(bits: int):
    """mapInPandas kernel: (doc_id, text) → (doc_id, simhash), the whole
    per-doc SimHash computed doc-locally — no explode, no shuffle (the old
    expression path exploded every (doc, term) row ×bits before two
    aggregation shuffles: ~10^8 rows at 50k docs for a per-doc-local value).

    Bit-identical to `simhash_expr` / the DuckDB oracle by construction:
    tokens are the same lowercase-[a-z0-9]+ runs, term grouping is by exact
    token STRING (pd.factorize — a hash-collision merge of two terms would
    change the weighted sums), each distinct term is Horner-hashed with the
    same seed-7 (acc·31 + codepoint) mod P fold Spark's ascii() sees, and
    the bit sums Σ tf·(2·bit_b−1) are integer arithmetic — exact in any
    evaluation order."""
    import numpy as np
    import pandas as pd

    from full_text_index_spark.functions.textstats import HASH_SEED
    from full_text_index_spark.tokenizer import tokenize_py

    P = HASH_P
    shifts = np.arange(bits, dtype=np.int64)

    def kern(iterator):
        empty = pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "simhash": pd.Series(dtype=np.int64),
        })
        for pdf in iterator:
            tok_lists = [
                tokenize_py(s) if isinstance(s, str) else [] for s in pdf["text"]
            ]
            n_toks = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            flat = [t for lst in tok_lists for t in lst]
            if not flat:
                yield empty
                continue
            # exact-string term codes; hash only the DISTINCT terms
            codes, uniques = pd.factorize(pd.Series(flat, dtype=object))
            uterms = uniques.tolist()
            ulens = np.fromiter((len(t) for t in uterms), dtype=np.int64,
                                count=len(uterms))
            cp = np.frombuffer(
                "".join(uterms).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(ulens)))
            h = np.full(len(uterms), HASH_SEED, np.int64)
            for p in range(int(ulens.max())):
                m = ulens > p
                h[m] = (h[m] * 31 + cp[offs[:-1][m] + p]) % P
            # per (doc, term-code) tf: unique on a packed int key
            doc_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64),
                                n_toks)
            key = doc_idx * len(uterms) + codes
            ukey, tf = np.unique(key, return_counts=True)
            ud, uc = ukey // len(uterms), ukey % len(uterms)
            bnd = np.flatnonzero(np.diff(ud, prepend=-1))
            # s_b = 2·Σ tf·bit_b − Σ tf  (all integers — exact regardless
            # of summation order, so reduceat == the old groupBy sums)
            tot = np.add.reduceat(tf, bnd)
            sim = np.zeros(len(bnd), dtype=np.int64)
            hu = h[uc]
            for b in range(bits):
                pb = np.add.reduceat(tf * ((hu >> b) & 1), bnd)
                sim += ((2 * pb - tot) > 0).astype(np.int64) << shifts[b]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy()[ud[bnd]],
                "simhash": sim,
            })

    return kern


def simhash(docs: DataFrame, bits: int = 31) -> DataFrame:
    """Per-doc SimHash over tf-weighted term hashes: bit b is 1 iff
    Σ_t tf(t)·(2·bit_b(h(t))−1) > 0. Output (doc_id, simhash).  Computed by
    the doc-local Arrow kernel (`_make_simhash_kernel`) — a map-only stage;
    `simhash_expr` is the same math as Spark column expressions and the
    in-Spark differential oracle."""
    return widen_partitions(docs.select("doc_id", "text")).mapInPandas(
        _make_simhash_kernel(bits), schema="doc_id long, simhash long"
    )


def simhash_expr(docs: DataFrame, bits: int = 31) -> DataFrame:
    """Column-expression rendering of `simhash` — kept as the in-Spark
    differential oracle for the Arrow kernel (tests compare the two
    bit-for-bit; the DuckDB oracle is the third independent rendering).
    Explodes every (doc, term) row ×bits through two aggregation shuffles —
    correct but ~10^3× the rows of the doc-local kernel."""
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
    bit_count(xor) filter. Output (doc_a, doc_b, hamming).  The banded
    table is persisted so the two simhash aggregation shuffles run once,
    not once per self-join side."""
    from pyspark import StorageLevel

    sh = simhash(docs, bits)
    n_bands = (bits + band_bits - 1) // band_bits
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_key",
        F.expr(f"shiftright(simhash, band * {band_bits}) & {(1 << band_bits) - 1}"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
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
