"""Text-analysis operators: vocabulary stats, entropy, quality scoring,
language-ID heuristic, token counting, document fingerprinting.

The analogs of the reference's corpus-statistics tools ``alph`` (alphabet
stats, utils/alph.c:14-62) and ``entrop`` (empirical entropy,
utils/entrop.c:72-183), extended with the text-quality operators a
large-scale training-data pipeline needs.

Everything is JVM-side DataFrame expressions.  The deterministic
cross-engine hash used by fingerprints / minhash / simhash is a polynomial
char hash mod 2^31-1, expressible identically in Spark higher-order
functions and DuckDB list lambdas (so the DuckDB differential oracle can
reproduce it bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from full_text_index_spark.tokenizer import tokens_col

HASH_P = 2_147_483_647  # 2^31 - 1; keeps acc*31+c < 2^36 (exact in int64)
HASH_SEED = 7

# tiny fixed stopword list for quality scoring — order must match the SQL
STOPWORDS = ["a", "and", "in", "of", "the", "to"]


def token_hash(tok: Column) -> Column:
    """Polynomial hash of a token: fold (acc*31 + ascii(c)) % P, seed 7.

    DuckDB rendering (textstats_sql.token_hash_sql) folds the identical
    sequence, so hashes agree bit-for-bit across engines.
    """
    # NB: Spark's split(tok, '') emits a trailing '' (Java split limit -1);
    # DuckDB's regexp_split_to_array does not — filter for cross-engine parity
    chars = F.filter(F.split(tok, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(HASH_SEED).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(HASH_P),
    )


def token_hash_sql(tok_expr: str) -> str:
    return (
        f"list_reduce(list_prepend({HASH_SEED}::BIGINT, "
        f"list_transform(regexp_split_to_array({tok_expr}, ''), "
        f"c -> ascii(c)::BIGINT)), (acc, c) -> (acc*31 + c) % {HASH_P})"
    )


def vocab_stats(docs: DataFrame, top_n: int = 100) -> DataFrame:
    """(term, df, cf) for the top_n terms by collection frequency — the
    `alph` analog."""
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    return (
        toks.groupBy("term")
        .agg(F.count("*").alias("cf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("cf"), "term")
        .limit(top_n)
        .select("term", "df", "cf")
    )


def ngram_counts(docs: DataFrame, n: int = 2, top_n: int = 100) -> DataFrame:
    """(ngram, df, cf) for the top_n token n-grams by collection
    frequency — the head of an LM-style n-gram table.  One explode + one
    groupBy; the global top-k plans as TakeOrderedAndProject
    (per-partition heap, driver merges top_n rows per partition — never
    a full sort of the n-gram table).  Overlapping windows, so cf counts
    every occurrence, unlike the dedup shingle sets."""
    # doc-local Arrow kernel emitting (ngram, cf, df) PARTIALS per batch:
    # a doc is one input row, so it lives in exactly one batch and
    # per-batch distinct-doc counts SUM to the global df — the explode
    # (one shuffled row per window occurrence, built by an interpreted
    # HOF) collapses to ~distinct-ngrams-per-batch rows.  Counts are
    # integers; partial-then-final sums are exact.
    import pandas as pd

    from full_text_index_spark.functions.util import widen_partitions
    from full_text_index_spark.tokenizer import tokenize_py

    def partials(iterator):
        empty = pd.DataFrame({
            "ngram": pd.Series(dtype=object),
            "cf": pd.Series(dtype="int64"), "df": pd.Series(dtype="int64"),
        })
        for pdf in iterator:
            acc: dict[str, list[int]] = {}
            for s in pdf["text"]:
                t = tokenize_py(s) if isinstance(s, str) else []
                seen = set()
                for i in range(len(t) - n + 1):
                    g = " ".join(t[i:i + n])
                    e = acc.get(g)
                    if e is None:
                        acc[g] = e = [0, 0]
                    e[0] += 1
                    if g not in seen:
                        seen.add(g)
                        e[1] += 1
            if not acc:
                yield empty
                continue
            yield pd.DataFrame({
                "ngram": list(acc.keys()),
                "cf": [v[0] for v in acc.values()],
                "df": [v[1] for v in acc.values()],
            })

    return (
        widen_partitions(docs.select("text"))
        .mapInPandas(partials, schema="ngram string, cf long, df long")
        .groupBy("ngram")
        .agg(F.sum("cf").alias("cf"), F.sum("df").alias("df"))
        .orderBy(F.desc("cf"), "ngram")
        .limit(top_n)
        .select("ngram", "df", "cf")
    )


def _gram_windows(toks, n: int):
    """array<string> of overlapping n-token windows (empty when the doc
    has fewer than n tokens — guarded: sequence(1, 0) would count down)."""
    cnt = F.size(toks) - (n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _make_repetition_kernel(ns: tuple[int, ...]):
    """mapInPandas kernel: (doc_id, text) → the per-doc repetition row,
    doc-locally in numpy.  Bit-identical to `repetition_stats_expr`: the
    window string " ".join(toks[i:i+n]) is injective over token tuples
    (tokens contain no spaces), so distinct window COUNTS equal distinct
    packed token-code tuples (pd.factorize gives exact string-identity
    codes); the frac is the same floor of the same IEEE double quotient.
    The expression form re-evaluated the interpreted window-HOF once per
    referencing column (~6 array builds per doc — measured 31.8 s for
    5000 docs at sf0.1; this kernel: <1 s)."""
    import numpy as np
    import pandas as pd

    from full_text_index_spark.tokenizer import tokenize_py

    def kern(iterator):
        for pdf in iterator:
            tok_lists = [
                tokenize_py(s) if isinstance(s, str) else [] for s in pdf["text"]
            ]
            flat = [t for lst in tok_lists for t in lst]
            codes = (
                pd.factorize(pd.Series(flat, dtype=object))[0].astype(np.int64)
                if flat else np.empty(0, np.int64)
            )
            n_toks = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                                 count=len(tok_lists))
            offs = np.concatenate(([0], np.cumsum(n_toks)))
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            for n in ns:
                tot = np.maximum(n_toks - (n - 1), 0)
                dup = np.zeros(len(tok_lists), dtype=np.int64)
                for i in range(len(tok_lists)):
                    t = tot[i]
                    if t <= 0:
                        continue
                    # per-doc dense codes keep the packed key small
                    lv_n, c = np.unique(
                        codes[offs[i]:offs[i + 1]], return_inverse=True
                    )
                    v = len(lv_n)
                    if v ** n < (1 << 62):
                        key = c[: t].copy()
                        for j in range(1, n):
                            key = key * v + c[j: j + t]
                        dup[i] = t - len(np.unique(key))
                    else:
                        # a doc with ~2M distinct tokens: exact but rare
                        # string-window fallback
                        ws = {" ".join(map(str, c[j: j + n]))
                              for j in range(t)}
                        dup[i] = t - len(ws)
                out[f"n_{n}grams"] = tot
                frac = np.zeros(len(tok_lists), dtype=np.int64)
                nz = tot > 0
                frac[nz] = np.floor(
                    dup[nz] * 10_000 / tot[nz]
                ).astype(np.int64)
                out[f"dup_{n}gram_frac_i"] = frac
            yield pd.DataFrame(out)

    return kern


def repetition_stats(docs: DataFrame, ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Per-doc repetition signals (the Gopher-style duplicate-n-gram
    filters a webtext curation run keys on): for each n, the fraction of
    n-gram windows that are repeats of an earlier window in the SAME doc,
    integer-scaled — dup_frac = floor((total − distinct)·10⁴ / total),
    0 for docs shorter than n tokens.  Computed by the doc-local Arrow
    kernel (`_make_repetition_kernel`) — a map-only stage;
    `repetition_stats_expr` is the same math as column expressions and the
    in-Spark differential oracle."""
    from full_text_index_spark.functions.util import widen_partitions

    schema = "doc_id long, " + ", ".join(
        f"n_{n}grams long, dup_{n}gram_frac_i long" for n in ns
    )
    return widen_partitions(docs.select("doc_id", "text")).mapInPandas(
        _make_repetition_kernel(ns), schema=schema
    )


def repetition_stats_expr(docs: DataFrame,
                          ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Column-expression rendering of `repetition_stats` — kept as the
    in-Spark differential oracle (floor of an IEEE double quotient of ints
    < 2^53 is engine-exact here because the true remainder keeps the
    quotient ≥ 1/total away from the next integer).  The interpreted
    window HOF re-evaluates per referencing column — use the kernel."""
    toks = tokens_col(F.col("text"))
    cols = []
    for n in ns:
        g = _gram_windows(toks, n)
        total = F.size(g)
        distinct = F.size(F.array_distinct(g))
        cols.append(total.cast("long").alias(f"n_{n}grams"))
        cols.append(
            F.when(
                total > 0,
                F.floor((total - distinct).cast("long") * 10_000 / total),
            )
            .otherwise(0)
            .cast("long")
            .alias(f"dup_{n}gram_frac_i")
        )
    return docs.select("doc_id", *cols)


def h0_entropy(docs: DataFrame) -> DataFrame:
    """Empirical 0-order token entropy of the corpus (bits/token) — the
    `entrop` analog. One row: (n_tokens, vocab, h0_milli = floor(H0·10^4))."""
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("term"))
    freqs = toks.groupBy("term").agg(F.count("*").alias("cf"))
    tot = freqs.agg(
        F.sum("cf").alias("n_tokens"), F.count("*").alias("vocab")
    )
    p = F.col("cf") / F.col("n_tokens")
    return (
        freqs.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.first("vocab").alias("vocab"),
            F.floor(F.sum(-p * F.log2(p)) * 10_000).cast("long").alias("h0_milli"),
        )
    )


def hk_entropy(docs: DataFrame, k: int = 1) -> DataFrame:
    """Empirical k-th order token entropy (bits/token) — the `entrop2`/
    `entrop3` analog (reference: utils/entrop.c:72-183): H_k = Σ_ctx p(ctx) ·
    H0(next | ctx), contexts being k-grams of tokens.
    One row: (k, n_transitions, n_contexts, hk_milli = floor(H_k·10^4))."""
    # (ctx, nxt, c) partials from a doc-local Arrow kernel (pandas groupby
    # per batch): the old interpreted transform built a struct array per
    # doc via slice+concat_ws HOF lambdas (~1.7 ms/doc — 8.3 s for 5000
    # docs at sf0.1), and the explode shuffled one row per TRANSITION;
    # partials ship ~distinct (ctx, nxt) per batch.  Counts are integers,
    # so partial-then-final sums are exact and `trans` is identical.
    import pandas as pd

    from full_text_index_spark.functions.util import widen_partitions
    from full_text_index_spark.tokenizer import tokenize_py

    def transitions(iterator):
        empty = pd.DataFrame({
            "ctx": pd.Series(dtype=object), "nxt": pd.Series(dtype=object),
            "c": pd.Series(dtype="int64"),
        })
        for pdf in iterator:
            ctxs, nxts = [], []
            for s in pdf["text"]:
                t = tokenize_py(s) if isinstance(s, str) else []
                for i in range(len(t) - k):
                    ctxs.append(" ".join(t[i:i + k]))
                    nxts.append(t[i + k])
            if not ctxs:
                yield empty
                continue
            part = pd.DataFrame({"ctx": ctxs, "nxt": nxts})
            part["c"] = 1
            yield part.groupby(["ctx", "nxt"], sort=False,
                               as_index=False)["c"].sum()

    pairs = widen_partitions(docs.select("text")).mapInPandas(
        transitions, schema="ctx string, nxt string, c long"
    )
    trans = pairs.groupBy("ctx", "nxt").agg(F.sum("c").alias("c"))
    ctx_tot = trans.groupBy("ctx").agg(F.sum("c").alias("ct"))
    tot = trans.agg(F.sum("c").alias("n_trans"), F.countDistinct("ctx").alias("n_ctx"))
    p_cond = F.col("c") / F.col("ct")
    return (
        trans.join(ctx_tot, "ctx")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.first("n_trans").alias("n_transitions"),
            F.first("n_ctx").alias("n_contexts"),
            F.floor(
                F.sum(-(F.col("c") / F.col("n_trans")) * F.log2(p_cond)) * 10_000
            ).cast("long").alias("hk_milli"),
        )
        .select(
            F.lit(k).cast("int").alias("k"),
            "n_transitions", "n_contexts", "hk_milli",
        )
    )


def scan_count(docs: DataFrame, patterns: list[str]) -> DataFrame:
    """Direct substring-scan count — the reference's small-input fallback
    that skips the index entirely (Boyer-Moore scan for texts < 50KB,
    fm/fm_search.c:417-498; adaptive choice fm/fm_index.h:20-22).  Here the
    adaptive strategy is: tiny corpus → scan the stored text column with a
    whole-stage-codegen'd expression instead of touching postings.
    Counts OVERLAPPING occurrences — identical semantics to the indexed
    substring_count (sau counts every suffix-array hit), so the adaptive
    cutover never changes answers on self-overlapping patterns ('aa' in
    'aaaa' is 3 on both paths; a replace-based count would say 2).
    Output: (pattern, n_docs_matching, n_occurrences).

    r06: the scan runs in an Arrow kernel with the pattern set in the
    closure — the old column-HOF enumerated every char offset, each substr
    re-walking UTF-8 from offset 0 (O(|text|²·|pattern|) interpreted;
    7.1 s for 5000 docs at sf0.1), and the crossJoin shipped every text
    once per pattern.  str.find with start+1 counts the identical
    overlapping occurrences in O(|text|) C code; per-batch integer
    partials make the final aggregate pattern-sized."""
    import pandas as pd

    from full_text_index_spark.functions.util import widen_partitions

    pats = list(patterns)

    def scan(iterator):
        import numpy as np

        for pdf in iterator:
            nd = np.zeros(len(pats), dtype=np.int64)
            no = np.zeros(len(pats), dtype=np.int64)
            for s in pdf["text"]:
                if not isinstance(s, str):
                    continue
                for pi, p in enumerate(pats):
                    n, j = 0, s.find(p)
                    while j != -1:
                        n += 1
                        j = s.find(p, j + 1)
                    if n:
                        nd[pi] += 1
                        no[pi] += n
            yield pd.DataFrame({
                "pattern": pats, "n_docs_matching": nd, "n_occurrences": no,
            })

    return (
        widen_partitions(docs.select("text"))
        .mapInPandas(
            scan,
            schema="pattern string, n_docs_matching long, n_occurrences long",
        )
        .groupBy("pattern")
        .agg(
            F.sum("n_docs_matching").alias("n_docs_matching"),
            F.sum("n_occurrences").alias("n_occurrences"),
        )
    )


def doc_token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token accounting: whitespace tokens, regex (BPE-ish) tokens,
    distinct terms, doclen — the token-counting operator."""
    toks = tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars_measured"),
        # Spark split keeps leading/trailing '' fields (limit -1): unfiltered,
        # ' a b ' would count 4 and '' would count 1 — same trap the module's
        # token_hash note documents for split(s, '')
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
        ).alias("n_ws_tokens"),
    )


def quality_feature_cols() -> list:
    """The quality feature columns (×10^4 integer-scaled) as aliased
    expressions over a `text` column — shared by quality_score and the
    fused curation pipeline so both compute bit-identical features.
    Divisors are guarded with greatest(n,1): ANSI mode turns 0-token docs
    into DIVIDE_BY_ZERO and a downstream where(n>0) does not pin the
    projection's evaluation order (identity on every n>0 row)."""
    toks = tokens_col(F.col("text"))
    sw = F.array([F.lit(s) for s in STOPWORDS])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_uniq = F.size(F.array_distinct(toks))
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    scale = F.lit(10_000)
    d = F.greatest(n, F.lit(1))
    return [
        n.alias("n_tokens"),
        F.floor(n_stop * scale / d).cast("long").alias("stop_ratio_i"),
        F.floor(n_uniq * scale / d).cast("long").alias("uniq_ratio_i"),
        F.floor(tok_chars * scale / d).cast("long").alias("mean_tok_len_i"),
    ]


def quality_score(docs: DataFrame) -> DataFrame:
    """Per-doc quality features (×10^4, integer-scaled for cross-engine
    comparison): stopword ratio, unique-token ratio, mean token length."""
    return docs.select("doc_id", *quality_feature_cols()).where(
        F.col("n_tokens") > 0
    )


# character-trigram profiles for the language-ID heuristic — 10 languages,
# ~6 distinctive trigrams each (spaces included: word-boundary trigrams are
# the strongest markers).  Scores are non-overlapping substring counts over
# the lowercased text, pure column expressions in both engines; the
# synthetic corpora carry a `lang` column so accuracy is measured, not
# assumed (VERDICT r01 #10).
LANG_TRIGRAMS = {
    "en": ["the", " th", "ing", "nd ", " an", "he "],
    "de": ["der", "ich", "sch", "ein", "und", "die"],
    "fr": ["les", " le", "ent", "ait", " de", "que"],
    "es": [" el", "los", "ado", "ción", " la", "ando"],
    "it": ["gli", " di", "che", "zza", "ione", "tto"],
    "pt": ["ção", "ão ", " os", "em ", "inho", " de"],
    "nl": ["het", "een", "ij ", "aar", " de", "oon"],
    "sv": ["och", "att", "är ", "för", "det", " på"],
    "pl": ["nie", "ego", "rze", "ych", "ość", " si"],
    "tr": ["lar", "bir", "yor", "ler", " ve", "ını"],
}


def lang_score_cols() -> list:
    """Per-language trigram-count score columns (aliased ``sc_<lang>``)
    over a `text` column — one projection's worth; the prediction in
    lang_pred_expr references them BY NAME so the heavy substring-count
    expressions are materialized once per row, not ~22× inside the
    greatest/tie/CASE tree."""
    lt = F.lower(F.col("text"))
    score_cols = []
    for lang, grams in sorted(LANG_TRIGRAMS.items()):
        parts = [
            ((F.length(lt) - F.length(F.replace(lt, F.lit(g))))
             / F.length(F.lit(g))).cast("long")
            for g in grams
        ]
        score = sum(parts[1:], parts[0])
        score_cols.append(score.alias(f"sc_{lang}"))
    return score_cols


def lang_pred_expr():
    """Prediction over the sc_<lang> columns: unique max wins, ties or
    all-zero → 'und'."""
    langs = sorted(LANG_TRIGRAMS)
    best = F.greatest(*[F.col(f"sc_{l}") for l in langs])
    n_best = sum(
        (F.col(f"sc_{l}") == best).cast("int") for l in langs
    )
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:  # first (alphabetical) max wins when unique
        pred = pred.when((F.col(f"sc_{l}") == best) & (n_best == 1), F.lit(l))
    return pred.otherwise(F.lit("und"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Char-trigram-profile language ID over 10 languages: per doc, the
    language whose profile trigrams occur most often in the lowercased text
    (non-overlapping counts; unique-max wins, ties or zero → 'und')."""
    scored = docs.select(
        "doc_id", F.col("lang").alias("lang_true"), *lang_score_cols()
    )
    return scored.select("doc_id", "lang_true",
                         lang_pred_expr().alias("lang_pred"))


def collocations(docs: DataFrame, top_n: int = 50,
                 min_cf: int = 5) -> DataFrame:
    """Top collocations by pointwise mutual information:
    PMI(a,b) = ln( P(ab) / (P(a)P(b)) ) over overlapping token bigrams.

    Cross-engine float discipline: the ln argument is the exact BIGINT
    ratio cf_ab·T_uni² / (T_bi·cf_a·cf_b) (products fit int64 far beyond
    bench scale), divided once in double — Spark and DuckDB then differ
    by <= 1 ulp of ln, absorbed by the floor(x·10^4 + .5) scaling; ties
    broken by ngram so the top_n cut is deterministic.
    Output: (ngram, cf, pmi_i), pmi_i = floor(pmi·10^4 + 0.5)."""
    # one doc-local kernel pass emits unigram AND bigram count partials
    # (kind 0 / kind 1); everything downstream — unigram cf, bigram cf,
    # both totals — derives from the one persisted vocab-sized aggregate
    # instead of four whole-corpus explode scans.  All counts are
    # integers, so partial-then-final sums are exact.
    import pandas as pd

    from pyspark import StorageLevel

    from full_text_index_spark.functions.util import widen_partitions
    from full_text_index_spark.tokenizer import tokenize_py

    def partials(iterator):
        empty = pd.DataFrame({
            "kind": pd.Series(dtype="int32"),
            "key": pd.Series(dtype=object),
            "c": pd.Series(dtype="int64"),
        })
        for pdf in iterator:
            u: dict[str, int] = {}
            b: dict[str, int] = {}
            for s in pdf["text"]:
                t = tokenize_py(s) if isinstance(s, str) else []
                for w in t:
                    u[w] = u.get(w, 0) + 1
                for i in range(len(t) - 1):
                    g = t[i] + " " + t[i + 1]
                    b[g] = b.get(g, 0) + 1
            if not u:
                yield empty
                continue
            yield pd.DataFrame({
                "kind": [0] * len(u) + [1] * len(b),
                "key": list(u.keys()) + list(b.keys()),
                "c": list(u.values()) + list(b.values()),
            })

    agg = (
        widen_partitions(docs.select("text"))
        .mapInPandas(partials, schema="kind int, key string, c long")
        .groupBy("kind", "key")
        .agg(F.sum("c").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    uni = agg.where(F.col("kind") == 0).select(
        F.col("key").alias("term"), F.col("c").alias("ucf")
    )
    t_uni = uni.agg(F.sum("ucf").alias("t_u"))
    t_bi = agg.where(F.col("kind") == 1).agg(F.sum("c").alias("t_b"))
    bg = (
        agg.where(F.col("kind") == 1)
        .select(F.col("key").alias("ngram"), F.col("c").alias("cf"))
        .where(F.col("cf") >= min_cf)
        .withColumn("ta", F.split("ngram", " ")[0])
        .withColumn("tb", F.split("ngram", " ")[1])
    )
    num = (F.col("cf") * F.col("t_u") * F.col("t_u")).cast("double")
    den = (F.col("t_b") * F.col("a_cf") * F.col("b_cf")).cast("double")
    pmi_i = F.floor(F.log(num / den) * 10_000 + F.lit(0.5)).cast("long")
    return (
        # vocab-scale joins: NOT force-broadcast (the dictionary grows
        # with the corpus) — AQE broadcasts when it actually fits
        bg.join(uni.withColumnRenamed("ucf", "a_cf"),
                bg.ta == F.col("term")).drop("term")
        .join(uni.withColumnRenamed("ucf", "b_cf")
              .withColumnRenamed("term", "term_b"),
              F.col("tb") == F.col("term_b")).drop("term_b")
        .crossJoin(F.broadcast(t_uni))
        .crossJoin(F.broadcast(t_bi))
        .select("ngram", "cf", pmi_i.alias("pmi_i"))
        .orderBy(F.desc("pmi_i"), "ngram")
        .limit(top_n)
    )


# PII patterns in the Java-regex/RE2 COMMON subset (no lookaround, no
# ambiguous alternation — leftmost-first and leftmost-longest agree), so
# the DuckDB oracle evaluates them identically.  Redaction order matters:
# emails first (their local parts can contain digit runs), then phones,
# then IPv4 (its octets would otherwise be eaten by a digit-run phone
# pattern placed after it).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / phone numbers / IPv4 addresses with typed placeholder
    tokens and count what was removed — the pre-training privacy pass every
    web-scale corpus gets before anything else touches it.

    Pure JVM column expressions (`regexp_count` + chained
    `regexp_replace`), so the scan stays in whole-stage codegen at any
    corpus size; idempotent (placeholders match none of the patterns).
    Returns (doc_id, clean_text, n_email, n_phone, n_ipv4).
    """
    cols = [F.col("doc_id")]
    clean = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(clean, F.lit(pat)).alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, token)
    return docs.select(*cols, clean.alias("clean_text"), *counts)


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive rolling fingerprint of the token stream:
    fold (acc*31 + token_hash(t)) % P over tokens — the document-level
    content fingerprint operator (an exact, seedless analog of a rolling
    Rabin hash)."""
    toks = tokens_col(F.col("text"))
    fp = F.aggregate(
        toks,
        F.lit(HASH_SEED).cast("long"),
        lambda acc, t: (acc * F.lit(31) + token_hash(t)) % F.lit(HASH_P),
    )
    return docs.select("doc_id", fp.alias("fingerprint"))
