"""Deterministic sampling / splitting for training-data pipelines:
reproducible train/val/test assignment and per-group quota capping
(e.g. "at most N documents per source domain").

Both are pure column expressions over a cross-engine integer hash —
`(id mod P) * MULT + seed mod P` with P = 2^31-1 and MULT = 48271 (the
MINSTD multiplier; (P-1)*48271 < 2^47, exact in int64 on Spark and
DuckDB alike) — so the same row lands in the same split on any engine,
any run, any cluster size.  That determinism is the point: rerunning a
100 TB pipeline after adding a stage must not reshuffle which docs are
"test".

Scale notes: hash_split is a stateless map — no shuffle at all.
group_quota_sample is one window per group key; a pathologically hot
group sorts on one task.  The skew-bounded alternative for such groups
is quota-by-threshold (estimate the quota-th smallest hash per group,
filter, exact-trim the boundary) — same shuffle count, no full
per-group sort.  The exact window version here is what the oracle
replicates bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from full_text_index_spark.functions.textstats import HASH_P

SPLIT_MULT = 48271  # MINSTD; (P-1)*MULT < 2^47 — exact in int64

# group_quota_sample re-mixes the split hash through a DIFFERENT
# multiplier so its ordering is decoupled from hash_split's: with a
# shared stream and shared default seed, the quota's "smallest hashes per
# group" are exactly the rows hash_split sends to the first-named split —
# quota-sampled data would land ~100% in 'train' and never in
# 'val'/'test'.  An additive salt alone is NOT enough (the same lesson as
# the LSH plane weights): split_hash is affine in the seed, so adding a
# constant SHIFTS every hash by the same amount mod P and preserves the
# ordering almost everywhere — measured 3439/561/0 across an 80/10/10
# split.  Multiplying by a second, different MINSTD-class multiplier
# wraps the circle every ~P/MULT_Q values, decorrelating the two
# orderings (measured ≈ weights).  The oracle (__spark_entry__) derives
# its SQL from quota_hash_sql, so engine and oracle move in lockstep.
QUOTA_SEED_SALT = 7919
QUOTA_MULT = 69621  # ≠ SPLIT_MULT; (P-1)*MULT_Q < 2^48 — exact in int64


def split_hash(key: Column, seed: int = 0) -> Column:
    """Deterministic hash of an integer id into [0, P): two affine
    rounds mod P.  One round's stride (MULT) never wraps a small
    sequential id range, which would dump every row into the first
    split; the second multiplication makes the effective stride
    MULT² mod P ≈ 1.83e8, wrapping every ~12 consecutive ids, and
    amplifies the (pre-multiplied) seed to seed*MULT^2 mod P so
    reseeding moves a large fraction of assignments, not just the
    threshold-adjacent sliver.  pmod (not %) at every reduction: Spark's
    % follows the dividend's sign, so a negative seed would yield
    negative hashes that undercut every split threshold and silently
    dump those rows into the first-named split."""
    r1 = F.pmod(
        F.pmod(key.cast("long"), F.lit(HASH_P)) * SPLIT_MULT
        + seed * SPLIT_MULT,
        F.lit(HASH_P),
    )
    return F.pmod(r1 * SPLIT_MULT, F.lit(HASH_P))


def split_hash_sql(key_expr: str, seed: int = 0) -> str:
    """DuckDB expression computing the identical hash (DuckDB's % is also
    sign-following, so the same double-mod keeps negatives out)."""
    r1 = (f"(((({key_expr}) % {HASH_P}) * {SPLIT_MULT} + {seed} * {SPLIT_MULT})"
          f" % {HASH_P} + {HASH_P}) % {HASH_P}")
    return f"((({r1}) * {SPLIT_MULT}) % {HASH_P} + {HASH_P}) % {HASH_P}"


def quota_hash(key: Column, seed: int = 0) -> Column:
    """group_quota_sample's selection hash: the split hash re-mixed
    through a different multiplier (order-decorrelated from hash_split —
    see QUOTA_MULT's note)."""
    return F.pmod(
        (split_hash(key, seed) + QUOTA_SEED_SALT) * QUOTA_MULT,
        F.lit(HASH_P),
    )


def quota_hash_sql(key_expr: str, seed: int = 0) -> str:
    """DuckDB expression computing the identical quota hash."""
    base = split_hash_sql(key_expr, seed)
    return (f"(((({base}) + {QUOTA_SEED_SALT}) * {QUOTA_MULT})"
            f" % {HASH_P} + {HASH_P}) % {HASH_P}")


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Adds a ``split`` column assigning each row to one of the named
    splits with the given weights (must sum to ~1).  Stateless map-side
    expression: no shuffle, no RNG state, stable under reruns and
    repartitioning."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = split_hash(F.col(key), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = h < int(acc * HASH_P)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def group_quota_sample(
    df: DataFrame,
    group_col: str,
    quota: int,
    key: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """At most ``quota`` rows per ``group_col`` value, chosen by smallest
    deterministic hash (ties broken by key) — an unbiased, reproducible
    per-domain cap.  One window shuffle on the group key.  Selection uses
    quota_hash (a second multiplier round over the split hash), so the
    stream is order-decorrelated from hash_split's: composed with the
    same user seed, quota survivors still spread across train/val/test
    instead of being exactly the smallest-hash (first-split) rows."""
    w = Window.partitionBy(group_col).orderBy(
        quota_hash(F.col(key), seed).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )
