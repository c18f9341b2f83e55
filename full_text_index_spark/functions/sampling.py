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


def split_hash(key: Column, seed: int = 0) -> Column:
    """Deterministic hash of an integer id into [0, P): two affine
    rounds mod P.  One round's stride (MULT) never wraps a small
    sequential id range, which would dump every row into the first
    split; the second multiplication makes the effective stride
    MULT² mod P ≈ 1.83e8, wrapping every ~12 consecutive ids, and
    amplifies the (pre-multiplied) seed to seed*MULT^2 mod P so
    reseeding moves a large fraction of assignments, not just the
    threshold-adjacent sliver."""
    r1 = (F.pmod(key.cast("long"), F.lit(HASH_P)) * SPLIT_MULT + seed * SPLIT_MULT) % HASH_P
    return (r1 * SPLIT_MULT) % HASH_P


def split_hash_sql(key_expr: str, seed: int = 0) -> str:
    """DuckDB expression computing the identical hash."""
    r1 = f"((({key_expr}) % {HASH_P}) * {SPLIT_MULT} + {seed} * {SPLIT_MULT}) % {HASH_P}"
    return f"(({r1}) * {SPLIT_MULT}) % {HASH_P}"


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
    per-domain cap.  One window shuffle on the group key."""
    w = Window.partitionBy(group_col).orderBy(
        split_hash(F.col(key), seed).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )
