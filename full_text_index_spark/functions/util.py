"""Shared helpers for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_partitions(df: DataFrame, mult: int = 2) -> DataFrame:
    """Round-robin repartition ``df`` up to ``mult × defaultParallelism``
    partitions when its current partitioning is NARROWER than that — and a
    no-op otherwise.

    Why: the doc-/vector-local Arrow kernels (minhash, simhash, bucket
    scoring, norms) inherit the INPUT partitioning, and a small or
    well-compressed parquet source arrives as a handful of splits — a
    map-only kernel then runs on 2 of 32 cores (guide §2: parallelism comes
    from partition count, and these stages have no shuffle to fix it).  At
    real scale the input already has ≥ the target partitions and this is a
    no-op, so nothing here is tuned to the sandbox: the target tracks
    cluster width, not a constant."""
    sc = df.sparkSession.sparkContext
    target = max(mult * sc.defaultParallelism, 1)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
