"""Deterministic split / quota-sample properties: reproducibility,
weight accuracy, partition-invariance, per-group caps."""

import pyspark.sql.functions as F
import pytest

from full_text_index_spark.functions.sampling import (
    group_quota_sample,
    hash_split,
    split_hash,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_weights_and_determinism(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    counts = {
        r.split: r["count"]
        for r in hash_split(df, WEIGHTS).groupBy("split").count().collect()
    }
    n = sum(counts.values())
    assert n == 20_000
    for name, w in WEIGHTS.items():
        assert abs(counts[name] / n - w) < 0.02, (name, counts)
    # identical assignment on a rerun and under a different partitioning
    a = hash_split(df, WEIGHTS).collect()
    b = hash_split(df.repartition(13), WEIGHTS).collect()
    assert {(r.doc_id, r.split) for r in a} == {(r.doc_id, r.split) for r in b}


def test_split_seed_changes_assignment(spark):
    df = spark.range(2_000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.split for r in hash_split(df, WEIGHTS, seed=0).collect()}
    b = {r.doc_id: r.split for r in hash_split(df, WEIGHTS, seed=99).collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 100  # seeds genuinely reshuffle


def test_split_weights_must_sum_to_one(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        hash_split(df, {"a": 0.5, "b": 0.1})


def test_split_is_pure_map(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = hash_split(df, WEIGHTS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # stateless: no shuffle


def test_group_quota_cap_and_determinism(spark):
    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("source"),
    )
    out = group_quota_sample(df, "source", quota=50)
    sizes = out.groupBy("source").count().collect()
    assert all(r["count"] == 50 for r in sizes) and len(sizes) == 7
    again = group_quota_sample(df.repartition(17), "source", quota=50)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}


def test_group_quota_small_groups_untouched(spark):
    df = spark.range(30).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("g")
    )
    assert group_quota_sample(df, "g", quota=100).count() == 30


def test_split_hash_matches_duckdb(spark):
    import duckdb

    from full_text_index_spark.functions.sampling import split_hash_sql

    df = spark.range(1_000).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.h
        for r in df.select("doc_id", split_hash(F.col("doc_id"), 7).alias("h")).collect()
    }
    duck = duckdb.sql(
        f"SELECT i AS doc_id, {split_hash_sql('i', 7)} AS h "
        "FROM generate_series(0, 999) t(i)"
    ).fetchall()
    assert got == {d: h for d, h in duck}


def test_quota_sample_composes_with_hash_split(spark):
    """The quota stream is salted: with the SAME user seed, quota
    survivors must spread across splits ≈ by weight, not collapse into
    the first-named split (which is exactly the smallest-hash rows)."""
    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).alias("source")
    )
    sampled = group_quota_sample(df, "source", quota=1000, seed=0)
    counts = {
        r.split: r["count"]
        for r in hash_split(sampled, WEIGHTS, seed=0)
        .groupBy("split").count().collect()
    }
    n = sum(counts.values())
    assert n == 4000
    for name, w in WEIGHTS.items():
        assert abs(counts.get(name, 0) / n - w) < 0.05, (name, counts)


def test_split_hash_negative_seed_stays_nonnegative(spark):
    """pmod discipline: a negative seed must not produce negative hashes
    (which would silently dump every affected row into the first split)."""
    df = spark.range(5_000).select(F.col("id").alias("doc_id"))
    mn = df.select(
        F.min(split_hash(F.col("doc_id"), seed=-123)).alias("m")
    ).first()["m"]
    assert mn >= 0
    counts = {
        r.split: r["count"]
        for r in hash_split(df, WEIGHTS, seed=-123)
        .groupBy("split").count().collect()
    }
    n = sum(counts.values())
    for name, w in WEIGHTS.items():
        assert abs(counts.get(name, 0) / n - w) < 0.03, (name, counts)
