"""Differential tests for the binned range (containment) join.

The operator bins intervals and points so the containment join becomes a
hash equi-join (functions/ranges.py); these tests diff it against the
obvious quadratic inequality join on the same data, across bin widths
that do and don't divide the interval lengths.
"""

import pyspark.sql.functions as F
import pytest

from full_text_index_spark.functions.ranges import range_join


def _fixture(spark, seed=7, n_points=400, n_intervals=60):
    pts = (
        spark.range(n_points)
        .select(
            (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(5))).alias("k"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(10_000)).alias("p"),
            F.col("id").alias("pid"),
        )
    )
    iv = (
        spark.range(n_intervals)
        .select(
            (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(5))).alias("k"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(9_000)).alias("s"),
            F.col("id").alias("iid"),
        )
        .withColumn(
            "e", F.col("s") + F.pmod(F.xxhash64("iid", F.lit(seed + 4)), F.lit(700))
        )
    )
    return pts, iv


def _brute(pts, iv):
    return pts.join(iv, "k").where(
        (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e"))
    )


@pytest.mark.parametrize("bin_width", [1, 250, 700, 4096])
def test_range_join_matches_inequality_join(spark, bin_width):
    pts, iv = _fixture(spark)
    got = (
        range_join(pts, iv, by="k", point_col="p", start_col="s",
                   end_col="e", bin_width=bin_width)
        .select("pid", "iid")
        .collect()
    )
    want = _brute(pts, iv).select("pid", "iid").collect()
    assert want, "fixture produced no containments — broken fixture"
    assert sorted((r.pid, r.iid) for r in got) == sorted(
        (r.pid, r.iid) for r in want
    )


def test_range_join_no_duplicate_pairs(spark):
    # A point sits in exactly one bin, so a pair can never be emitted twice
    # even when an interval spans many bins.
    pts, iv = _fixture(spark, seed=11)
    rows = (
        range_join(pts, iv, by="k", point_col="p", start_col="s",
                   end_col="e", bin_width=16)
        .groupBy("pid", "iid")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert rows == 0


def test_range_join_inclusive_bounds(spark):
    pts = spark.createDataFrame(
        [(1, 10, "lo"), (1, 20, "hi"), (1, 9, "below"), (1, 21, "above")],
        "k int, p long, pid string",
    )
    iv = spark.createDataFrame([(1, 10, 20, "iv")], "k int, s long, e long, iid string")
    got = sorted(
        r.pid
        for r in range_join(
            pts, iv, by="k", point_col="p", start_col="s", end_col="e", bin_width=7
        ).collect()
    )
    assert got == ["hi", "lo"]
