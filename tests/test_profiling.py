"""Exact grouped quantiles vs numpy rank selection, plus single-window
plan shape and tiny-group multi-hit handling."""

import numpy as np
import pyspark.sql.functions as F

from full_text_index_spark.functions.profiling import group_quantiles


def _fixture(spark, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), f"s{int(i) % 5}", int(rng.integers(0, 10_000)))
        for i in range(2_000)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, source string, v long")


def test_group_quantiles_match_numpy(spark):
    rows, df = _fixture(spark)
    got = {
        (r.source, r.q_pct): (r.quantile, r.n)
        for r in group_quantiles(df, "source", "v").collect()
    }
    by_src = {}
    for _id, src, v in rows:
        by_src.setdefault(src, []).append((v, _id))
    assert len(got) == 5 * 3
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        for q, pct in ((0.5, 50), (0.9, 90), (0.99, 99)):
            want = vals[int(np.floor(q * (n - 1)))][0]
            assert got[(src, pct)] == (want, n), (src, pct)


def test_quantiles_single_row_group(spark):
    df = spark.createDataFrame([(1, "a", 42)], "doc_id long, source string, v long")
    rows = group_quantiles(df, "source", "v").collect()
    # rank 0 satisfies every q — all three quantiles are 42
    assert sorted((r.q_pct, r.quantile) for r in rows) == [
        (50, 42), (90, 42), (99, 42)
    ]


def test_quantiles_one_window_pass(spark):
    _rows, df = _fixture(spark)
    plan = (
        group_quantiles(df, "source", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") <= 2  # row_number + count share one spec pair
    assert plan.count("Exchange") == 1  # one shuffle on the group key
