"""Corpus profiling: exact per-group quantiles of an integer measure
(doc length, token count, quality score ×10⁴ — any BIGINT column).
The profile a curation run reads before choosing filter thresholds:
"what does p50/p90/p99 length look like per source domain?"

Quantiles are RANK-BASED (``percentile_disc``-style: the value whose
zero-based rank is floor(q·(n−1)) in ascending (value, id) order) —
a member of the data, integer-exact, so Spark and any SQL oracle agree
bit-for-bit; no interpolation, no float discipline needed.

Scale path: one window shuffle on the group key (rank + count computed
behind the same exchange), then a filter keeping exactly one row per
(group, q) — output is |groups|·|qs| rows.  Per-group data sorts within
its partition; for a pathologically hot group this is the same
single-task sort every exact-quantile plan pays — the approximate
alternative (t-digest / `approx_percentile`) trades that for mergeable
sketches but loses engine-exactness, which the oracle gate needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_QS = (0.5, 0.9, 0.99)


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = DEFAULT_QS,
    id_col: str = "doc_id",
) -> DataFrame:
    """(group_col, q_pct, quantile, n) — for each group and each q in
    ``qs``, the rank-floor(q·(n−1)) value (ties broken by id_col, so the
    selected row is unique and deterministic).  q_pct is the integer
    percent (50, 90, 99) to keep the schema float-free."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = (
        df.select(group_col, value_col, id_col)
        .withColumn("_rk", F.row_number().over(w) - 1)
        .withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
        )
    )
    # ONE window pass: each row tests itself against every q via an
    # array-literal filter (a per-q loop would re-execute the window |qs|
    # times); a row can satisfy several qs in tiny groups, hence explode
    qs_arr = F.array(
        *[
            F.struct(
                F.lit(int(round(q * 100))).alias("q_pct"),
                F.lit(float(q)).alias("q"),
            )
            for q in qs
        ]
    )
    hits = F.filter(
        qs_arr,
        lambda s: F.floor(s["q"] * (F.col("_n") - 1)).cast("long")
        == F.col("_rk"),
    )
    return (
        ranked.withColumn("_hits", hits)
        .where(F.size("_hits") > 0)
        .select(
            group_col,
            F.explode("_hits").alias("_h"),
            F.col(value_col).cast("long").alias("quantile"),
            F.col("_n").cast("long").alias("n"),
        )
        .select(
            group_col, F.col("_h.q_pct").alias("q_pct"), "quantile", "n"
        )
    )
