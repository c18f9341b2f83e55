"""Range (interval-containment) join: pairs every point with the
intervals that contain it.  Spark plans a raw inequality join as
BroadcastNestedLoop or a cartesian product — quadratic and
non-shuffleable; engines with native range joins (DuckDB's inequality
join is the parity oracle) handle this internally.

Scale path: time is cut into fixed-width bins.  Each interval explodes
into the bins it overlaps (bounded by interval_length/bin_width + 1
rows), each point maps to exactly ONE bin, and the pair candidates come
from an ordinary equi-join on (key..., bin) — hash-shuffleable,
AQE-skew-splittable, broadcastable when one side is small.  The exact
start <= point <= end filter then removes same-bin near-misses.  Because
a point lives in one bin, no pair can appear twice — no dedup pass.

Pick bin_width ≈ the typical interval length: the explode factor stays
~2× while bin populations stay small.  A 100 TB event table with 30-min
windows and 30-min bins shuffles each row ~once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    by: str | list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner containment join: rows pairing each `points` row with every
    `intervals` row of the same ``by`` key whose [start_col, end_col]
    (inclusive both ends) contains its ``point_col``.  The three value
    columns must share one numeric domain (e.g. epoch micros); bin_width
    is in the same unit.  Output carries all columns of both inputs
    (names must not collide apart from ``by``)."""
    by = [by] if isinstance(by, str) else list(by)
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width),
                F.floor(F.col(end_col) / bin_width),
            )
        ),
    )
    pt = points.withColumn("_bin", F.floor(F.col(point_col) / bin_width))
    return (
        pt.join(iv, on=by + ["_bin"])
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bin")
    )
