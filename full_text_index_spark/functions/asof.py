"""As-of join: for each left row, the most recent right row with
``right.on <= left.on`` within the same ``by`` group — the point-in-time
lookup relational engines ship natively (DuckDB ``ASOF JOIN``, which is
exactly the oracle the parity gate runs) and Spark lacks.

Implementation is NOT a join: both sides are unioned and a single window
pass per ``by`` group carries the latest right ROW forward as one struct
(``last(struct, ignorenulls=True)`` over rows-unbounded-preceding — the
struct is non-null for every right row even when individual fields are
NULL, so the matched row's fields arrive atomically; per-column fills
would tear rows, back-filling a matched NULL field from an older right
row that never co-occurred with the matched timestamp).  That is
one Exchange on the ``by`` key + one in-partition sort for ANY left/right
size ratio — where a SortMergeJoin-based as-of needs an inequality
band-join (quadratic per key) or an interval self-join, the union-window
is linear in rows per key and never materializes candidate pairs.

Tie rule (pinned by tests and the oracle): a right row at EXACTLY the
left row's timestamp matches (<=, not <) — right rows sort before left
rows at equal ``on``.  Right rows must be unique per (by, on); ambiguity
is resolved BEFORE the window by keeping the row with the greatest
``tie_col`` — deterministic in both engines.

Scale: shuffle volume is left+right rows × the carried columns; skewed
``by`` keys are AQE-splittable like any window.  100 TB of events against
a small right side needs no broadcast decision at all — the plan shape is
independent of the size ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``<prefix><col>`` columns from
    the latest right row with ``right.on <= left.on`` in the same ``by``
    group (NULLs when no such row — LEFT semantics).  Also emits
    ``<prefix><on>``, the matched right timestamp."""
    by = [by] if isinstance(by, str) else list(by)
    right_cols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in set(by) | {on}
    ]
    keep = list(dict.fromkeys(
        by + [on] + right_cols + ([tie_col] if tie_col else [])
    ))
    r = right.select(*keep)
    if tie_col is not None:
        r = r.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*by, on).orderBy(F.desc(tie_col))
            ),
        ).where(F.col("_rn") == 1).drop("_rn")
    carried = [f"{prefix}{on}"] + [f"{prefix}{c}" for c in right_cols]
    # the whole candidate right row rides as ONE struct: non-null per right
    # row even when fields are NULL, so last(ignorenulls) picks the matched
    # row atomically (per-column fills would tear rows — a matched NULL
    # field must stay NULL, not back-fill from an older right row)
    r = r.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(on).alias(f"{prefix}{on}"),
            *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        ).alias("_r"),
    )
    lt = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(r.schema["_r"].dataType)
    )
    u = lt.unionByName(r, allowMissingColumns=True)
    # right rows sort before left at equal `on` (_side 0 < 1) → a right row
    # at exactly the left timestamp is visible: the <= tie rule
    w = (
        Window.partitionBy(*by)
        .orderBy(on, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns] + carried
    return (
        filled.where(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"_m.{c}").alias(c) for c in carried],
        )
        .select(*out_cols)
    )
