"""As-of join (functions/asof.asof_join): semantics pinned against a
pandas merge_asof cross-check, the <= tie rule, deterministic right-side
tie resolution, and the no-join plan shape (one exchange, no band join)."""

import numpy as np
import pandas as pd

from full_text_index_spark.functions.asof import asof_join


def _frames(spark, left_rows, right_rows):
    l = spark.createDataFrame(
        pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts"])
    )
    r = spark.createDataFrame(
        pd.DataFrame(right_rows, columns=["user_id", "ts", "value"])
    )
    return l, r


def test_asof_semantics_and_left_nulls(spark):
    T = pd.Timestamp
    l, r = _frames(
        spark,
        [(0, 1, T("2024-01-01 10:00")),   # before any right row → NULL
         (1, 1, T("2024-01-01 12:00")),   # after r@11:00
         (2, 1, T("2024-01-01 14:30")),   # after r@14:00
         (3, 2, T("2024-01-01 12:00"))],  # other group: only r@09:00
        [(1, T("2024-01-01 11:00"), 10.0),
         (1, T("2024-01-01 14:00"), 20.0),
         (2, T("2024-01-01 09:00"), 30.0)],
    )
    got = (
        asof_join(l, r, on="ts", by="user_id", right_cols=["value"])
        .orderBy("event_id").toPandas()
    )
    assert got["asof_value"].tolist()[1:] == [10.0, 20.0, 30.0]
    assert pd.isna(got["asof_value"].iloc[0])
    assert pd.isna(got["asof_ts"].iloc[0])
    assert got["asof_ts"].iloc[2] == T("2024-01-01 14:00")
    # left columns pass through untouched, row count preserved
    assert got["event_id"].tolist() == [0, 1, 2, 3]


def test_asof_equal_timestamp_matches(spark):
    T = pd.Timestamp
    l, r = _frames(
        spark,
        [(0, 1, T("2024-01-01 11:00"))],
        [(1, T("2024-01-01 11:00"), 42.0)],
    )
    got = asof_join(l, r, right_cols=["value"]).toPandas()
    # <= rule: a right row at exactly the left timestamp matches
    assert got["asof_value"].iloc[0] == 42.0


def test_asof_tie_col_resolution(spark):
    T = pd.Timestamp
    l = spark.createDataFrame(pd.DataFrame(
        [(0, 1, T("2024-01-01 12:00"))],
        columns=["event_id", "user_id", "ts"],
    ))
    r = spark.createDataFrame(pd.DataFrame(
        [(1, T("2024-01-01 11:00"), 10.0, 100),
         (1, T("2024-01-01 11:00"), 20.0, 200)],  # same (by, on): max seq wins
        columns=["user_id", "ts", "value", "seq"],
    ))
    got = asof_join(l, r, right_cols=["value"], tie_col="seq").toPandas()
    assert got["asof_value"].iloc[0] == 20.0


def test_asof_matches_pandas_merge_asof(spark):
    rng = np.random.RandomState(3)
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame({
        "event_id": np.arange(400, dtype=np.int64),
        "user_id": rng.randint(0, 8, 400).astype(np.int64),
        "ts": [base + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 100000, 400)],
    })
    rpdf = pd.DataFrame({
        "user_id": rng.randint(0, 8, 150).astype(np.int64),
        "ts": [base + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 100000, 150)],
        "value": rng.randint(0, 1000, 150) / 10.0,
    }).drop_duplicates(["user_id", "ts"])
    got = (
        asof_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
            right_cols=["value"],
        )
        .orderBy("event_id").toPandas()
    )
    exp = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts").rename(
            columns={"ts": "asof_ts", "value": "asof_value"}
        ),
        left_on="ts", right_on="asof_ts", by="user_id",
        direction="backward", allow_exact_matches=True,
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "asof_ts", "asof_value"]],
        exp[["event_id", "asof_ts", "asof_value"]],
    )


def test_asof_plan_has_no_join(spark):
    T = pd.Timestamp
    l, r = _frames(spark, [(0, 1, T("2024-01-01"))],
                   [(1, T("2024-01-01"), 1.0)])
    plan = asof_join(l, r, right_cols=["value"])._jdf.queryExecution()\
        .executedPlan().toString()
    assert "Join" not in plan          # no band/SMJ join — union + window
    assert "Window" in plan

def test_asof_null_right_field_stays_null(spark):
    """A NULL field in the MATCHED right row must come through as NULL —
    not back-filled from an older right row (atomic-row semantics; DuckDB
    ASOF JOIN agrees)."""
    T = pd.Timestamp
    l, r = _frames(
        spark,
        [(0, 1, T("2024-01-01 12:00"))],
        [(1, T("2024-01-01 10:00"), 5.0),
         (1, T("2024-01-01 11:00"), None)],  # the asof match, value NULL
    )
    got = asof_join(l, r, on="ts", by="user_id",
                    right_cols=["value"]).toPandas()
    assert got["asof_ts"].iloc[0] == T("2024-01-01 11:00")
    assert pd.isna(got["asof_value"].iloc[0])  # NOT 5.0
