"""Edge-case semantics for operators/temporal.py (as-of + range join).

The oracle-parity suite covers bulk correctness; these pin the boundary
rules: inclusivity at equal timestamps, tie-breaks among simultaneous
right rows, unmatched-left behavior, and half-open range bounds.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F, types as T

from fb_ads_bigquery_etl_spark.operators.temporal import asof_join, range_count_join


def _ts(s: str):
    return datetime.fromisoformat(s)


_LEFT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
_RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType()),
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_asof_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),  # equal-ts: inclusive
            (2, "a", _ts("2024-01-01 09:00:00")),  # before any right: null
            (3, "b", _ts("2024-01-01 12:00:00")),  # key with no right rows
        ],
        _LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (10, "a", _ts("2024-01-01 10:00:00")),
            (11, "a", _ts("2024-01-01 10:00:00")),  # same ts: max rid wins
            (12, "a", _ts("2024-01-01 11:00:00")),  # after left row 1: ignored
        ],
        _RIGHT_SCHEMA,
    )
    out = {
        r["id"]: r["asof_rid"]
        for r in asof_join(
            left,
            right,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["rid"],
            right_order=["rid"],
        ).collect()
    }
    assert out == {1: 11, 2: None, 3: None}


def test_asof_keeps_every_left_row(spark):
    left = spark.createDataFrame(
        [(i, "k", _ts("2024-01-01 10:00:00")) for i in range(5)], _LEFT_SCHEMA
    )
    right = spark.createDataFrame([], _RIGHT_SCHEMA)
    got = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["rid"]
    )
    assert got.count() == 5
    assert got.filter(F.col("asof_rid").isNotNull()).count() == 0


def test_range_join_half_open_bounds(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00"))], _LEFT_SCHEMA
    )
    right = spark.createDataFrame(
        [
            (10, "a", _ts("2024-01-01 09:00:00")),  # == ts-1h: IN (closed low)
            (11, "a", _ts("2024-01-01 09:30:00")),  # inside
            (12, "a", _ts("2024-01-01 10:00:00")),  # == ts: OUT (open high)
            (13, "a", _ts("2024-01-01 08:59:59")),  # below window
            (14, "b", _ts("2024-01-01 09:30:00")),  # other key
        ],
        _RIGHT_SCHEMA,
    )
    row = range_count_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="ts",
        window_us=3_600_000_000,
    ).collect()[0]
    assert row["n_in_range"] == 2


def test_range_join_unmatched_left_survives(spark):
    left = spark.createDataFrame(
        [(1, "zzz", _ts("2024-01-01 10:00:00"))], _LEFT_SCHEMA
    )
    right = spark.createDataFrame([], _RIGHT_SCHEMA)
    rows = range_count_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", window_us=3_600_000_000
    ).collect()
    assert len(rows) == 1 and rows[0]["n_in_range"] == 0


def test_asof_null_field_in_latest_right_row_stays_null(spark):
    """Row-level as-of semantics: if the most recent right row has a NULL
    in one carried column, the output must NOT stitch that column from
    an older right row."""
    left = spark.createDataFrame([("k", 10)], ["key", "ts"])
    right = spark.createDataFrame(
        [("k", 1, "old_px", "old_qty"), ("k", 5, "new_px", None)],
        ["key", "ts", "px", "qty"],
    )
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="ts",
        right_cols=["px", "qty"],
    ).head()
    assert out["asof_px"] == "new_px"
    assert out["asof_qty"] is None  # NOT "old_qty"


def test_asof_forward_picks_next_row_inclusive(spark):
    """direction='forward' attaches the SMALLEST right_ts >= left_ts;
    equality is inclusive, and among equal-(key, ts) right rows the
    right_order-last row wins (same tie rule as backward)."""
    left = spark.createDataFrame([("k", 5), ("k", 7)], ["key", "ts"])
    right = spark.createDataFrame(
        [("k", 3, "past"), ("k", 7, "at"), ("k", 7, "at2"), ("k", 9, "next")],
        ["key", "ts", "tag"],
    )
    rows = {
        r["ts"]: r["asof_tag"]
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="ts",
            right_cols=["tag"], right_order=["tag"], direction="forward",
        ).collect()
    }
    assert rows == {5: "at2", 7: "at2"}  # inclusive at 7; tag-last wins


def test_asof_forward_unmatched_left_gets_null(spark):
    left = spark.createDataFrame([("k", 10)], ["key", "ts"])
    right = spark.createDataFrame([("k", 3, "past")], ["key", "ts", "tag"])
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="ts",
        right_cols=["tag"], direction="forward",
    ).head()
    assert out["asof_tag"] is None


def test_asof_rejects_unknown_direction(spark):
    import pytest as _pytest

    left = spark.createDataFrame([("k", 1)], ["key", "ts"])
    with _pytest.raises(ValueError):
        asof_join(
            left, left, on=["key"], left_ts="ts", right_ts="ts",
            right_cols=["ts"], direction="sideways",
        )
