"""SCD2 history semantics beyond the oracle gate: consecutive-change
collapse, null attributes, and point-in-time (as-of) enrichment."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from fb_ads_bigquery_etl_spark.operators.scd import asof_attribute, scd2_history


def _ts(h):
    return datetime.datetime(2026, 1, 1, h, 0, 0)


def test_scd2_collapses_and_versions(spark):
    rows = [
        # key 1: a,a,b,b,a -> versions a@0, b@2, a@4
        (1, _ts(0), 0, "a"),
        (1, _ts(1), 1, "a"),
        (1, _ts(2), 2, "b"),
        (1, _ts(3), 3, "b"),
        (1, _ts(4), 4, "a"),
        # key 2: null then value -> null is a real version
        (2, _ts(0), 5, None),
        (2, _ts(1), 6, "x"),
        (2, _ts(2), 7, None),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, id long, attr string"
    )
    hist = scd2_history(df, "k", "ts", ["attr"], tiebreak_col="id")
    got = [
        (r["k"], r["attr"], r["effective_from"], r["effective_to"],
         r["is_current"], r["version"])
        for r in hist.orderBy("k", "version").collect()
    ]
    assert got == [
        (1, "a", _ts(0), _ts(2), False, 1),
        (1, "b", _ts(2), _ts(4), False, 2),
        (1, "a", _ts(4), None, True, 3),
        (2, None, _ts(0), _ts(1), False, 1),
        (2, "x", _ts(1), _ts(2), False, 2),
        (2, None, _ts(2), None, True, 3),
    ]


def test_asof_attribute_picks_valid_version(spark):
    dim = [
        (1, _ts(0), 0, "old"),
        (1, _ts(5), 1, "new"),
    ]
    ddf = spark.createDataFrame(
        dim, "k long, ts timestamp, id long, attr string"
    )
    hist = scd2_history(ddf, "k", "ts", ["attr"], tiebreak_col="id")
    facts = spark.createDataFrame(
        [(10, 1, _ts(2)), (11, 1, _ts(5)), (12, 1, _ts(9)), (13, 9, _ts(1))],
        "fid long, k long, fts timestamp",
    )
    got = {
        r["fid"]: r["attr"]
        for r in asof_attribute(facts, hist, "k", "fts").collect()
    }
    # boundary: at exactly effective_from of v2, v2 applies (>= from, < to)
    assert got == {10: "old", 11: "new", 12: "new", 13: None}
