"""Plan-shape regression tests: the performance contract at 100 TB.

Results staying correct is not enough — these pin that filters reach
the parquet scan, dimension joins broadcast, self-joins reuse their
shuffle, and nothing degenerates into a cartesian product.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from fb_ads_bigquery_etl_spark.plans import inspect as PI
from tests.conftest import SF_DIR


def _q(spark, name):
    return entry_mod.queries()[name](spark, SF_DIR)


def test_pricing_summary_filter_pushdown(spark):
    pushed = PI.pushed_filters(_q(spark, "pricing_summary"))
    assert any("l_shipdate" in p for p in pushed), pushed


def test_pricing_summary_reads_only_needed_columns(spark):
    plan = PI.explain_str(_q(spark, "pricing_summary"))
    assert "l_comment" not in plan  # column pruning reaches the scan
    assert "ReadSchema" in plan


def test_revenue_by_nation_broadcasts_dims(spark):
    df = _q(spark, "revenue_by_nation")
    assert PI.broadcast_join_count(df) >= 2  # customer + nation at least
    assert not PI.has_cartesian(df)


def test_minhash_pipeline_runs_once(spark):
    """The banded self-join + verification joins must consume ONE
    materialization of the signature pipeline (cache scans), not
    recompute md5+minhash per consumer: exactly one parquet scan."""
    nc = PI.node_counts(_q(spark, "dedup_minhash_lsh"), execute=True)
    assert nc["InMemoryTableScan"] >= 2, nc
    assert nc["Scan"] == 1, nc  # documents.parquet read exactly once


def test_simhash_pipeline_runs_once(spark):
    nc = PI.node_counts(_q(spark, "dedup_simhash"), execute=True)
    assert nc["InMemoryTableScan"] >= 2, nc
    assert nc["Scan"] == 1, nc


def test_ngram_pipeline_runs_once(spark):
    nc = PI.node_counts(_q(spark, "dedup_ngram_jaccard"), execute=True)
    assert nc["InMemoryTableScan"] >= 2, nc
    assert nc["Scan"] == 1, nc


def test_daily_rollup_pushes_date_filter(spark):
    pushed = PI.pushed_filters(_q(spark, "daily_rollup"))
    assert pushed, "date filter should reach the orders scan"


def test_no_cartesian_anywhere(spark):
    """No query in the inventory may plan a cartesian product (the ANN
    queries use an intentional 1-row broadcast crossjoin, which is a
    BroadcastNestedLoopJoin, not CartesianProduct)."""
    for name in sorted(entry_mod.queries()):
        df = entry_mod.queries()[name](spark, SF_DIR)
        assert not PI.has_cartesian(df), f"{name} plans a CartesianProduct"


def test_agg_queries_have_partial_aggregation(spark):
    """Group-bys must map-side combine (two HashAggregate levels) so the
    shuffle moves partial states, not raw rows."""
    for name in ["pricing_summary", "daily_rollup", "conditional_agg"]:
        counts = PI.node_counts(_q(spark, name))
        assert counts["HashAggregate"] >= 2, f"{name}: no partial agg"
