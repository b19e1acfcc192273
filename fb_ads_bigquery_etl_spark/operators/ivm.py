"""Incremental view maintenance for JOIN views.

`analytics.incremental_rollup` maintains AGGREGATE views by recomputing
only changed date partitions; this module is the JOIN-view sibling — the
materialized fact⋈dim views a warehouse serves dashboards from, kept
fresh without full recompute:

- fact APPEND: the delta joins the dim and appends — O(delta), the view
  body is never touched;
- dim UPDATE: affected view rows are exactly those whose join key
  changed — the view is laid out bucket-partitioned on a hash of the
  join key, so the rewrite is a dynamic partition overwrite of only the
  buckets containing updated keys, O(touched buckets), not O(view).

The bucket hash (xxhash64) only determines physical layout, never
gated values — the correctness contract (gated by the
`incremental_join_view` oracle) is that the maintained view equals a
from-scratch recompute of the fully-updated join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET_COL = "_kb"


def _with_bucket(df: DataFrame, key: str, buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(buckets))
    )


def build_join_view(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    path: str,
    *,
    buckets: int = 16,
) -> None:
    """Materialize fact⋈dim bucket-partitioned on hash(join key).

    The dim side broadcasts (it is the small side by definition of this
    view shape); the bucket column rides along so later dim updates can
    rewrite only affected buckets."""
    view = _with_bucket(fact, key, buckets).join(F.broadcast(dim), key)
    view.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(path)


def apply_fact_append(
    spark: SparkSession,
    delta: DataFrame,
    dim: DataFrame,
    key: str,
    path: str,
    *,
    buckets: int = 16,
) -> None:
    """view' = view ∪ (delta ⋈ dim) — O(delta), append-only."""
    rows = _with_bucket(delta, key, buckets).join(F.broadcast(dim), key)
    rows.write.partitionBy(BUCKET_COL).mode("append").parquet(path)


def apply_dim_update(
    spark: SparkSession,
    fact: DataFrame,
    dim_updated_rows: DataFrame,
    dim_full: DataFrame,
    key: str,
    path: str,
    *,
    buckets: int = 16,
) -> None:
    """Rewrite ONLY the view buckets containing updated dim keys.

    `dim_updated_rows` carries just the changed dim rows (the CDC
    delta); `dim_full` is the post-update dim (joined when rebuilding
    the touched buckets, since those buckets also hold rows keyed to
    unchanged dims). The touched-bucket set is metadata-sized (<=
    `buckets` values, collected like partition values in
    sinks.merge_upsert); the rewrite reads only those fact buckets —
    bounded IO however large the view is."""
    touched = [
        r[0]
        for r in _with_bucket(dim_updated_rows, key, buckets)
        .select(BUCKET_COL)
        .distinct()
        .collect()
    ]
    if not touched:
        return
    rebuilt = (
        _with_bucket(fact, key, buckets)
        .filter(F.col(BUCKET_COL).isin(touched))
        .join(F.broadcast(dim_full), key)
        .localCheckpoint(eager=True)  # cut lineage: overwrites its own input path's partitions
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rebuilt.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_join_view(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(BUCKET_COL)
