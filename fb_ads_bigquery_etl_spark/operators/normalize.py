"""Normalize / flatten operators (reference T2-T6).

Turns nested raw Graph-API records (RAW_INSIGHTS_SCHEMA) into the flat,
wide `ad_data` row shape — entirely with JVM-side expressions: no Python
UDFs anywhere on this path, so the whole flatten is one WholeStageCodegen
span over the scan.

Reference semantics re-expressed:
  * extract_metric (main.py:349-356; backfill.py:126-133): value may be a
    single-element [{value: x}] wrapper or a scalar; we adopt backfill.py's
    *guarded* behavior for empty lists (main.py:354 would raise IndexError;
    SURVEY.md §7 "hard parts").
  * action pivot with zero-fill (main.py:383-391): absent action columns
    are 0, not NULL, in freshly flattened rows.
  * dot sanitization (main.py:384,390).
  * two-pass dynamic schema: distinct action_type universe first
    (main.py:517-520), then pivot with the explicit column list so Spark
    skips its own extra distinct scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fb_ads_bigquery_etl_spark.schema import (
    VIDEO_METRICS,
    sanitize_column_name,
)


def extract_metric(col: Column, *, is_float: bool = False) -> Column:
    """Single-element-array metric extraction with empty-list/NULL guard.

    [{value: "7"}] -> 7 ; [] -> 0 ; NULL -> 0. Matches backfill.py:126-133.

    try_element_at (not element_at): under Spark 4 ANSI semantics a plain
    element_at on an empty array *throws* — the exact main.py:354
    IndexError the reference's backfill path guards against.
    """
    target = "double" if is_float else "long"
    return F.coalesce(
        F.try_element_at(col, F.lit(1))["value"].cast(target), F.lit(0).cast(target)
    )


def discover_action_types(raw: DataFrame) -> list[str]:
    """Distinct action_type universe (reference main.py:517-520).

    One distinct-aggregate over the exploded actions array. The collect
    here is metadata-sized (set of action type *names*, not data rows) —
    the same two-pass shape the reference uses, and the only way to give
    pivot an explicit column list.
    """
    rows = (
        raw.select(F.explode_outer("actions").alias("a"))
        .select(F.col("a.action_type").alias("action_type"))
        .where(F.col("action_type").isNotNull())
        .distinct()
        .collect()
    )
    return sorted(r["action_type"] for r in rows)


def flatten_insights(
    raw: DataFrame, action_types: list[str] | None = None
) -> DataFrame:
    """Nested raw insights -> flat wide ad_data rows (T3+T4+T5+T6).

    Implementation note: instead of explode+groupBy+pivot (which costs a
    shuffle), we convert the actions array to a map once
    (map_from_entries) and project one column per discovered action type —
    a pure narrow transformation, so flatten never shuffles regardless of
    input size. At 100 TB this is the difference between a free map stage
    and a full-data exchange.
    """
    if action_types is None:
        action_types = discover_action_types(raw)

    cols: list[Column] = [
        F.col("campaign_name"),
        F.col("ad_name"),
        F.col("publisher_platform"),
        F.coalesce(F.col("impressions").cast("long"), F.lit(0)).alias("impressions"),
        F.coalesce(F.col("clicks").cast("long"), F.lit(0)).alias("clicks"),
        F.coalesce(F.col("spend").cast("double"), F.lit(0.0)).alias("spend"),
        F.to_date("date_start").alias("date_start"),
        F.to_date("date_stop").alias("date_stop"),
    ]
    for name, is_float in VIDEO_METRICS:
        cols.append(extract_metric(F.col(name), is_float=is_float).alias(name))

    action_map = F.map_from_entries(
        F.coalesce(
            F.col("actions"),
            F.array().cast("array<struct<action_type:string,value:string>>"),
        )
    )
    for at in action_types:
        # try_element_at: ANSI element_at throws on absent map keys; the
        # reference zero-fills absent action columns (main.py:383-386)
        cols.append(
            F.coalesce(
                F.try_element_at(action_map, F.lit(at)).cast("double"), F.lit(0.0)
            ).alias(sanitize_column_name(at))
        )
    # provenance / bookkeeping passthrough (multi-account union S5;
    # ingest-order column for exact keep-first dedup T1)
    for passthrough in ("account_id", "_ingest_order"):
        if passthrough in raw.columns:
            cols.append(F.col(passthrough))
    return raw.select(*cols)


def filter_date_range(df: DataFrame, start_date: str, end_date: str) -> DataFrame:
    """Date-range guard filter (reference backfill.py:263-269, T7).

    Catalyst pushes this predicate to the parquet scan / partition pruning;
    string-compare on ISO dates and DateType BETWEEN are equivalent.
    """
    return df.filter(F.col("date_start").between(F.lit(start_date), F.lit(end_date)))
