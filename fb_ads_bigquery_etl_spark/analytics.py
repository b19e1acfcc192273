"""Analytics layer (reference Q1-Q5) — the SQL the reference delegates to
BigQuery (docs/DEPLOYMENT.md:445-474; README.md:383-385; docs/GCP_SETUP.md:360-367),
as native DataFrame helpers. Current-date is injected, never wall-clock
(testability; FIXTURES.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_ctas(df: DataFrame) -> DataFrame:
    """Q1: SELECT DISTINCT * (README.md:383-385)."""
    return df.distinct()


def freshness(df: DataFrame, date_col: str = "date_start") -> DataFrame:
    """Q2: SELECT MAX(date_start) AS latest_date (docs/DEPLOYMENT.md:448-451)."""
    return df.agg(F.max(date_col).alias("latest_date"))


def daily_rollup(
    df: DataFrame,
    *,
    current_date: str,
    days: int = 7,
    date_col: str = "date_start",
    metrics: tuple[str, ...] = ("impressions", "spend"),
) -> DataFrame:
    """Q3: last-N-days rollup (docs/DEPLOYMENT.md:453-462).

    Partition-pruned scan -> partial hash aggregate -> final aggregate.
    """
    agg_cols = [F.count("*").alias("row_count")] + [
        F.sum(m).alias(f"total_{m}") for m in metrics
    ]
    return (
        df.filter(F.col(date_col) >= F.date_sub(F.lit(current_date).cast("date"), days))
        .groupBy(date_col)
        .agg(*agg_cols)
        .orderBy(F.col(date_col).desc())
    )


def freshness_status(
    df: DataFrame, *, current_date: str, date_col: str = "date_start"
) -> DataFrame:
    """Q4: OK/MISSING_DATA scalar check (docs/DEPLOYMENT.md:466-474)."""
    return df.agg(
        F.max(date_col).alias("latest_date"),
        F.when(
            F.max(date_col) == F.date_sub(F.lit(current_date).cast("date"), 1),
            F.lit("OK"),
        )
        .otherwise(F.lit("MISSING_DATA"))
        .alias("status"),
    )


def row_count(df: DataFrame) -> DataFrame:
    """Q5: SELECT COUNT(*) AS row_count (docs/GCP_SETUP.md:362-365)."""
    return df.agg(F.count("*").alias("row_count"))
