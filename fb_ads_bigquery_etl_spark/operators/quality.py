"""Data-quality validation: declarative expectations -> violation counts.

Generalizes the reference's operational checks (row-count
reconciliation load_csv_to_bq.py:106-110, freshness OK/MISSING_DATA
docs/DEPLOYMENT.md:464-474) into a reusable audit operator: declare
expectations per column, get one tiny summary row back. The whole audit
is ONE pass over the table (every expectation compiles into the same
aggregate projection — no per-check scans) and the output is
metadata-sized, so it runs as a cheap post-write gate at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expectation:
    """A named predicate that every row should satisfy."""

    name: str
    predicate: Column  # true = row passes


def not_null(col: str) -> Expectation:
    return Expectation(f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(f"{col}_in_range", F.col(col).between(lo, hi))


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(f"{col}_matches", F.col(col).rlike(pattern))


def audit(df: DataFrame, expectations: Sequence[Expectation]) -> DataFrame:
    """One row: total_rows + a violation count per expectation.

    count_if(NOT p) per expectation — all inside one aggregate, so the
    audit costs exactly one scan regardless of how many checks ride it.

    Three-valued-logic note: a row where the predicate evaluates to NULL
    (e.g. a range check on a NULL column) counts as neither pass nor
    violation — pair value checks with `not_null` to surface NULLs.
    """
    aggs = [F.count("*").alias("total_rows")] + [
        F.count_if(~e.predicate).alias(f"violations_{e.name}")
        for e in expectations
    ]
    return df.agg(*aggs)


def duplicate_key_count(df: DataFrame, key: Sequence[str]) -> DataFrame:
    """(n_keys, n_dup_keys, n_excess_rows) for a declared unique key —
    the audit twin of dedup (reference §1.4 key)."""
    per_key = df.groupBy(*key).agg(F.count("*").alias("n"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.count_if(F.col("n") > 1).alias("n_dup_keys"),
        F.sum(F.col("n") - 1).alias("n_excess_rows"),
    )
