"""Distributed exact global ranking — order-preserving range bucketing.

A global `row_number() OVER (ORDER BY ...)` plans as a single-task
window: the whole table funnels through one partition, the canonical
scale-killer (SURVEY notes it for `percent_rank`). The distributed form
is the classic sort-rank decomposition, the same offset-stitching shape
as `packing.pack_chunks_sharded`:

1. bucket every row by an ORDER-PRESERVING cut of the leading sort key
   (integer `key div width` — deterministic, no sampling pass; Spark's
   own `orderBy` samples ranges instead, which is NOT reproducible
   across runs, so a gateable rank can't use it);
2. rank locally inside each bucket (window keyed by bucket — max
   partition is bounded by the bucket width's row count, independent of
   table size);
3. prefix-sum the per-bucket counts (one row per bucket — metadata) and
   broadcast the offsets back: global_rank = offset + local_rank.

Ranks are exact and bit-identical to the single-window form for any
bucket width (prefix sums associate; ties must be fully broken by the
`order_cols` list or ranks would be nondeterministic in BOTH forms).

No reference counterpart (north-star extension, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_row_number(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    *,
    rank_col: str = "rank",
) -> DataFrame:
    """Append an exact 1-based global row number ordered by `order_cols`.

    `bucket` must be a monotone function of the leading sort key
    (e.g. ``(cents / width).cast("long")`` for an ascending integer
    key): every row in bucket b sorts before every row in bucket b+1.
    Ties across `order_cols` must be impossible (include a unique key).
    """
    local = df.withColumn("_bkt", bucket).withColumn(
        "_lrn",
        F.row_number().over(
            Window.partitionBy("_bkt").orderBy(*order_cols)
        ),
    )
    counts = df.withColumn("_bkt", bucket).groupBy("_bkt").agg(
        F.count("*").alias("_n")
    )
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0).cast("long"),
        ),
    ).select("_bkt", "_off")
    # the offsets window is global but runs over ONE ROW PER BUCKET —
    # metadata-sized at any table size
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(rank_col, F.col("_off") + F.col("_lrn"))
        .drop("_bkt", "_lrn", "_off")
    )
