"""Stream-stream joins with event-time interval conditions.

Spark buffers both sides in the state store and uses the watermark +
interval bounds to evict: a row is dropped once no future row on the
other side could still match it. Without the time bound, stream-stream
join state grows forever — the interval condition IS the scale contract.

Batch twin: the same join condition over static frames (tests assert
stream == batch on the same input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def purchases_with_recent_views(
    purchases: DataFrame,
    views: DataFrame,
    *,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Interval join: (purchase, view) pairs of the same user where
    the view happened within `lookback` before the purchase (half-open:
    `p.ts - lookback <= v.ts < p.ts`).

    State eviction: views older than watermark+lookback relative to the
    purchase-side watermark are dropped from the buffer. Output columns
    are prefixed (p_/v_) so the pair row is self-describing.

    how='leftOuter' keeps view-less purchases (null v_*): Spark emits an
    unmatched left row only once the watermark passes its timestamp —
    proof no late view can still match — so the null-match rows depend
    on WATERMARK ADVANCEMENT, not just on draining the data. Callers
    that need every tail row flushed before the query stops must push
    the watermark past the last purchase (see the sentinel staging in
    the registry's streaming_interval_left_join query).
    """
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("v_event_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    return p.join(
        v,
        (F.col("p_user_id") == F.col("v_user_id"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("v_ts") < F.col("p_ts")),
        how,
    )
