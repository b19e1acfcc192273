"""Temporal join operators: as-of join and bounded range join.

The reference has no temporal joins (SURVEY.md §2 "does NOT implement");
these are north-star extensions built the way a 100 TB engine needs them:

* `asof_join` — sort-merge via UNION + keyed window, ONE shuffle on the
  join key, no range cross-product. This is the classic scalable plan
  (kdb/QuestDB/Flink temporal join shape): interleave both streams on
  (key, ts), carry the last-seen right row forward with
  `last(..., ignorenulls=True)`, keep left rows. Cost is O(n log n)
  within each key partition regardless of time-range density, vs the
  O(n·m) blowup of a naive `a.ts >= b.ts` theta join.

* `range_count_join` — bounded-window range join via time bucketing:
  each right row lands in one bucket; each left row probes the few
  buckets its window can span (explode by ceil(window/bucket)+1 keys).
  The theta condition becomes an equi-join Catalyst can hash/sort-merge,
  so it shuffles on (key, bucket) instead of building a cartesian range.

Both avoid driver-side state entirely and inherit AQE skew splitting on
the shuffle keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_order: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the
    greatest `right_ts <= left_ts` (direction="backward", default) or
    the smallest `right_ts >= left_ts` (direction="forward") for the
    same `on` key (inclusive either way). Same single-shuffle
    union+keyed-window plan in both directions — forward simply scans
    the interleaved stream in descending ts order.

    `right_order` breaks ties among right rows sharing (key, ts): the row
    that sorts LAST wins, deterministically. Output = every left column
    plus `prefix + c` for each requested right column (null when no
    right row exists on the joined side of left_ts — at-or-before it
    for backward, at-or-after it for forward).

    Row-level semantics: the carried right columns are packed into ONE
    struct and carried with a single `last(ignorenulls=True)`, so every
    attached value comes from the SAME right row — a genuinely-NULL
    field in the most recent right row stays NULL instead of being
    stitched from an older row (which independent per-column `last`
    calls would do).
    """
    right_order = right_order or []
    l_marked = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_o_{c}") for c in right_order],
    )
    r_marked = right.select(
        *[
            F.col(c).alias(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.col(c).alias(f"_o_{c}") for c in right_order],
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # Right rows sort before left rows at equal ts (asof is inclusive);
    # among right rows sharing (key, ts), right_order ascending so the
    # last one seen wins. Forward scans ts DESCENDING, so the running
    # last(ignorenulls) carries the nearest following right row instead
    # of the nearest preceding one.
    ts_ordered = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(
            ts_ordered,
            F.col("_side").asc(),
            *[F.col(f"_o_{c}").asc_nulls_first() for c in right_order],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Pack right columns into one struct: non-null for every right row
    # (even when individual fields are null), null for left rows — so
    # last(ignorenulls) selects whole right ROWS, never mixes rows.
    packed = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"_r_{c}").alias(c) for c in right_cols]),
    )
    carried = l_marked.unionByName(r_marked).select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        F.last(packed, ignorenulls=True).over(w).alias("_asof_row"),
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col("_asof_row")[c].alias(f"{prefix}{c}") for c in right_cols],
        )
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_us: int,
    right_vals: list[str] | None = None,
    agg: list[Column] | None = None,
) -> DataFrame:
    """For each left row, aggregate right rows of the same key with
    `left_ts - window <= right_ts < left_ts` (half-open, backward).

    Implementation: bucket `right_ts` to `window`-sized epochs; each left
    row probes the (at most 2) buckets its lookback can span via
    `explode(array_distinct(...))` — a narrow transform, no extra
    shuffle. The theta condition becomes an equi-join on (key, bucket)
    that Catalyst can hash/sort-merge, the exact bounds are post-filtered,
    and a final group-by restores one row per left row. Two shuffles
    total (join + regroup) regardless of time density — no O(n·m) range
    cross-product, no broadcast requirement on either side.

    Right columns named in `right_vals` are exposed to `agg` as `_r_<c>`,
    nulled outside the exact window. `agg` defaults to
    `count(_r__ts) AS n_in_range`; aggregates must be null-tolerant
    because unmatched left rows survive (left outer).
    """
    right_vals = right_vals or []
    l_us = F.unix_micros(F.col(left_ts))
    l_b = left.withColumn(
        "_bkt",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(l_us / window_us),
                    F.floor((l_us - window_us) / window_us),
                )
            )
        ),
    )
    r_b = right.select(
        *[F.col(c).alias(f"_rk_{c}") for c in on],
        F.col(right_ts).alias("_r__ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_vals],
        F.floor(F.unix_micros(F.col(right_ts)) / window_us).alias("_bkt"),
    )
    cond = [l_b["_bkt"] == r_b["_bkt"]] + [l_b[c] == r_b[f"_rk_{c}"] for c in on]
    r_us = F.unix_micros(F.col("_r__ts"))
    in_window = (r_us >= l_us - window_us) & (r_us < l_us)
    joined = l_b.join(r_b, cond, "left").select(
        *[l_b[c] for c in left.columns],
        *[
            F.when(in_window, F.col(c)).alias(c)
            for c in ["_r__ts", *[f"_r_{v}" for v in right_vals]]
        ],
    )
    aggs = agg or [F.count(F.col("_r__ts")).alias("n_in_range")]
    return joined.groupBy(*[F.col(c) for c in left.columns]).agg(*aggs)


def rolling_distinct(
    df: DataFrame,
    day_col: str,
    id_col: str,
    *,
    days: int = 7,
    observed_days_only: bool = True,
) -> DataFrame:
    """Rolling N-day EXACT distinct ids per day — the classically hard
    rolling metric (COUNT(DISTINCT) OVER a range frame is unsupported,
    and sketches change semantics).

    Scatter shape: each (day, id) pair contributes itself to its N
    forward report days, then ONE distinct-aggregate per
    (report_day, id) collapses duplicates and a count per day finishes.
    Two keyed shuffles, parallelism day x id sized, no window anywhere.
    With `observed_days_only`, report days are semi-joined against the
    observed day list (otherwise every scattered day reports).
    Returns (day, n_distinct).
    """
    day_id = df.select(F.col(day_col).alias("day"), F.col(id_col).alias("id")).distinct()
    offs = F.array(*[F.lit(i) for i in range(days)])
    scattered = day_id.select(
        F.explode(offs).alias("off"), "day", "id"
    ).select(F.date_add(F.col("day"), F.col("off")).alias("day"), "id")
    if observed_days_only:
        scattered = scattered.join(
            day_id.select("day").distinct(), "day", "left_semi"
        )
    return (
        scattered.distinct()
        .groupBy("day")
        .agg(F.count("*").alias("n_distinct"))
    )
