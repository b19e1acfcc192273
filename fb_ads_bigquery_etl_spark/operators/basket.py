"""Market-basket co-occurrence mining (frequent pair tier).

The reference delegates all analytics to BigQuery and has no mining
surface (SURVEY.md §2 "does NOT implement"); this is a north-star
extension built for the 100 TB shape:

* `pair_supports` — per-group co-occurrence supports in TWO shuffles
  total. `collect_set` fuses the (group, item) dedup into the basket
  build (one keyed shuffle); the C(basket, 2) expansion is a NARROW
  sorted-array transform (the inner slice starts past the outer index,
  so each unordered pair emits exactly once, already item_a < item_b);
  the support count is the second keyed shuffle. The naive alternative
  (distinct incidence list + self-join on the group key) costs ~6
  shuffles and re-shuffles the fact table twice.

Skew note: one mega-basket row expands to C(k, 2) pairs inside a single
task. Pass `max_basket` to drop outlier baskets deterministically (both
sides of any correctness gate must apply the same cap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def pair_supports(
    df: DataFrame,
    group_col: str | Column,
    item_col: str | Column,
    *,
    max_basket: int | None = None,
) -> DataFrame:
    """(pa, pb, support): co-occurrence count of each unordered item
    pair across groups, counting each (group, pair) once.

    NULL group keys are dropped (matching join semantics — a
    join-based formulation would never match null=null), rather than
    pooled into one mega-basket of unrelated items.
    """
    g = group_col if isinstance(group_col, Column) else F.col(group_col)
    baskets = (
        df.where(g.isNotNull())
        .groupBy(g.alias("_g"))
        .agg(F.sort_array(F.collect_set(item_col)).alias("ps"))
    )
    if max_basket is not None:
        baskets = baskets.filter(F.size("ps") <= max_basket)
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                        lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                    ),
                )
            )
        ).alias("pr")
    )
    return pairs.groupBy("pr.pa", "pr.pb").agg(F.count("*").alias("support"))
