"""Slowly-changing-dimension history (SCD Type 2) from a changelog.

The standard warehouse dimension-versioning operator: given a stream of
observations (key, ts, attributes...), emit one row per key per
ATTRIBUTE VERSION with [effective_from, effective_to) validity and an
is_current flag — consecutive observations with unchanged attributes
collapse into one version. This is what turns a CDC/event changelog
into the join-able dimension history that point-in-time (as-of)
queries need; the reference's pipeline has no history (BigQuery table
is overwritten per day), so this is a north-star extension like the
CDC upsert sink it composes with.

Scale shape: everything is ONE hash-partition by key + one sort per
partition — the two window functions (change detection via lag,
validity close via lead) share the same (key, ts) ordering, so
Catalyst plans a single Exchange + single Sort. No corpus-sized join,
no driver state; skewed keys are bounded by per-key history length,
not corpus size. Gated end-to-end by the `scd2_history` oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a changelog into SCD2 version rows.

    Returns (key, attrs..., effective_from, effective_to, is_current,
    version) where effective_to is NULL for the open version and
    `version` numbers a key's versions from 1 in time order. Rows
    whose attributes equal the key's previous observation are
    absorbed into the running version (no new row). Ties on ts are
    broken by `tiebreak_col` (pass a unique id for determinism when
    timestamps can collide)."""
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)

    # null-safe struct compare: a NULL attribute must count as a value,
    # and the first observation (lag = NULL) always opens a version
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = ~attrs.eqNullSafe(F.lag(attrs).over(w))
    starts = (
        df.withColumn("_chg", changed)
        .filter(F.col("_chg"))
        .drop("_chg")
    )
    # the second window re-uses the same (key, order) partitioning: the
    # filter preserved distribution and order, so no extra exchange
    return (
        starts.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("effective_to").isNull())
        .withColumn(
            "version", F.row_number().over(w).cast("long")
        )
        .select(
            key_col,
            *attr_cols,
            "effective_from",
            "effective_to",
            "is_current",
            "version",
        )
    )


def asof_attribute(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Point-in-time enrichment: each fact row picks the history
    version valid at its timestamp (effective_from <= ts < coalesce(
    effective_to, +inf)). A range join on the version intervals —
    each fact matches EXACTLY ONE version by construction, so the
    join multiplicity is 1 and the output is fact-sized."""
    h = history.select(
        F.col(key_col).alias("_hk"),
        *[c for c in history.columns if c not in (key_col,)],
    )
    cond = (
        (facts[key_col] == h["_hk"])
        & (facts[ts_col] >= h["effective_from"])
        & (
            h["effective_to"].isNull()
            | (facts[ts_col] < h["effective_to"])
        )
    )
    return facts.join(h, cond, "left").drop("_hk")
