"""Change-data-capture changelog application (last-writer-wins).

Collapses an insert/update/delete changelog into current-state rows:
for each key keep the highest-version record, then drop tombstones.
This is the batch form of the MERGE a CDC sink applies continuously
(sinks.merge_upsert / scd2_apply are the write-side siblings; this is
the pure transformation, usable mid-pipeline).

Scale shape: ONE hash aggregate keyed by the logical key — max_by packs
the winning row as a struct, so partial aggregation keeps one candidate
row per key per map task (no row_number window, no n_groups-task
funnel, no shuffle of losing versions past the combiner).

No reference counterpart (north-star extension, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def changelog_latest(
    changelog: DataFrame,
    key: tuple[str, ...],
    version_col: str,
    *,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Current state from a changelog: argmax(version) per key, deletes
    removed. `version_col` must be unique per key (a commit LSN /
    monotonic sequence — ties would make "latest" ambiguous; enforce
    upstream)."""
    latest = changelog.groupBy(*[F.col(c) for c in key]).agg(
        F.max_by(F.struct(*changelog.columns), F.col(version_col)).alias("_r")
    )
    return latest.select("_r.*").filter(F.col(op_col) != delete_op)
