"""Table profiling and data-quality constraint checks (Deequ/Great-
Expectations shape) — the validation pass a pipeline runs before
publishing a table.

Two operators:

- `profile_table`: one row per column with (count, nulls, distinct,
  min, max) — the column-statistics profile warehouse catalogs store.
  ALL columns profile in a single scan: per-column aggregates fuse
  into one map-side-combined aggregation (no per-column passes), and
  min/max stringify so heterogeneous column types share one output
  schema. distinct is exact (count_distinct partial-aggregates fine at
  any scale; swap approx_count_distinct at 100 TB if 2%% error is
  acceptable — the profile contract doesn't change).

- `check_constraints`: declarative row-level checks (not-null, range,
  set membership, custom predicate) evaluated as conditional
  aggregates in ONE scan, plus key-uniqueness (one groupBy) and
  referential integrity (one anti-join vs the parent) as the only
  checks that legitimately need a shuffle. Output is (check, kind,
  n_violations, passed) — metadata-sized.

Both are gated end-to-end by the `table_profile` / `dq_checks`
oracles. No reference counterpart; the reference's only validation is
BigQuery load-time schema enforcement (load_csv_to_bq.py:86-91) — this
is the engine-native generalization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Single-scan column profile: (column, n_rows, n_null,
    n_distinct, min_value, max_value) — min/max as strings so every
    column type shares the schema (dates render ISO, numerics
    plainly)."""
    aggs: list[Column] = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).cast("long").alias(f"_cnt_{c}"),
            F.count_distinct(col).cast("long").alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(F.count("*").cast("long").alias("_n"), *aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_cnt_{c}")).cast("long").alias("n_null"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


def check_not_null(name: str, col: str) -> dict:
    return {"name": name, "kind": "not_null", "violation": F.col(col).isNull()}


def check_range(name: str, col: str, lo, hi) -> dict:
    return {
        "name": name,
        "kind": "range",
        "violation": ~F.col(col).between(lo, hi) | F.col(col).isNull(),
    }


def check_in_set(name: str, col: str, allowed: Sequence) -> dict:
    return {
        "name": name,
        "kind": "in_set",
        "violation": ~F.col(col).isin(list(allowed)) | F.col(col).isNull(),
    }


def check_predicate(name: str, predicate: Column) -> dict:
    """Custom row predicate that must HOLD; violations are rows where
    it is false or null."""
    return {
        "name": name,
        "kind": "predicate",
        "violation": ~F.coalesce(predicate, F.lit(False)),
    }


def check_unique(name: str, cols: Sequence[str]) -> dict:
    return {"name": name, "kind": "unique", "cols": list(cols)}


def check_references(name: str, col: str, parent: DataFrame, parent_col: str) -> dict:
    return {
        "name": name,
        "kind": "references",
        "col": col,
        "parent": parent,
        "parent_col": parent_col,
    }


def check_constraints(df: DataFrame, checks: Sequence[dict]) -> DataFrame:
    """Evaluate all checks; rows = (check, kind, n_violations, passed).

    Row-level checks fuse into ONE conditional-aggregate scan;
    `unique` adds one groupBy (violations = rows in over-populated key
    groups, i.e. n - distinct-key count adjusted to count ALL rows of
    duplicated keys); `references` adds one anti-join per parent
    (violations = child rows whose key has no parent — the broadcast/
    shuffle choice is Catalyst's by parent size)."""
    row_checks = [c for c in checks if "violation" in c]
    out_frames: list[DataFrame] = []
    if row_checks:
        aggs = [
            F.count_if(c["violation"]).cast("long").alias(f"_v{i}")
            for i, c in enumerate(row_checks)
        ]
        one = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(c["name"]).alias("check"),
                F.lit(c["kind"]).alias("kind"),
                F.col(f"_v{i}").alias("n_violations"),
            )
            for i, c in enumerate(row_checks)
        ]
        out_frames.append(
            one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
        )
    for c in checks:
        if c.get("kind") == "unique":
            dup_rows = (
                df.groupBy(*c["cols"])
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_violations"))
            )
            out_frames.append(
                dup_rows.select(
                    F.lit(c["name"]).alias("check"),
                    F.lit("unique").alias("kind"),
                    "n_violations",
                )
            )
        elif c.get("kind") == "references":
            orphans = (
                df.select(F.col(c["col"]).alias("_k"))
                .join(
                    c["parent"].select(
                        F.col(c["parent_col"]).alias("_k")
                    ).distinct(),
                    "_k",
                    "left_anti",
                )
                .agg(F.count("*").cast("long").alias("n_violations"))
            )
            out_frames.append(
                orphans.select(
                    F.lit(c["name"]).alias("check"),
                    F.lit("references").alias("kind"),
                    "n_violations",
                )
            )
    out = out_frames[0]
    for f in out_frames[1:]:
        out = out.unionByName(f)
    return out.withColumn("passed", F.col("n_violations") == 0)
