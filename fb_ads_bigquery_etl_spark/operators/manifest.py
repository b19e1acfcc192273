"""File-manifest scan pruning (the Iceberg/Delta-manifest pattern).

Parquet footers already carry min/max per file, but the planner must
OPEN every footer to use them — at 100 TB (millions of files) footer
listing is itself the bottleneck. Table formats fix this with a
MANIFEST: a tiny table of per-file stats consulted at plan time, so a
selective query opens only the files whose [min, max] envelope
intersects its predicate. This module is that pattern over plain
parquet: build the manifest with one scan, prune reads with a
metadata-sized lookup.

Pruning is conservative (envelope overlap is a superset of true
matches) and the exact filter still applies after the read, so results
are identical to a full scan by construction — which is exactly what
the `manifest_pruned_scan` oracle gate proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_file_manifest(
    spark: SparkSession, path: str, stat_cols: tuple[str, ...]
) -> DataFrame:
    """Per-file stats table: (file, n_rows, min_<c>, max_<c> ...).

    One scan grouped by input_file_name — output is file-count rows
    (metadata-sized). Rebuild incrementally on append by scanning only
    new files and unioning."""
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def pruned_files(
    manifest: DataFrame, col: str, lo, hi
) -> list[str]:
    """Files whose [min_col, max_col] envelope intersects [lo, hi].

    The manifest is metadata-sized; collecting the matching paths is a
    plan-time lookup, not a data read."""
    return [
        r["file"]
        for r in manifest.filter(
            (F.col(f"max_{col}") >= lo) & (F.col(f"min_{col}") <= hi)
        )
        .select("file")
        .collect()
    ]


def manifest_pruned_read(
    spark: SparkSession,
    manifest: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Read ONLY the manifest-selected files and re-apply the exact
    predicate (pruning is conservative). Empty selection returns an
    empty frame with the files' schema unavailable — callers guard."""
    files = pruned_files(manifest, col, lo, hi)
    df = spark.read.parquet(*files)
    return df.filter(F.col(col).between(lo, hi))
