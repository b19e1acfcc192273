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


def _stat_aggs(stat_cols: tuple[str, ...]):
    aggs = [F.count("*").alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return aggs


def build_file_manifest(
    spark: SparkSession, path: str, stat_cols: tuple[str, ...]
) -> DataFrame:
    """Per-file stats table: (file, n_rows, min_<c>, max_<c> ...).

    One scan grouped by input_file_name — output is file-count rows
    (metadata-sized). On append, refresh with `update_file_manifest`,
    which scans ONLY the new files and unions."""
    df = spark.read.parquet(path)
    return df.groupBy(F.input_file_name().alias("file")).agg(
        *_stat_aggs(stat_cols)
    )


def _list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Driver-side directory listing via the Hadoop FileSystem API — a
    metadata operation (one listStatus RPC), never a data read."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return [
        st.getPath().toString()
        for st in fs.listStatus(jpath)
        if st.isFile() and not st.getPath().getName().startswith(("_", "."))
    ]


def update_file_manifest(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    stat_cols: tuple[str, ...],
) -> DataFrame:
    """Incremental manifest refresh after an append: list the dataset
    directory (metadata-only), scan ONLY files absent from `manifest`,
    and union their stats in. Cost is O(appended data), independent of
    table size — the property that keeps the manifest pattern viable at
    100 TB, where a full rebuild would itself be a full-table scan.

    File identity is the path basename (part-XXXXX-<uuid> names are
    globally unique), which makes the match robust to URI-scheme
    differences between input_file_name() ('file:///...') and the
    FileSystem listing ('file:/...')."""
    known = {
        r["file"].rsplit("/", 1)[-1]
        for r in manifest.select("file").collect()
    }
    new = [
        f
        for f in _list_data_files(spark, path)
        if f.rsplit("/", 1)[-1] not in known
    ]
    if not new:
        return manifest
    fresh = (
        spark.read.parquet(*new)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*_stat_aggs(stat_cols))
    )
    return manifest.unionByName(fresh)


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
    *,
    path: str | None = None,
) -> DataFrame:
    """Read ONLY the manifest-selected files and re-apply the exact
    predicate (pruning is conservative).

    When no file's [min, max] envelope intersects [lo, hi]: with `path`
    given, return an empty frame with the dataset's schema (schema-only
    read — the lit(False) filter is pushed to the scan, so no data
    files are opened); without `path`, raise ValueError (the schema is
    unknowable from an empty file list)."""
    files = pruned_files(manifest, col, lo, hi)
    if not files:
        if path is None:
            raise ValueError(
                "manifest pruning selected zero files and no dataset "
                "path was provided to recover the schema; pass path="
            )
        return spark.read.parquet(path).filter(F.lit(False))
    df = spark.read.parquet(*files)
    return df.filter(F.col(col).between(lo, hi))
