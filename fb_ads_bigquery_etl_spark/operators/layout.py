"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the fastest scan is the one that never reads the file: parquet
keeps min/max statistics per file and row group, so laying rows out so
that each file covers a NARROW range of the filter columns turns a
full-table scan into a handful of file reads. Sorting clusters one
column perfectly and the rest not at all; Z-ORDERING (interleaving the
bits of several columns into one sort key) gives every participating
column locality, which is why warehouse engines (Delta OPTIMIZE ZORDER,
Iceberg sort orders) offer it as their layout primitive.

The z-value is pure integer bit arithmetic — engine-exact, so the
clustering math itself sits under the DuckDB oracle gate; the write path
(range-repartition on the z-value, sort within partitions) uses Spark's
sampling-based RangePartitioner, whose file boundaries are
deterministic-enough for layout but not bit-gateable — the pytest gate
asserts the OUTCOME instead: each written file's (min, max) rectangle
over the z-ordered columns is narrow vs an unordered write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative ints into a
    Morton (Z-curve) key: a's bit i lands at position 2i+1, b's at 2i.

    Unrolled shift/mask arithmetic — whole-stage-codegen-friendly, no
    UDF. 2*bits <= 62 keeps the result in a signed long.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1)).cast("long")
            + F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i)).cast("long")
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    *,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write `df` as parquet clustered on the Z-curve of two columns.

    Range-repartition on the z-value (contiguous z-ranges per output
    file) + sort within partitions: every file's min/max stats over
    BOTH columns cover a narrow rectangle, so a reader filtering on
    either column skips most files (parquet file/row-group pruning).
    """
    a, b = cols
    z = zvalue(F.col(a), F.col(b), bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_rectangle_stats(
    spark, path: str, cols: tuple[str, str]
) -> DataFrame:
    """Per-file (min, max) coverage of `cols` for a parquet dataset —
    the observable a layout audit reads: narrow rectangles = effective
    pruning. One scan, grouped by input_file_name (file count rows)."""
    a, b = cols
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(a).alias(f"min_{a}"),
            F.max(a).alias(f"max_{a}"),
            F.min(b).alias(f"min_{b}"),
            F.max(b).alias(f"max_{b}"),
        )
    )
