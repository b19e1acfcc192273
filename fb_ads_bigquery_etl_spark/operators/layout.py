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


def zvalue_n(cols: tuple[Column, ...], bits: int = 16) -> Column:
    """Interleave the low `bits` bits of N non-negative ints into a
    Morton (Z-curve) key: column j's bit i lands at position N*i +
    (N-1-j), so earlier columns take the more significant slot within
    each bit group.

    Unrolled shift/mask arithmetic — whole-stage-codegen-friendly, no
    UDF. N*bits <= 62 keeps the result in a signed long. Values with
    set bits ABOVE `bits` alias in the key and silently destroy the
    clustering the caller paid for — `zorder_write` checks the actual
    column maxima and raises; direct `zvalue_n` callers own that check.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zvalue_n needs at least 2 columns")
    if not 1 <= bits or n * bits > 62:
        raise ValueError(
            f"bits must satisfy 1 <= bits and {n}*bits <= 62, got {bits}"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z + F.shiftright(c.cast("long"), i).bitwiseAND(
                F.lit(1)
            ) * F.lit(1 << (n * i + (n - 1 - j))).cast("long")
    return z


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Two-column Morton key: a's bit i at position 2i+1, b's at 2i.
    (The N=2 case of `zvalue_n`; kept as the common-path name.)"""
    return zvalue_n((a, b), bits=bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    *,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write `df` as parquet clustered on the Z-curve of N columns.

    Range-repartition on the z-value (contiguous z-ranges per output
    file) + sort within partitions: every file's min/max stats over
    EVERY z-ordered column cover a narrow hyper-rectangle, so a reader
    filtering on any of them skips most files (parquet file/row-group
    pruning).

    Guards the bit budget with one full-table min/max aggregate (a
    scan, but a cheap narrow one — and it runs once per layout write,
    not per query): a column whose max exceeds 2^bits - 1 would alias
    in the Morton key, and a NEGATIVE value would sign-extend through
    shiftright and corrupt the key outright — raise on either
    (callers either widen `bits` or rank/normalize the column into
    the [0, 2^bits) budget first).
    """
    limit = (1 << bits) - 1
    bounds = df.agg(
        *[F.max(F.col(c).cast("long")).alias(f"mx_{c}") for c in cols],
        *[F.min(F.col(c).cast("long")).alias(f"mn_{c}") for c in cols],
    ).first()
    over = {
        c: bounds[f"mx_{c}"]
        for c in cols
        if (bounds[f"mx_{c}"] or 0) > limit
    }
    if over:
        raise ValueError(
            f"column max exceeds the {bits}-bit z-order budget "
            f"(limit {limit}): {over}; raise bits= (n_cols*bits <= 62) "
            "or normalize/rank the columns into the budget"
        )
    neg = {
        c: bounds[f"mn_{c}"]
        for c in cols
        if (bounds[f"mn_{c}"] or 0) < 0
    }
    if neg:
        raise ValueError(
            "negative values would sign-extend through the Morton "
            f"interleave: {neg}; shift/normalize the columns into "
            "[0, 2^bits) first"
        )
    z = zvalue_n(tuple(F.col(c) for c in cols), bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_rectangle_stats(
    spark, path: str, cols: tuple[str, ...]
) -> DataFrame:
    """Per-file (min, max) coverage of `cols` for a parquet dataset —
    the observable a layout audit reads: narrow hyper-rectangles =
    effective pruning. One scan, grouped by input_file_name (file
    count rows)."""
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
