"""Count-min-sketch heavy hitters — skew-safe frequency mining.

The 100 TB problem: "which tokens appear >= T times" is a groupBy over
the FULL key universe — billions of distinct keys shuffle even though
only a handful survive the threshold. The count-min sketch (Cormode &
Muthukrishnan 2005) fixes the shape: aggregate the stream into a
FIXED-SIZE counter grid (d rows x w buckets — cardinality d*w no
matter how many distinct keys exist), then run the exact aggregation
only over keys whose sketch estimate passes the threshold. CMS
estimates NEVER undercount (each cell >= the true count of every key
hashing into it), so the candidate set is a superset of the true heavy
hitters and the exact re-count makes the final answer EXACTLY equal to
the plain threshold query — same conservative-prune-plus-exact-refilter
contract as manifest-based scan pruning, and gated the same way
(`cms_heavy_hitters` oracle = the plain GROUP BY ... HAVING).

Determinism: bucket hashes are portable.hash32 over salted keys
(md5-based, bit-identical in DuckDB), so even the intermediate sketch
is engine-exact, not just the final answer.

Plan shape at scale: one narrow pass explodes each key into d salted
rows -> map-side-combined groupBy onto d*w cells (a FIXED-size
shuffle); the d estimate lookups are broadcast joins (the sketch is
metadata-sized by construction); the exact re-count shuffles ONLY rows
whose key survives the sketch filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from fb_ads_bigquery_etl_spark.functions.portable import hash32


def _bucket(key: Column, salt: int, width: int) -> Column:
    return (hash32(F.concat(F.lit(f"cms{salt}:"), key)) % F.lit(width)).cast(
        "long"
    )


def cms_counters(
    stream: DataFrame,
    key_col: str,
    *,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """The sketch: (salt, bucket, cnt) with exactly depth*width cells
    populated at most. One pass: the d per-salt projections union
    narrowly and combine map-side before the fixed-size shuffle."""
    parts = [
        stream.select(
            F.lit(salt).alias("salt"),
            _bucket(F.col(key_col), salt, width).alias("bucket"),
        )
        for salt in range(depth)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("salt", "bucket").agg(F.count("*").alias("cnt"))


def cms_heavy_hitters(
    stream: DataFrame,
    key_col: str,
    threshold: int,
    *,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Exact keys with count >= threshold, found the sketch way.

    Returns (key, est, exact) — est is the CMS estimate (min over the
    d rows), always >= exact; the final filter is on the EXACT count,
    so the result equals the plain `GROUP BY key HAVING count >=
    threshold` by construction."""
    counters = cms_counters(stream, key_col, depth=depth, width=width)
    # estimate per stream row: d broadcast joins against the sketch
    est = stream.select(F.col(key_col).alias("key"))
    for salt in range(depth):
        c = counters.filter(F.col("salt") == salt).select(
            F.col("bucket").alias(f"_b{salt}"),
            F.col("cnt").alias(f"_c{salt}"),
        )
        est = est.join(
            F.broadcast(c),
            _bucket(F.col("key"), salt, width) == F.col(f"_b{salt}"),
        ).drop(f"_b{salt}")
    est = est.withColumn(
        "est", F.least(*[F.col(f"_c{s}") for s in range(depth)])
    ).drop(*[f"_c{s}" for s in range(depth)])
    # exact re-count of ONLY the sketch-passing rows; the groupBy input
    # is pre-shrunk to candidate keys (the skew-safety payoff)
    return (
        est.filter(F.col("est") >= threshold)
        .groupBy("key")
        .agg(
            F.min("est").cast("long").alias("est"),
            F.count("*").cast("long").alias("exact"),
        )
        .filter(F.col("exact") >= threshold)
    )


def bloom_bitmap(
    keys: DataFrame, key_col: str, *, bits: int = 8192, k: int = 3
) -> DataFrame:
    """Bloom filter over a key set as a (word_idx, word) bitmap frame
    (bits/64 rows — metadata-sized regardless of key count). Built
    with ONE map-side-combined bit_or aggregation over per-key masks;
    the k probe positions are portable md5 hashes, so DuckDB replays
    the exact bitmap (the `bloom_semi_join` oracle does)."""
    parts = [
        keys.select(
            _bucket(F.col(key_col).cast("string"), 1000 + i, bits).alias("_pos")
        )
        for i in range(k)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.select(
            (F.col("_pos") / 64).cast("long").alias("word_idx"),
            # shiftleft with a COLUMN bit count needs the SQL form —
            # pyspark's F.shiftleft only accepts a python-int numBits
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_prune(
    fact: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    *,
    bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key passes the Bloom filter — a
    conservative superset of the true semi-join (no false negatives),
    so `bloom_prune(...).join(dim)` EQUALS `fact.join(dim)` while the
    join's shuffle input shrinks to near the true match set. This is
    the cross-stage semi-join reduction a 100 TB plan ships instead of
    the key set itself: the bitmap is bits/8 bytes however large the
    dim is. k broadcast joins (the bitmap is metadata-sized) + one
    narrow bit test per probe; rows whose position hits a missing word
    are dropped (absent word = all-zero bits)."""
    out = fact
    for i in range(k):
        pos_name = f"_bloom_pos{i}"
        out = out.withColumn(
            pos_name, _bucket(F.col(key_col).cast("string"), 1000 + i, bits)
        )
        w = bitmap.select(
            F.col("word_idx").alias(f"_wi{i}"),
            F.col("word").alias(f"_w{i}"),
        )
        out = (
            out.join(
                F.broadcast(w),
                (F.col(pos_name) / 64).cast("long") == F.col(f"_wi{i}"),
                "left",
            )
            # shiftright with a COLUMN bit count needs the SQL form
            .filter(
                F.expr(
                    f"(shiftright(coalesce(_w{i}, CAST(0 AS BIGINT)),"
                    f" CAST({pos_name} % 64 AS INT)) & 1) = 1"
                )
            )
            .drop(pos_name, f"_wi{i}", f"_w{i}")
        )
    return out


def _py_bucket(key: str, salt: int, width: int) -> int:
    """Driver-side twin of `_bucket` (same md5 positions) — lets a
    plan-time lookup compute a probe key's bit positions without a
    Spark job."""
    import hashlib

    return (
        int(hashlib.md5(f"cms{salt}:{key}".encode()).hexdigest()[:8], 16)
        % width
    )


def build_bloom_file_index(
    spark: SparkSession,
    path: str,
    key_col: str,
    *,
    bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Per-FILE Bloom index: (file, word_idx, word), <= files x bits/64
    rows — metadata-sized. This is the Delta/Iceberg bloom-filter-index
    pattern: min/max envelopes prune NOTHING for point lookups on
    hash-distributed keys (every file's envelope spans the domain), but
    a per-file Bloom answers "can key X live in file F?" at plan time.
    One scan: each key explodes into its k probe positions, then ONE
    map-side-combined bit_or per (file, word)."""
    df = spark.read.parquet(path)
    key = F.col(key_col).cast("string")
    return (
        df.select(
            F.input_file_name().alias("file"),
            F.explode(
                F.array(*[_bucket(key, 1000 + i, bits) for i in range(k)])
            ).alias("_pos"),
        )
        .select(
            "file",
            (F.col("_pos") / 64).cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_mask"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_index_files(
    index: DataFrame, key, *, bits: int = 8192, k: int = 3
) -> list[str]:
    """Files that may contain `key` — a plan-time lookup over the
    metadata-sized index (collects <= k rows per file), never a data
    read. Conservative: a file holding the key ALWAYS passes; files
    without it pass only at the Bloom false-positive rate."""
    positions = [_py_bucket(str(key), 1000 + i, bits) for i in range(k)]
    need = sorted({p // 64 for p in positions})
    words: dict[tuple[str, int], int] = {}
    files: set[str] = set()
    for r in index.filter(F.col("word_idx").isin(need)).collect():
        words[(r["file"], r["word_idx"])] = r["word"]
        files.add(r["file"])
    # a file with no row for a needed word_idx has those bits all-zero
    return sorted(
        f
        for f in files
        if all(
            (words.get((f, p // 64), 0) >> (p % 64)) & 1 == 1
            for p in positions
        )
    )


def bloom_index_read(
    spark: SparkSession,
    index: DataFrame,
    key_col: str,
    key,
    *,
    path: str | None = None,
    bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Point lookup reading ONLY bloom-selected files, with the exact
    predicate re-applied (pruning is conservative, so the result equals
    a full scan by construction). Zero-files semantics match
    manifest_pruned_read: with `path`, a schema-only empty frame;
    without, ValueError."""
    files = bloom_index_files(index, key, bits=bits, k=k)
    if not files:
        if path is None:
            raise ValueError(
                "bloom index selected zero files and no dataset path "
                "was provided to recover the schema; pass path="
            )
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*files).filter(F.col(key_col) == F.lit(key))
