"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same config block is what we would
ship on a 1000-executor cluster (AQE on, skew-join handling on,
partition coalescing on) — only sizes change.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def local_df(spark: SparkSession, rows, schema: str):
    """createDataFrame for METADATA-SIZED driver-side row lists (LUTs,
    centroid/codebook sidecars, per-iteration weight tables): one
    explicit slice instead of the default-parallelism split. The
    default scatters 16 rows over 32 empty partitions, so every
    downstream action (broadcast build, sidecar write) schedules 32
    tasks for a handful of rows — measured 0.5 s per sidecar write at
    local[32], ~0.15 s with one slice; same story on a cluster, where
    default parallelism is far larger. Row order and typing are
    identical to the multi-slice form (guide §2.4: remove work the
    operation never needed)."""
    if not rows:
        return spark.createDataFrame([], schema)
    rdd = spark.sparkContext.parallelize(rows, 1)
    return spark.createDataFrame(rdd, schema)


def coalesce_metadata_stages(fn):
    """Decorator form of `coalesce_by_bytes` for operator entry points
    whose eager actions all reduce to metadata-bounded stages (nlist /
    vocab / k-centroid cardinality). The first positional argument must
    be a SparkSession or carry `.sparkSession` (a DataFrame)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        first = args[0]
        spark = getattr(first, "sparkSession", None) or first
        with coalesce_by_bytes(spark):
            return fn(*args, **kwargs)

    return wrapper


# coalesce_by_bytes nesting state, keyed per SparkSession: overlapping
# scopes (nested calls, or independent driver threads overlapping their
# jobs per guide §2.6) must not restore a stale value — only the
# OUTERMOST exit restores the session default. The conf itself is still
# session-global SQL conf: any unrelated query running concurrently
# inside someone's scope is also coalesced by bytes; acceptable here
# because every deliberate overlap in this engine runs metadata-bounded
# stages on both sides (classifier chains, sidecar writes).
_CBB_LOCK = __import__("threading").RLock()
_CBB_DEPTH: dict[int, int] = {}
_CBB_PREV: dict[int, str] = {}


@contextmanager
def coalesce_by_bytes(spark: SparkSession):
    """Scope AQE partition coalescing to advisory BYTES (instead of the
    core-count floor) for operators whose reduce stages are
    METADATA-BOUNDED BY CONSTRUCTION — nlist buckets, vocab buckets,
    k centroids, per-file manifest rows. For those stages the Spark
    default (parallelismFirst=true) schedules core-count reduce tasks
    for a handful of groups at ANY cluster size; honoring the advisory
    size collapses them to the few tasks the data warrants. Kept
    SCOPED because the same flag session-wide serializes CPU-heavy
    byte-light stages (pair-verification joins measured x1.8-2.9
    slower — OPTIMIZATION_r13.md). Restores the previous value;
    REENTRANT and overlap-safe via a per-session depth counter (r13
    ADVICE: overlapping scopes used to restore a stale value)."""
    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    sid = id(spark)
    with _CBB_LOCK:
        if _CBB_DEPTH.get(sid, 0) == 0:
            try:
                _CBB_PREV[sid] = spark.conf.get(key)
            except Exception:
                _CBB_PREV[sid] = "true"
            spark.conf.set(key, "false")
        _CBB_DEPTH[sid] = _CBB_DEPTH.get(sid, 0) + 1
    try:
        yield
    finally:
        with _CBB_LOCK:
            _CBB_DEPTH[sid] -= 1
            if _CBB_DEPTH[sid] == 0:
                spark.conf.set(key, _CBB_PREV.pop(sid))
                del _CBB_DEPTH[sid]


def get_spark(
    app_name: str = "fb-ads-etl-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    AQE is the core scale lever: runtime partition coalescing keeps
    small-SF tests fast while skew-join splitting protects the 100 TB
    case (skewed campaign/ad dedup keys, SURVEY.md §4).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at the Spark default (true): an
        # isolated A/B (OPTIMIZATION_r13.md) measured that flipping it
        # session-wide serializes CPU-heavy byte-light reduce stages
        # (pair-verification joins went x1.8-2.9) while only the
        # metadata-bounded stages win. Those get the scoped
        # `coalesce_by_bytes` context below instead; both knobs stay
        # env-parameterised for cluster tuning.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_SIZE", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Commit algorithm v1 (the Spark default) — r14 reverts the
        # r13 v2 default: v2 renames task output straight into the
        # final dir at task commit, so a mid-job failure leaves partial
        # task files VISIBLE, and two writers rely on job-level
        # atomicity with no staging protocol of their own —
        # append_ivfpq_index appends into the live bucket dirs and
        # delete_from_ivfpq_index appends tombstones (a partial
        # tombstone batch silently hides live rows from every probe;
        # an orphan append file is adopted by the manifest's fallback
        # scan, so a retry duplicates rows). v2 was also never measured
        # to win (r14 A/B: see OPTIMIZATION_r14.md). Env-tunable for
        # deployments whose writers all stage-and-rename.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            os.environ.get("SPARK_GRAFT_COMMITTER_ALGORITHM", "1"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)) -> dict[str, "object"]:
    """Load the TESTDATA parquet tables and register temp views."""
    out = {}
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
