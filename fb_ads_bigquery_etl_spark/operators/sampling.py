"""Deterministic sampling / split-assignment operators.

Training-data pipelines need REPRODUCIBLE splits and samples: re-running
the pipeline on the same corpus (or an appended superset) must assign
every existing document to the same split, with no RNG state and no
coordination. `rand(seed)` can't give that — it depends on partitioning
— so these operators derive the decision from a content hash of the row
key (portable.hash32: md5-based, identical in DuckDB), making them:

- deterministic across runs, engines, partitionings, and cluster sizes;
- stable under append (new docs don't reshuffle old assignments);
- embarrassingly parallel: a narrow projection, no shuffle, no state.

No reference counterpart (north-star extension, BASELINE.json).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from fb_ads_bigquery_etl_spark.functions.portable import hash32

BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, 10000) from the row key (+ optional salt).

    The salt decorrelates independent sampling decisions over the same
    keys (e.g. a 10% eval sample drawn independently of the train/test
    split) — same mechanism as a new hash function family.
    """
    return hash32(F.concat(F.lit(salt), key.cast("string"))) % BUCKETS


def assign_split(
    key: Column,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "",
) -> Column:
    """Split label from cumulative hash-bucket ranges.

    ``splits`` is (name, fraction) in order; fractions are quantized to
    1/10000. Rows hash into [0,10000) and take the first range they fall
    in; any residual bucket (fractions summing < 1) gets 'holdout'.
    """
    b = hash_bucket(key, salt)
    expr: Column | None = None
    edge = 0.0
    cases = []
    for name, frac in splits:
        edge += frac
        cases.append((int(round(edge * BUCKETS)), name))
    expr = F.lit("holdout")
    for hi, name in reversed(cases):
        expr = F.when(b < hi, F.lit(name)).otherwise(expr)
    return expr


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Deterministic per-stratum sampling by hash threshold.

    Unlike `df.sampleBy` (RNG, partitioning-dependent), membership is a
    pure function of (salt, key): exact reproducibility and append
    stability. The per-stratum threshold map compiles to a small CASE
    over the stratum column — no join, no shuffle, filter pushes down
    to the scan boundary.
    """
    b = hash_bucket(F.col(key_col), salt)
    thresh = F.lit(int(round(default_fraction * BUCKETS)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * BUCKETS)))
        ).otherwise(thresh)
    return df.filter(b < thresh)


def topk_per_group_structs(
    df: DataFrame,
    group_col: str,
    entry: Column,
    sub: Column,
    k: int,
    *,
    subshards: int = 64,
) -> DataFrame:
    """Two-phase hash-aggregate top-k per group, NO window over the
    group column — the generic core under the reservoir sample and any
    ordered per-group top-k:

    1. partial: rows land in `subshards` sub-buckets per group (`sub`:
       any deterministic int column); each (group, sub) bucket keeps
       its k smallest `entry` structs via array_sort + slice —
       parallelism is groups x subshards, so a 20-group corpus still
       fans out across the whole cluster;
    2. merge: per group, flatten the <= subshards*k survivors and take
       the global k smallest.

    `entry` must be a struct whose field order IS the ranking
    (array_sort on structs compares fields left-to-right) with a
    unique tie-break field last. A row_number() window over the group
    key computes the same rows with the ENTIRE corpus funneling into
    n_groups tasks — a guaranteed straggler once groups are few and
    data is 100 TB. Here the only per-group state that ever meets a
    single task is subshards*k structs (metadata-sized); size
    `subshards` to the cluster's parallelism.

    Returns (group_col, entry, rk) with rk in 1..k, identical rows to
    the window formulation (top-k per group is the union of per-
    sub-bucket top-ks).
    """
    cand = (
        df.select(
            F.col(group_col),
            entry.alias("entry"),
            F.pmod(sub, F.lit(subshards)).alias("_sub"),
        )
        .groupBy(group_col, "_sub")
        .agg(F.slice(F.array_sort(F.collect_list("entry")), 1, k).alias("cand"))
    )
    merged = cand.groupBy(group_col).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("cand"))), 1, k).alias("top")
    )
    return merged.select(
        F.col(group_col), F.posexplode("top").alias("_pos", "entry")
    ).select(
        group_col,
        "entry",
        (F.col("_pos") + 1).cast("int").alias("rk"),
    )


def topk_per_group_hashrank(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    *,
    salt: str = "rsv:",
    subshards: int = 64,
) -> DataFrame:
    """Exact-k deterministic sample per group — the per-group reservoir:
    rank rows inside each group by a content hash of the key and keep
    the k smallest (membership is a pure function of the key, so re-runs
    and appends keep prior picks unless a new row hashes lower). Thin
    wrapper over `topk_per_group_structs` with a (hash, key) ranking
    struct; see it for the two-phase scale rationale.

    Returns (group_col, key_col, rk) with rk in 1..k — identical rows
    to the window formulation, so the same oracle gates both.
    """
    rkey = hash32(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    top = topk_per_group_structs(
        df,
        group_col,
        F.struct(rkey.alias("rkey"), F.col(key_col)),
        F.hash(F.col(key_col)),
        k,
        subshards=subshards,
    )
    return top.select(
        group_col,
        F.col(f"entry.{key_col}").alias(key_col),
        "rk",
    )


def weighted_keep(key: Column, weight: Column, max_weight: Column, salt: str = "ws:") -> Column:
    """Deterministic Bernoulli keep with probability weight/max_weight.

    All-integer comparison (u * max_weight < weight * 2^32, u =
    portable.hash32 of the salted key) — no float division, so the
    decision is bit-identical across engines and never flips on a
    rounding edge. Same determinism/append-stability contract as
    `hash_bucket`; `max_weight` is typically a broadcast scalar
    aggregate. Weights must be non-negative integers (use a scaled cast
    for fractional weights); rows with weight == max_weight keep with
    probability ~1 (exactly 1 - 2^-32)."""
    u = hash32(F.concat(F.lit(salt), key.cast("string")))
    return u * max_weight < weight * F.lit(2**32)


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    *,
    target_frac: float = 0.2,
    salt: str = "tm:",
) -> DataFrame:
    """Temperature-flattened source mixing at alpha = 0.5 (LLM op).

    Multilingual / multi-source LM training samples source i with
    probability proportional to n_i^alpha (Conneau & Lample 2019-style
    mixing) so big sources stop drowning small ones. Alpha is fixed at
    0.5 because sqrt is the one power IEEE-754 guarantees correctly
    rounded — floor(sqrt(n)) is an EXACT integer weight in every
    engine, where pow(n, 0.3) would drag libm rounding differences
    into the sampled set.

    Per-source keep rate: r_i = min(1, target_frac * N * w_i / (S * n_i))
    with w_i = floor(sqrt(n_i)), N = total rows, S = sum of weights —
    expected sample size is target_frac * N, spread across sources by
    weight. The keep decision is the usual salted hash32 threshold:
    deterministic, append-stable, partitioning-independent.

    Plan shape: two metadata-sized aggregates (per-group counts, their
    1-row total) broadcast back onto the fact scan; the filter is a
    narrow projection. One full scan + one pre-scan for counts; no
    corpus-sized shuffle. Returns the sampled rows with their `_rate`
    attached.
    """
    def w_of(n: Column) -> Column:
        return F.floor(F.sqrt(n)).cast("long")

    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    tot = counts.agg(
        F.sum("_n").cast("long").alias("_N"),
        F.sum(w_of(F.col("_n"))).cast("long").alias("_S"),
    )
    # tot derives from counts, so the cross join is a self-join in
    # lineage terms — alias both sides and qualify every reference.
    rates = counts.alias("c").crossJoin(F.broadcast(tot).alias("t")).select(
        F.col(f"c.{group_col}").alias(group_col),
        F.least(
            F.lit(1.0),
            (F.col("t._N") * w_of(F.col("c._n")) * F.lit(target_frac))
            / (F.col("t._S") * F.col("c._n")).cast("double"),
        ).alias("_rate"),
    )
    u = hash32(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return df.join(F.broadcast(rates), group_col).filter(
        u < F.col("_rate") * F.lit(float(2**32))
    )


def epoch_shuffle_key(key: Column, epoch: int, salt: str = "ep:") -> Column:
    """Deterministic per-epoch global shuffle key: md5 over
    (salt, epoch, row key). Training loops need a DIFFERENT but
    REPRODUCIBLE global order each epoch; deriving it from a content
    hash (not rand()) makes the order independent of partitioning,
    cluster size, and engine — DuckDB computes the identical key
    (md5('ep:' || epoch || ':' || key)), which is what the
    epoch_shuffle oracle gate checks."""
    return F.md5(
        F.concat(F.lit(f"{salt}{epoch}:"), key.cast("string"))
    )


def epoch_shuffle(
    df: DataFrame, key_col: str, epoch: int, *, salt: str = "ep:"
) -> DataFrame:
    """Rows in the epoch's global shuffle order, at scale: range-
    repartition on the shuffle key (contiguous key ranges per
    partition, so partition i sorts entirely before partition i+1) +
    sort within partitions — a distributed total order with NO
    single-task global sort stage. Downstream sequential readers
    (training-data writers) consume partitions in index order. The
    `_shuffle_key` column rides along for order verification /
    resumable readers; drop it if unwanted."""
    k = epoch_shuffle_key(F.col(key_col), epoch, salt=salt)
    return (
        df.withColumn("_shuffle_key", k)
        .repartitionByRange("_shuffle_key")
        .sortWithinPartitions("_shuffle_key")
    )


def dedup_aware_split(
    docs,
    pairs,
    *,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "cl:",
):
    """Leakage-safe train/val/test assignment: split by NEAR-DUP
    CLUSTER, not by document. Hashing each doc independently leaks —
    two near-duplicates land in different splits with probability
    1 - sum(frac^2) (~34% per pair at 80/10/10), and eval contamination
    by train near-dups is exactly what dedup pipelines exist to
    prevent. Here the unit of assignment is the connected component of
    the near-dup graph (`pairs` from minhash_lsh_pairs or any pair
    source): every member inherits the cluster's hash bucket, so NO
    qualifying pair can straddle splits, by construction — and the
    assignment stays append-stable (hash of the cluster's min id, no
    global ordering).

    Scale shape: the component fixpoint touches only PAIRED docs
    (isolated docs skip the shuffle entirely and become their own
    singleton cluster via the left join + coalesce); assignment is a
    narrow hash expression. Returns (id, cluster, split)."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.graph import (
        connected_components,
    )

    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    cc = connected_components(edges).withColumnRenamed("node", "id")
    labeled = (
        docs.select(F.col(id_col).alias("id"))
        .join(cc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("cluster"),
        )
    )
    return labeled.withColumn(
        "split", assign_split(F.col("cluster"), splits, salt=salt)
    )
