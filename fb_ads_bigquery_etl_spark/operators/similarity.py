"""Similarity search over embedding columns (array<float>).

Three tiers:
  * brute_force_topk      — exact top-k for one query vector; the scan is
                            embarrassingly parallel, reduction is a top-k
                            (TakeOrdered, no full sort shuffle).
  * ivf_topk              — IVF-style probed search: deterministic
                            centroid set, cluster assignment as a
                            broadcast nested-loop against a tiny centroid
                            table, then brute force inside probed buckets.
                            The scale path: at 100 TB the bucket id is a
                            partition key, so a probe touches only
                            nprobe/nlist of the data (partition pruning).
  * cosine_pairs          — near-duplicate pairs within a blocking key.

All cosine math uses sequential-order double accumulation
(functions.portable.dot_product) so an independent engine reproduces the
numbers bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fb_ads_bigquery_etl_spark.functions.portable import cosine_similarity


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector is a literal array baked into the plan (the
    degenerate broadcast); scoring is a narrow projection over the scan.
    Ties broken by id ascending for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col), q).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def assign_ivf_buckets(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF clustering.

    Centroids = rows with id % centroid_mod == 0 (a deterministic sample;
    a production build would run k-means — the assignment/probe plumbing
    is identical). Assignment = broadcast nested-loop join vectors ×
    centroids, keep nearest (max cosine, tie-break smallest centroid id).

    Returns (centroids, assigned) where assigned has (id, vec, bucket).
    """
    centroids = df.filter((F.col(id_col) % centroid_mod) == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )
    scored = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine_similarity(F.col(vec_col), F.col("centroid_vec")).alias("c_score"),
    )
    best = scored.groupBy(id_col, vec_col).agg(
        F.max_by(
            F.col("centroid_id"), F.struct(F.col("c_score"), -F.col("centroid_id"))
        ).alias("bucket")
    )
    return centroids, best


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    nprobe: int = 2,
    centroid_mod: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probed top-k: search only the nprobe buckets nearest the query.

    At scale the assigned table is written partitioned by bucket, so the
    probe is a partition-pruned scan of nprobe/nlist of the corpus.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    centroids, assigned = assign_ivf_buckets(
        df, vec_col=vec_col, id_col=id_col, centroid_mod=centroid_mod
    )
    probed = (
        centroids.select(
            "centroid_id", cosine_similarity(F.col("centroid_vec"), q).alias("q_score")
        )
        .orderBy(F.col("q_score").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select("centroid_id")
    )
    in_buckets = assigned.join(
        F.broadcast(probed), assigned["bucket"] == probed["centroid_id"]
    )
    scored = in_buckets.select(
        F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def cosine_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.99,
    block_col: str | None = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-duplicate pairs with cosine >= threshold.

    ``block_col`` is the blocking key (pairs are only considered within a
    block — e.g. a coarse cluster/label); None = full cross product,
    which is exact but quadratic (test scales only).
    """
    left = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        *([F.col(block_col).alias("blk_a")] if block_col else []),
    )
    right = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        *([F.col(block_col).alias("blk_b")] if block_col else []),
    )
    cond = F.col("id_a") < F.col("id_b")
    if block_col:
        joined = left.join(right, (F.col("blk_a") == F.col("blk_b")) & cond)
    else:
        joined = left.crossJoin(right).filter(cond)
    return (
        joined.select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
