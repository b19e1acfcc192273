"""Distributed K-Means (Lloyd's) over an embedding column.

Second iterative-fixpoint operator next to graph.connected_components:
embedding-space clustering for corpus curation (topic balancing,
diversity sampling, IVF coarse quantizers — similarity.assign_ivf_buckets
consumes exactly this shape). No reference counterpart (north-star
extension, BASELINE.json).

Determinism contract (same result on any partitioning / cluster size):
- init: centroids = the k smallest vec_ids (no RNG);
- update: centroid sums accumulate as floor(x * 1e9) BIGINTs — integer
  addition is associative, so the new centroids are bit-identical no
  matter how the shuffle splits the rows (a double SUM is not);
- assign: per-row double math against identical centroid values, ties
  broken by lowest centroid index.

Scale design, per iteration:
- centroids are k*dim values — METADATA-sized; they ride to executors as
  a broadcast literal (the standard distributed-KMeans shape, same as
  Spark MLlib): the data-path never collects, the k*dim collect is O(kB).
- assignment is a narrow map stage (no shuffle);
- the update is one map-side-combined groupBy(cluster) shuffle of
  k * dim partial sums per task — independent of row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SCALE = 1_000_000_000


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, sequential-order
    accumulation (F.aggregate) — deterministic per row."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec.cast("array<double>"), c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(vec_col: str, centroids: list[list[float]]) -> Column:
    """Nearest-centroid index as a least-of CASE chain (one codegen'd
    expression, k comparisons per row; lowest index wins ties)."""
    vec = F.col(vec_col)
    best = F.lit(0)
    best_d = _sq_dist(vec, centroids[0])
    for j, c in enumerate(centroids[1:], start=1):
        d = _sq_dist(vec, c)
        closer = d < best_d
        best = F.when(closer, F.lit(j)).otherwise(best)
        best_d = F.when(closer, d).otherwise(best_d)
    return best


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 8,
    max_iter: int = 20,
) -> tuple[DataFrame, list[list[float]], int]:
    """Returns (assignments DataFrame(id, cluster), centroids, n_iter).

    Converges when no assignment changes (checked by a scalar count,
    not a data pull). The assignments DataFrame is lazily recomputable
    from the final centroids — safe to join downstream.
    """
    first = (
        df.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    centroids = [list(map(float, r[vec_col])) for r in first]
    dim = len(centroids[0])

    prev = None
    n_iter = 0
    for n_iter in range(1, max_iter + 1):
        assigned = df.select(
            F.col(id_col).alias("id"),
            assign_clusters(vec_col, centroids).alias("cluster"),
            F.col(vec_col).alias("_v"),
        )
        # Integer-scaled per-cluster sums: one small shuffle (k rows out).
        sums = (
            assigned.select(
                "cluster",
                F.posexplode(F.transform(
                    F.col("_v"),
                    lambda x: F.floor(x.cast("double") * SCALE).cast("long"),
                )).alias("dim", "xs"),
            )
            .groupBy("cluster", "dim")
            .agg(F.sum("xs").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cluster: dict[int, list[float]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], [0.0] * dim)[r["dim"]] = (
                r["s"] / SCALE / r["n"]
            )
        new_centroids = [
            by_cluster.get(j, centroids[j]) for j in range(k)  # empty keeps old
        ]

        cur = assigned.select("id", "cluster")
        if prev is not None:
            changed = (
                cur.alias("c")
                .join(prev.alias("p"), "id")
                .filter(F.col("c.cluster") != F.col("p.cluster"))
                .count()
            )
            if changed == 0:
                centroids = new_centroids
                break
        prev = cur.localCheckpoint(eager=True)
        centroids = new_centroids

    assignments = df.select(
        F.col(id_col).alias("id"),
        assign_clusters(vec_col, centroids).alias("cluster"),
    )
    return assignments, centroids, n_iter
