"""K-Means determinism and convergence (operators/clustering.py)."""

import os

from pyspark.sql import functions as F

from fb_ads_bigquery_etl_spark.operators.clustering import kmeans
from tests.conftest import SF_DIR


def _embeddings(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def test_kmeans_converges_and_partitions_all_rows(spark):
    e = _embeddings(spark)
    assignments, centroids, n_iter = kmeans(e, k=4, max_iter=30)
    n = e.count()
    assert assignments.count() == n
    assert n_iter < 30, "should converge before max_iter on this data"
    got = dict(
        assignments.groupBy("cluster").count().collect()
    )
    assert sum(got.values()) == n
    assert all(0 <= c < 4 for c in got)


def test_kmeans_deterministic_across_partitionings(spark):
    e = _embeddings(spark)
    a1, c1, _ = kmeans(e.repartition(1), k=4, max_iter=8)
    a2, c2, _ = kmeans(e.repartition(16), k=4, max_iter=8)
    assert c1 == c2, "centroids must be bit-identical (integer-scaled sums)"
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_kmeans_separates_obvious_clusters(spark):
    # two tight blobs far apart -> k=2 must split them exactly
    rows = [(i, [0.0 + 0.01 * (i % 3), 0.0]) for i in range(10)] + [
        (100 + i, [10.0 + 0.01 * (i % 3), 10.0]) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assignments, _, _ = kmeans(df, k=2, max_iter=10)
    got = {r["id"]: r["cluster"] for r in assignments.collect()}
    low = {got[i] for i in range(10)}
    high = {got[100 + i] for i in range(10)}
    assert len(low) == 1 and len(high) == 1 and low != high
