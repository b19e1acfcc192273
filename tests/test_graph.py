"""Connected-components (operators/graph.py) unit tests."""

from pyspark.sql import functions as F

from fb_ads_bigquery_etl_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def test_chain_collapses_to_one_component(spark):
    # 0-1-2-3-4-5: diameter 5 forces multiple hash-to-min rounds.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {i: 0 for i in range(6)}


def test_multiple_components_and_orientation_independence(spark):
    # Two clusters; edges given in mixed orientation, with a duplicate.
    edges = spark.createDataFrame(
        [(7, 3), (3, 5), (10, 11), (11, 10)], "src long, dst long"
    )
    cc = connected_components(edges)
    got = {r["node"]: r["component"] for r in cc.collect()}
    assert got == {3: 3, 5: 3, 7: 3, 10: 10, 11: 10}


def test_dedup_clusters_membership(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 8)], "id_a long, id_b long"
    )
    rows = dedup_clusters(pairs).collect()
    assert [(r["component"], r["n_members"], list(r["members"])) for r in rows] == [
        (1, 3, [1, 2, 3]),
        (8, 2, [8, 9]),
    ]


def test_connected_components_matches_union_find(spark):
    """Random graphs vs a driver-side union-find oracle."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 80))
        ]
        edges = [(u, v) for u, v in edges if u != v]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            parent[find(u)] = find(v)
        touched = {u for e in edges for u in e}
        want = {}
        for node in touched:
            root = find(node)
            want[node] = min(m for m in touched if find(m) == root)

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == want, f"trial {trial}"


def test_nonconvergence_raises_not_silent(spark):
    """A chain longer than max_iter rounds must raise, never return
    silently-split components."""
    import pytest

    from fb_ads_bigquery_etl_spark.operators.graph import (
        ConvergenceError,
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["src", "dst"]
    )
    with pytest.raises(ConvergenceError):
        connected_components(chain, max_iter=2)
    # non-strict mode returns the partial labeling instead
    part = connected_components(chain, max_iter=2, strict=False)
    assert part.count() == 31
