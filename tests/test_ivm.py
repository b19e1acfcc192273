"""JOIN-view incremental maintenance: layout-metadata validation and
dim-delete semantics (operators/ivm.py). The oracle gates
(`incremental_join_view`, `ivm_dim_delete` in __spark_entry__) prove
value equality vs a from-scratch recompute; these tests pin the
failure modes the oracle can't see — a bucket-modulus mismatch must
refuse to run, and a delete that empties a bucket must actually drop
the partition rather than leave stale rows behind dynamic overwrite's
no-rows-no-overwrite blind spot.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fb_ads_bigquery_etl_spark.operators import ivm


def _frames(spark):
    fact = spark.range(200).select(
        (F.col("id") % 40).alias("k"), F.col("id").alias("m")
    )
    dim = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    return fact, dim


def test_bucket_mismatch_refuses_maintenance(spark, tmp_path):
    fact, dim = _frames(spark)
    path = str(tmp_path / "view")
    ivm.build_join_view(fact, dim, "k", path, buckets=8)
    with pytest.raises(ValueError, match="buckets=8"):
        ivm.apply_fact_append(spark, fact.limit(1), dim, "k", path, buckets=16)
    with pytest.raises(ValueError, match="buckets=8"):
        ivm.apply_dim_update(
            spark, fact, dim.limit(1), dim, "k", path, buckets=4
        )
    with pytest.raises(ValueError, match="key='k'"):
        ivm.apply_fact_append(
            spark,
            fact.withColumnRenamed("k", "k2").limit(1),
            dim.withColumnRenamed("k", "k2"),
            "k2",
            path,
            buckets=8,
        )


def test_dim_delete_drops_rows_and_empty_buckets(spark, tmp_path):
    """Delete a dim key via apply_dim_update: the rebuilt touched
    buckets lose the deleted key's fact rows; a bucket left EMPTY by
    the delete has its partition directory removed (not silently kept
    stale)."""
    fact, dim = _frames(spark)
    path = str(tmp_path / "view")
    # buckets > keyspace spread so SOME key has a bucket to itself and
    # deleting it empties the bucket entirely
    buckets = 512
    ivm.build_join_view(fact, dim, "k", path, buckets=buckets)

    # pick a key whose bucket no other key shares
    kb = {
        r["k"]: r["b"]
        for r in dim.select(
            "k", F.pmod(F.xxhash64("k"), F.lit(buckets)).alias("b")
        ).collect()
    }
    from collections import Counter

    counts = Counter(kb.values())
    victim = next(k for k, b in sorted(kb.items()) if counts[b] == 1)

    deleted = dim.filter(F.col("k") == victim)
    dim_after = dim.filter(F.col("k") != victim)
    ivm.apply_dim_update(
        spark, fact, deleted, dim_after, "k", path, buckets=buckets
    )

    got = ivm.read_join_view(spark, path)
    expect = fact.join(dim_after, "k")
    assert got.filter(F.col("k") == victim).count() == 0
    assert got.count() == expect.count()
    assert (
        got.agg(F.sum("m"), F.sum("attr")).head()
        == expect.agg(F.sum("m"), F.sum("attr")).head()
    )

    # the emptied bucket's partition dir is gone from disk
    assert not os.path.exists(
        os.path.join(path, f"{ivm.BUCKET_COL}={kb[victim]}")
    )


def test_dim_key_change_touches_both_buckets(spark, tmp_path):
    """A key change = delete old + insert new: passing both rows in
    dim_updated_rows touches both buckets and the view equals the
    from-scratch recompute against the post-change dim."""
    fact, dim = _frames(spark)
    path = str(tmp_path / "view")
    ivm.build_join_view(fact, dim, "k", path, buckets=16)

    # key 3 renamed to key 300 (its fact rows no longer join); key 5's
    # attr updated in place
    old3 = dim.filter(F.col("k") == 3)
    new_rows = spark.createDataFrame(
        [(300, 999), (5, 555)], "k long, attr long"
    )
    dim_after = (
        dim.filter(~F.col("k").isin(3, 5)).unionByName(new_rows)
    )
    changed = old3.unionByName(new_rows)
    ivm.apply_dim_update(spark, fact, changed, dim_after, "k", path, buckets=16)

    got = ivm.read_join_view(spark, path)
    expect = fact.join(dim_after, "k")
    assert got.count() == expect.count()
    assert got.filter(F.col("k") == 3).count() == 0
    assert got.filter(F.col("k") == 5).head()["attr"] == 555
