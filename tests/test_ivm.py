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


def test_max_view_delete_recomputes_only_touched_buckets(spark, tmp_path):
    """The non-invertible path's bounded-IO contract: a delete must
    rewrite ONLY the store/view buckets holding deleted keys (untouched
    partition dirs keep their exact file sets), and the maintained view
    must equal a from-scratch GROUP BY over surviving rows — including
    dropping a group whose rows were all deleted."""
    fact = spark.range(400).select(
        F.col("id").alias("rid"),
        (F.col("id") % 20).alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    vp, sp = str(tmp_path / "view"), str(tmp_path / "store")
    ivm.build_max_view(fact, "k", "v", "rid", vp, sp, buckets=8)

    delta = spark.range(400, 500).select(
        F.col("id").alias("rid"),
        (F.col("id") % 20).alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    ivm.apply_max_view_append(spark, delta, "k", "v", "rid", vp, sp, buckets=8)

    # delete every row of key 3 (group must vanish) plus one row of key 7
    full = fact.unionByName(delta)
    deletes = full.filter((F.col("k") == 3) | (F.col("rid") == 7)).select(
        "rid", "k"
    )
    touched_buckets = {
        r[0]
        for r in ivm._with_bucket(deletes, "k", 8)
        .select(ivm.BUCKET_COL)
        .distinct()
        .collect()
    }
    assert len(touched_buckets) < 8  # the gate below must mean something

    def files_by_bucket(path):
        out = {}
        for d in os.listdir(path):
            if d.startswith(f"{ivm.BUCKET_COL}="):
                b = int(d.split("=")[1])
                out[b] = sorted(os.listdir(os.path.join(path, d)))
        return out

    before_s, before_v = files_by_bucket(sp), files_by_bucket(vp)
    ivm.apply_max_view_delete(
        spark, deletes, "k", "v", "rid", vp, sp, buckets=8
    )
    after_s, after_v = files_by_bucket(sp), files_by_bucket(vp)
    for b in set(before_s) - touched_buckets:
        assert after_s[b] == before_s[b], f"store bucket {b} rewritten"
    for b in set(before_v) - touched_buckets:
        assert after_v[b] == before_v[b], f"view bucket {b} rewritten"

    got = {
        r["k"]: (r["max_v"], r["n_rows"])
        for r in ivm.read_max_view(spark, vp).collect()
    }
    surv = full.join(deletes, ["rid", "k"], "left_anti")
    want = {
        r["k"]: (r["mx"], r["n"])
        for r in surv.groupBy("k")
        .agg(F.max("v").alias("mx"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    assert 3 not in got


def test_max_view_delete_is_pair_addressed(spark, tmp_path):
    """Deletes address (rid, key) PAIRS: an rid that repeats under a
    key absent from the deletes must survive — including when that
    twin row lives in a bucket the delete never touches. (rid-only
    anti-joins scoped to the deleted keys' buckets would leave stale
    rows whenever the twin's bucket happened to be touched, and drop
    live rows when it wasn't — this pins the pair contract.)"""
    rows = [
        # rid 100 appears under k=0 (deleted) AND k=1 (must survive);
        # with buckets=8 the two keys hash to different buckets.
        (100, 0, 50),
        (100, 1, 60),
        (101, 0, 70),
        (102, 1, 80),
        (103, 2, 90),
    ]
    fact = spark.createDataFrame(rows, "rid long, k long, v long")
    vp, sp = str(tmp_path / "view"), str(tmp_path / "store")
    ivm.build_max_view(fact, "k", "v", "rid", vp, sp, buckets=8)
    deletes = spark.createDataFrame([(100, 0)], "rid long, k long")
    ivm.apply_max_view_delete(
        spark, deletes, "k", "v", "rid", vp, sp, buckets=8
    )
    got = {
        r["k"]: (r["max_v"], r["n_rows"])
        for r in ivm.read_max_view(spark, vp).collect()
    }
    assert got == {0: (70, 1), 1: (80, 2), 2: (90, 1)}


def test_max_view_refuses_layout_mismatch(spark, tmp_path):
    fact = spark.range(50).select(
        F.col("id").alias("rid"), (F.col("id") % 5).alias("k"),
        F.col("id").alias("v"),
    )
    vp, sp = str(tmp_path / "v"), str(tmp_path / "s")
    ivm.build_max_view(fact, "k", "v", "rid", vp, sp, buckets=4)
    with pytest.raises(ValueError, match="buckets=4"):
        ivm.apply_max_view_delete(
            spark, fact.limit(1).select("rid", "k"),
            "k", "v", "rid", vp, sp, buckets=8,
        )


def test_distinct_view_bounded_io_and_correctness(spark, tmp_path):
    """COUNT(DISTINCT) maintenance must (a) keep untouched partition
    dirs' exact file sets through BOTH an append and a delete (the
    O(touched)-not-O(view) contract), and (b) end equal to a
    from-scratch COUNT(DISTINCT) over surviving rows — including
    dropping a fully-deleted group and NOT dropping the distinct count
    when a deleted value survives in another row (the non-invertible
    case that forces the re-distinct)."""
    fact = spark.range(400).select(
        F.col("id").alias("rid"),
        (F.col("id") % 20).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    vp, sp = str(tmp_path / "view"), str(tmp_path / "store")
    ivm.build_distinct_view(fact, "k", "v", "rid", vp, sp, buckets=8)

    def files_by_bucket(path):
        out = {}
        for d in os.listdir(path):
            if d.startswith(f"{ivm.BUCKET_COL}="):
                b = int(d.split("=")[1])
                out[b] = sorted(os.listdir(os.path.join(path, d)))
        return out

    # append touching ONLY key 5's bucket
    delta = spark.createDataFrame(
        [(1000, 5, 6), (1001, 5, 6)], "rid long, k long, v long"
    )
    t_append = {
        r[0]
        for r in ivm._with_bucket(delta, "k", 8)
        .select(ivm.BUCKET_COL)
        .distinct()
        .collect()
    }
    before_s, before_v = files_by_bucket(sp), files_by_bucket(vp)
    ivm.apply_distinct_view_append(
        spark, delta, "k", "v", "rid", vp, sp, buckets=8
    )
    after_v = files_by_bucket(vp)
    for b in set(before_v) - t_append:
        assert after_v[b] == before_v[b], f"append rewrote view bucket {b}"

    # delete: all of key 3 (group vanishes) + ONE row of (k=7, v=0);
    # k=7 keeps other v=0 rows, so n_distinct must NOT decrement
    full = fact.unionByName(delta)
    first_k7_v0 = (
        full.filter((F.col("k") == 7) & (F.col("v") == 0))
        .agg(F.min("rid"))
        .first()[0]
    )
    deletes = (
        full.filter((F.col("k") == 3) | (F.col("rid") == first_k7_v0))
        .select("rid", "k")
    )
    touched = {
        r[0]
        for r in ivm._with_bucket(deletes, "k", 8)
        .select(ivm.BUCKET_COL)
        .distinct()
        .collect()
    }
    assert len(touched) < 8
    before_s, before_v = files_by_bucket(sp), files_by_bucket(vp)
    ivm.apply_distinct_view_delete(
        spark, deletes, "k", "v", "rid", vp, sp, buckets=8
    )
    after_s, after_v = files_by_bucket(sp), files_by_bucket(vp)
    for b in set(before_s) - touched:
        assert after_s[b] == before_s[b], f"store bucket {b} rewritten"
    for b in set(before_v) - touched:
        assert after_v[b] == before_v[b], f"view bucket {b} rewritten"

    got = {
        r["k"]: (r["n_distinct_v"], r["n_rows"])
        for r in ivm.read_distinct_view(spark, vp).collect()
    }
    surv = full.join(deletes, ["rid", "k"], "left_anti")
    want = {
        r["k"]: (r["nd"], r["n"])
        for r in surv.groupBy("k")
        .agg(F.countDistinct("v").alias("nd"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    assert 3 not in got
    assert got[7][0] == 7  # deleted value survives in another row
