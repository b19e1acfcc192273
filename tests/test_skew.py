"""Salted-join equivalence and salt-distribution tests."""

from pyspark.sql import functions as F

from fb_ads_bigquery_etl_spark.operators.skew import salted_join


def _skewed_fact(spark):
    # 90% of rows share one hot key
    return spark.range(10000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"d{i}") for i in range(97)],
        "k string, attr string",
    )
    plain = fact.join(dim, "k").select("k", "v", "attr")
    salted = salted_join(fact, dim, "k").select("k", "v", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer_matches(spark):
    fact = _skewed_fact(spark)
    dim = spark.createDataFrame([("HOT", "hot-dim")], "k string, attr string")
    plain = fact.join(dim, "k", "left").select("k", "v", "attr")
    salted = salted_join(fact, dim, "k", how="left").select("k", "v", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_spreads_hot_key(spark):
    fact = _skewed_fact(spark)
    salts = (
        fact.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8))
        )
        .filter(F.col("k") == "HOT")
        .groupBy("_salt")
        .count()
        .collect()
    )
    counts = [r["count"] for r in salts]
    assert len(counts) == 8, "hot key must span all salt buckets"
    assert max(counts) < sum(counts) * 0.25, "no salt bucket should dominate"


def test_salted_join_rejects_dim_preserving_types(spark):
    import pytest

    fact = spark.createDataFrame([(1, "x")], ["k", "a"])
    dim = spark.createDataFrame([(1, "d"), (2, "unmatched")], ["k", "b"])
    for how in ["right", "full", "full_outer", "outer"]:
        with pytest.raises(ValueError, match="salt-safe"):
            salted_join(fact, dim, "k", how=how)


def test_salted_join_semi_anti_match_plain(spark):
    fact = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["k", "a"])
    dim = spark.createDataFrame([(1, "d"), (1, "d2")], ["k", "b"])
    for how in ["left_semi", "left_anti"]:
        got = sorted(salted_join(fact, dim, "k", how=how).collect())
        want = sorted(fact.join(dim, "k", how).collect())
        assert got == want, how
