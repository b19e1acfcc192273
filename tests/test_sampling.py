"""Deterministic-sampling operator guarantees (operators/sampling.py)."""

from pyspark.sql import functions as F

from fb_ads_bigquery_etl_spark.operators.sampling import (
    assign_split,
    hash_bucket,
    stratified_sample_hash,
)


def test_split_deterministic_and_partitioning_independent(spark):
    df = spark.range(2000).select(F.col("id").alias("k"))
    a = df.repartition(1).select("k", assign_split(F.col("k")).alias("s"))
    b = df.repartition(16).select("k", assign_split(F.col("k")).alias("s"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_stable_under_append(spark):
    base = spark.range(1000)
    bigger = spark.range(3000)
    lhs = {r["id"]: r["s"] for r in base.select("id", assign_split(F.col("id")).alias("s")).collect()}
    rhs = {r["id"]: r["s"] for r in bigger.select("id", assign_split(F.col("id")).alias("s")).collect()}
    assert all(rhs[k] == v for k, v in lhs.items())


def test_split_fractions_approximate(spark):
    df = spark.range(20000)
    counts = dict(
        df.select(assign_split(F.col("id")).alias("s")).groupBy("s").count().collect()
    )
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.9) < 0.02
    assert abs(counts["val"] / 20000 - 0.05) < 0.01
    assert abs(counts["test"] / 20000 - 0.05) < 0.01


def test_salt_decorrelates(spark):
    df = spark.range(5000)
    joint = df.select(
        (hash_bucket(F.col("id")) < 1000).alias("a"),
        (hash_bucket(F.col("id"), "other") < 1000).alias("b"),
    )
    both = joint.filter("a AND b").count()
    # independent 10% samples overlap ~1%; identical ones would overlap 10%
    assert both < 5000 * 0.03


def test_stratified_rates_and_subset(spark):
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("g")
    )
    out = stratified_sample_hash(df, "g", "id", {"true": 0.5, "false": 0.1})
    rates = {
        r["g"]: r["n"] / 5000
        for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert abs(rates["true"] - 0.5) < 0.05 and abs(rates["false"] - 0.1) < 0.02
    # sampled ids are a subset of the input and deterministic on re-run
    again = stratified_sample_hash(df, "g", "id", {"true": 0.5, "false": 0.1})
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_pack_chunks_sharded_equals_window_form(spark):
    """The sub-shard packing path must be bit-identical to the single
    per-group window cum-sum, at several shard widths (width 1 = every
    doc its own sub-shard; huge width = one sub-shard, degenerating to
    the plain form)."""
    from fb_ads_bigquery_etl_spark.functions.portable import tokens
    from fb_ads_bigquery_etl_spark.operators.packing import (
        pack_chunks,
        pack_chunks_sharded,
    )
    from tests.conftest import SF_DIR
    import os

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    sized = d.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    want = sorted(map(tuple, pack_chunks(sized).collect()))
    for width in (1, 7, 64, 10**9):
        got = sorted(
            map(tuple, pack_chunks_sharded(sized, shard_width=width).collect())
        )
        assert got == want, f"width={width}"


def test_topk_per_group_hashrank_equals_window_form(spark):
    """Two-phase hash-agg top-k == row_number() window formulation."""
    from fb_ads_bigquery_etl_spark.functions.portable import hash32
    from fb_ads_bigquery_etl_spark.operators.sampling import (
        topk_per_group_hashrank,
    )
    from pyspark.sql import Window
    from tests.conftest import SF_DIR
    import os

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    w = Window.partitionBy("source").orderBy(
        hash32(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string"))).asc(),
        F.col("doc_id").asc(),
    )
    want = sorted(
        map(
            tuple,
            d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("source", "doc_id", F.col("rk").cast("int"))
            .collect(),
        )
    )
    for subshards in (1, 3, 64):
        got = sorted(
            map(
                tuple,
                topk_per_group_hashrank(
                    d, "source", "doc_id", 5, subshards=subshards
                ).collect(),
            )
        )
        assert got == want, f"subshards={subshards}"


def test_global_row_number_equals_single_window(spark):
    """Range-bucketed global ranking must be bit-identical to the
    single-task window form at several bucket widths (width beyond the
    key range degenerates to one bucket == the plain window)."""
    from fb_ads_bigquery_etl_spark.operators.rank import global_row_number
    from pyspark.sql import Window
    from tests.conftest import SF_DIR
    import os

    li = (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    order = [F.col("cents"), F.col("l_orderkey"), F.col("l_linenumber")]
    want = sorted(
        map(
            tuple,
            li.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
            .select("rank", "l_orderkey", "l_linenumber")
            .collect(),
        )
    )
    for width in (1000, 1_000_000, 10**15):
        got = sorted(
            map(
                tuple,
                global_row_number(li, F.expr(f"cents div {width}"), order)
                .select("rank", "l_orderkey", "l_linenumber")
                .collect(),
            )
        )
        assert got == want, f"width={width}"


def test_pair_supports_max_basket_drops_outlier_groups(spark):
    from fb_ads_bigquery_etl_spark.operators.basket import pair_supports

    rows = [("big", i) for i in range(6)] + [("small", 1), ("small", 2)]
    df = spark.createDataFrame(rows, ["g", "item"])
    got = {
        (r["pa"], r["pb"]): r["support"]
        for r in pair_supports(df, "g", "item", max_basket=3).collect()
    }
    assert got == {(1, 2): 1}  # the 6-item basket is dropped entirely


def test_rolling_distinct_all_days_reports_trailing_window(spark):
    import datetime

    from fb_ads_bigquery_etl_spark.operators.temporal import rolling_distinct

    d0 = datetime.date(2026, 3, 1)
    df = spark.createDataFrame([(d0, 1), (d0, 2)], ["day", "id"])
    got = {
        r["day"]: r["n_distinct"]
        for r in rolling_distinct(
            df, "day", "id", days=3, observed_days_only=False
        ).collect()
    }
    # with the semi-join off, the scatter reports every forward day
    assert got == {
        d0: 2,
        d0 + datetime.timedelta(days=1): 2,
        d0 + datetime.timedelta(days=2): 2,
    }


def test_duplicated_gram_spans_merges_overlaps(spark):
    from fb_ads_bigquery_etl_spark.operators.dedup import duplicated_gram_spans

    rows = [
        (0, "a b c d e f x y z"),   # shares "a b c d e f" with doc 1
        (1, "q a b c d e f r"),
        (2, "m n o p m n o p"),     # duplicates ITSELF (within-doc repeat)
        (3, "totally unique words only here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in duplicated_gram_spans(df, k=3).collect()
    }
    # doc 0: grams at pos 0..3 are duplicated -> one span [0, len 6]
    # doc 1: the run sits at pos 1..4 -> span [1, len 6]
    # doc 2: positions 0,1,4,5 duplicated; gap 4-1=3 <= k merges -> [0, len 8]
    # doc 3: nothing
    assert got == {(0, 0, 6), (1, 1, 6), (2, 0, 8)}


def test_duplicated_gram_spans_splits_on_gap(spark):
    from fb_ads_bigquery_etl_spark.operators.dedup import duplicated_gram_spans

    # the duplicated phrase appears at both ends of doc 2 with a long
    # unique middle: two separate spans, not one
    rows = [
        (0, "p q r s"),
        (1, "p q r s"),
        (2, "p q r s u1 u2 u3 u4 u5 u6 p q r s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in duplicated_gram_spans(df, k=3).collect()
    )
    assert got == [(0, 0, 4), (1, 0, 4), (2, 0, 4), (2, 10, 4)]


def test_duplicated_grams_short_docs_do_not_crash(spark):
    """Docs shorter than k tokens (incl. empty) must emit no grams.

    Regression: sequence(1, 0) is DESCENDING in Spark ([1, 0]), so an
    unguarded gram index crashed on slice(t, 0, k) for any short doc
    (round-5 ADVICE, dedup.py). Same latent pattern in word_shingles.
    """
    from fb_ads_bigquery_etl_spark.functions.portable import tokens, word_shingles
    from fb_ads_bigquery_etl_spark.operators.dedup import (
        duplicated_gram_spans,
        strip_duplicated_spans,
    )
    from pyspark.sql import functions as F

    rows = [
        (0, "one two"),            # shorter than k=3
        (1, ""),                   # empty after tokenization
        (2, "a b c d"),
        (3, "a b c d"),            # dup of 2 so spans is non-empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in duplicated_gram_spans(df, k=3).collect()
    )
    assert got == [(2, 0, 4), (3, 0, 4)]

    stripped = {
        r["doc_id"]: r["cleaned_tokens"]
        for r in strip_duplicated_spans(df, k=3).collect()
    }
    assert stripped[0] == ["one", "two"]   # short doc passes through intact
    assert stripped[1] == []
    assert stripped[2] == [] and stripped[3] == []

    sh = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", word_shingles(tokens(F.col("text")), 3).alias("sh")
        ).collect()
    }
    assert sh[0] == [] and sh[1] == []
    assert sh[2] == ["a b c", "b c d"]


def test_temperature_mix_flattens_skewed_sources(spark):
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.sampling import temperature_mix

    rows = [("big", i) for i in range(100)] + [("small", 1000 + i) for i in range(4)]
    df = spark.createDataFrame(rows, ["source", "key"])
    kept = temperature_mix(df, "source", "key", target_frac=0.2)
    rates = {
        r["source"]: r["rate"]
        for r in kept.groupBy("source").agg(F.min("_rate").alias("rate")).collect()
    }
    # weights floor(sqrt(n)): big=10, small=2; N=104, S=12
    assert abs(rates["big"] - 0.2 * 104 * 10 / (12 * 100)) < 1e-12
    assert abs(rates["small"] - 0.2 * 104 * 2 / (12 * 4)) < 1e-12
    assert rates["small"] > rates["big"]  # flattening favors the small source
    # deterministic: same sampled key set on re-run
    k1 = sorted(r["key"] for r in kept.select("key").collect())
    k2 = sorted(
        r["key"]
        for r in temperature_mix(df, "source", "key", target_frac=0.2)
        .select("key")
        .collect()
    )
    assert k1 == k2 and k1


def test_epoch_shuffle_deterministic_and_distributed(spark):
    """epoch_shuffle: same epoch -> identical global order regardless
    of input partitioning; different epochs -> different order; plan
    uses RANGE partitioning on the key (distributed total order), not
    a single-task global sort."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.sampling import epoch_shuffle

    df = spark.range(2_000).select(F.col("id").alias("doc_id"))

    def order_of(frame, epoch):
        out = epoch_shuffle(frame, "doc_id", epoch)
        return [r["doc_id"] for r in out.collect()]

    o1 = order_of(df, 1)
    o1b = order_of(df.repartition(7), 1)
    o2 = order_of(df, 2)
    assert o1 == o1b
    assert o1 != o2
    assert sorted(o1) == list(range(2_000)) == sorted(o2)

    plan = (
        epoch_shuffle(df, "doc_id", 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower(), plan


def test_dedup_aware_split_no_cluster_straddles(spark):
    """Every near-dup pair lands in ONE split (the leakage guarantee);
    isolated docs become singleton clusters; the naive per-doc hash
    split over the same docs DOES straddle some pair (the control that
    motivates cluster-aware splitting)."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.sampling import (
        assign_split,
        dedup_aware_split,
    )

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    # chains {3k, 3k+1, 3k+2} for k < 20: 60 paired docs, 140 isolated
    pairs = spark.createDataFrame(
        [(3 * k, 3 * k + 1) for k in range(20)]
        + [(3 * k + 1, 3 * k + 2) for k in range(20)],
        "id_a long, id_b long",
    )
    out = dedup_aware_split(docs, pairs).collect()
    split_of = {r["id"]: r["split"] for r in out}
    cluster_of = {r["id"]: r["cluster"] for r in out}
    assert len(out) == 200
    for k in range(20):
        trio = [3 * k, 3 * k + 1, 3 * k + 2]
        assert len({split_of[i] for i in trio}) == 1, trio
        assert {cluster_of[i] for i in trio} == {3 * k}
    # isolated docs are their own cluster
    assert cluster_of[199] == 199
    # the naive split straddles at least one chained pair
    naive = {
        r["doc_id"]: r["ns"]
        for r in docs.select(
            "doc_id", assign_split(F.col("doc_id"), salt="cl:").alias("ns")
        ).collect()
    }
    assert any(
        naive[a] != naive[b]
        for a, b in [(3 * k, 3 * k + 1) for k in range(20)]
        + [(3 * k + 1, 3 * k + 2) for k in range(20)]
    )
