"""Data-quality audit operator tests (operators/quality.py)."""

from fb_ads_bigquery_etl_spark.operators import quality as Q


def test_audit_counts_violations(spark):
    df = spark.createDataFrame(
        [(1, 50.0, "1-URGENT"), (2, -5.0, "9-BAD"), (None, 150.0, "2-HIGH"), (4, None, "3-MEDIUM")],
        "k int, price double, prio string",
    )
    row = Q.audit(
        df,
        [Q.not_null("k"), Q.in_range("price", 0, 100), Q.matches("prio", "^[1-5]-")],
    ).collect()[0]
    assert row["total_rows"] == 4
    assert row["violations_k_not_null"] == 1
    # price: -5 and 150 violate; NULL price is neither (3VL, documented)
    assert row["violations_price_in_range"] == 2
    assert row["violations_prio_matches"] == 1


def test_duplicate_key_count(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k int"
    )
    row = Q.duplicate_key_count(df, ["k"]).collect()[0]
    assert (row["n_keys"], row["n_dup_keys"], row["n_excess_rows"]) == (3, 1, 2)
