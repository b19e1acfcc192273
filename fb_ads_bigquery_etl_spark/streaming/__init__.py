from fb_ads_bigquery_etl_spark.streaming import windows, state  # noqa: F401
