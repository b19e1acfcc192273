from fb_ads_bigquery_etl_spark.streaming import ingest, windows, state  # noqa: F401
