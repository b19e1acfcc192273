from fb_ads_bigquery_etl_spark.streaming import (  # noqa: F401
    ingest,
    joins,
    state,
    windows,
)
