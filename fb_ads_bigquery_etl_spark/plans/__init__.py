from fb_ads_bigquery_etl_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    explain_str,
    has_cartesian,
    pushed_filters,
    reused_exchange_count,
)
