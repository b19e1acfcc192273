"""fb_ads_bigquery_etl_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(noahmanion/fb-ads-bigquery-etl: Facebook Marketing API -> flatten/dedup
-> BigQuery) as first-class, scale-out Spark DataFrame operators, and adds
the LLM-data-pipeline operator suite (dedup families, similarity search,
text analysis, multimodal columns).

Design stance (SURVEY.md §7):
  * DataFrame-first — declare logical plans, let Catalyst/AQE pick physical.
  * No driver-side collects on the data path.
  * Partitioned parquet tables (DAY partitioning on date_start) mirror the
    reference's BigQuery partitioning (docs/GCP_SETUP.md:146-152).
  * Python UDFs only where built-ins genuinely can't express the semantics,
    and then Arrow-batched (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"
