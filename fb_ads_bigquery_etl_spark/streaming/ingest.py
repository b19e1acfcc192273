"""Continuous ingest: landing-zone stream -> idempotent MERGE.

The reference ingests by scheduled batch re-runs (EP1 daily + EP2
backfill) and repairs late/duplicate data with re-run + dedup. The
streaming replacement: producers drop flattened parquet into a landing
directory; a file-source stream discovers new files exactly-once
(checkpointed), dedups within each micro-batch, and MERGEs on the
canonical key — so replayed files, overlapping backfills, and restarts
all converge to the same table state.

Scale: each micro-batch shuffles only its own rows; the MERGE rewrites
only the partitions present in the batch (sinks.merge_upsert). State on
the stream side is just the file log — no row-level state store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from fb_ads_bigquery_etl_spark.operators.dedup import dedup_any
from fb_ads_bigquery_etl_spark.schema import DEDUP_KEY
from fb_ads_bigquery_etl_spark.sinks import merge_upsert


def stream_merge_ingest(
    spark: SparkSession,
    landing_path: str,
    table_path: str,
    *,
    checkpoint_path: str,
    key: tuple[str, ...] = DEDUP_KEY,
    max_files_per_trigger: int | None = None,
) -> int:
    """Drain the landing zone (Trigger.AvailableNow) into the table via
    per-batch dedup + key-MERGE. Returns micro-batches processed.

    Restart-safe: the checkpoint's file log skips already-ingested
    files, and the MERGE makes re-delivery harmless anyway
    (exactly-once effect from at-least-once delivery + idempotent sink).
    """
    schema = spark.read.parquet(landing_path).schema  # driver-side peek
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(landing_path)

    batches = {"n": 0}

    def _sink(batch_df, batch_id: int) -> None:
        batches["n"] += 1
        merge_upsert(spark, dedup_any(batch_df, key), table_path, key)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]
