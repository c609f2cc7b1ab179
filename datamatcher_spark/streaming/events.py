"""Structured Streaming surface.

The reference is strictly batch (SURVEY §2.11); this module is the
incremental story a web-scale deployment needs anyway: a file-source
stream over the events schema with watermarked windowed aggregation,
streaming exact-dedup, and a streaming variant of the blocking-key
derivation so new pages can be keyed as they land (the batch pipeline
then links them on the next run — the classic lambda-ish handoff).

Everything uses ``trigger(availableNow=True)`` in tests: same code path
as continuous micro-batching, deterministic for CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Late-data-safe counts per (event_type, window): the watermark bounds
    state; closed windows are emitted and dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup on event_id, state bounded by the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def pages_block_keys_stream(pages: DataFrame, cfg=None) -> DataFrame:
    """Streaming stage-1: derive (url, block_key) for pages as they land.
    Pure projection (no shuffle) — runs at source throughput."""
    from datamatcher_spark.plans.blocking import block_keys
    from datamatcher_spark.plans.config import PipelineConfig

    return block_keys(pages, cfg or PipelineConfig())


def run_to_table(stream_df: DataFrame, path: str, checkpoint: str,
                 mode: str = "append") -> None:
    """Drain everything currently available into a parquet table (exactly-
    once via the checkpoint) and stop — the batch-refresh idiom."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
