"""Structured Streaming ingest.

The reference is batch-only (CLI); the Spark-native engine adds an
incremental path for a continuously-growing source table:

- `stream_sources`      : readStream over a parquet directory of source
                          files -> the same Arrow-batched parse ->
                          append-mode parsed sink (exactly-once via the
                          streaming checkpoint; the batch pipeline's
                          lineage/resume remains the batch equivalent).
- `stream_event_counts` : watermarked tumbling-window aggregation over an
                          event stream (late data handled by watermark) —
                          the streaming twin of the `events_hourly` batch
                          query.

Both run with `trigger(availableNow=True)` in tests (process everything
then stop), and unbounded in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .parse import parse_sources
from .schemas import SOURCE_SCHEMA


def stream_sources(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    materialize_modifiers: bool = False,
):
    """Incrementally parse BEL source files as they land in `src_dir`.

    Returns the StreamingQuery.  The parse UDF is identical to the batch
    path — mapInPandas works unchanged on streaming DataFrames because the
    operation is stateless per row.
    """
    stream = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(src_dir)
    )
    parsed = parse_sources(stream,
                           materialize_modifiers=materialize_modifiers)
    writer = (
        parsed.writeStream
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window counts per event_type over a streaming
    events DataFrame (ts, event_type, value).  Watermarks require a
    session-zoned timestamp, so TIMESTAMP_NTZ inputs are cast."""
    return (
        events_stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "sum_value")
    )
