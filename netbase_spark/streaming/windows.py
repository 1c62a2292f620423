"""Watermarked event-time windows over a stream — late-data handling.

Reference analog: the engine's incremental insert path tolerates
out-of-order arrivals only up to its buffer (the replay log is strictly
append-ordered, src/netbase.cpp:2521-2533); Structured Streaming makes
the bound explicit: the WATERMARK is how far behind max(event_time) a
row may arrive and still update its window.  Windows whose end is
older than the watermark are finalized and emitted once (append mode);
later rows for them are DROPPED — bounded state at any scale, the
exact property a 100-TB streaming rollup needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

EVENTS_SCHEMA = "user_id long, ts timestamp, action string"


def read_event_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(landing_dir)
    )


def windowed_counts_stream(
    events: DataFrame,
    minutes: int = 5,
    watermark_minutes: int = 10,
) -> DataFrame:
    """Tumbling event-time count per window with a late-data bound —
    the streaming twin of ``operators.events.windowed_counts`` (same
    aggregation; the watermark is the only addition)."""
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(F.window("ts", f"{minutes} minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            F.col("n"),
        )
    )


def start_windowed_counts(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    minutes: int = 5,
    watermark_minutes: int = 10,
) -> StreamingQuery:
    """Append-mode sink: each window is written exactly once, after the
    watermark passes its end; checkpoint carries the watermark across
    restarts, so a resumed drain still drops data later than the
    bound."""
    agg = windowed_counts_stream(
        read_event_stream(spark, landing_dir), minutes, watermark_minutes
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
