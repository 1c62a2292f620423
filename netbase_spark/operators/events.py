"""Event-time operators over the events table: tumbling-window
aggregation and gap-based sessionization.

The reference engine is batch-only (SURVEY.md §2.7) — these are the
training-pipeline operators a 100 TB ingest needs.  Both are written so
the SAME transformation runs in batch (tested against the DuckDB
oracle) and under Structured Streaming (see netbase_spark/streaming/):
tumbling windows + watermark compose directly; sessionization uses the
lag/cumsum formulation in batch and maps to
``applyInPandasWithState`` / session_window in streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling event-time windows per event_type:
    (event_type, window_start, n, sum_value).  groupBy window+type —
    partial aggregation map-side; with readStream + watermark this exact
    expression is the streaming aggregation."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(F.col("event_type"), w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            "n",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``.

    Batch formulation: lag + conditional cumsum over a per-user window —
    one shuffle on user_id; session_id = first event ts of the session.
    Streaming: the same semantics via ``session_window`` or
    ``applyInPandasWithState``.
    """
    byuser = Window.partitionBy("user_id").orderBy("ts")
    # microsecond precision: cast-to-long would truncate sub-second gaps
    # (NTZ -> TS cast is linear under the UTC session tz set in session.py)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(byuser)
    marked = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn("sess_nr", F.sum("new_sess").over(byuser))
    return (
        sess.groupBy("user_id", "sess_nr")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("sess_nr")
    )
