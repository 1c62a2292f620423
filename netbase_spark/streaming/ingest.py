"""Structured Streaming ingestion: incremental doc batches -> mention
triples, with checkpointed exactly-once sinks.

The reference's only incremental surface is its append-only replay log
(src/netbase.cpp:2521-2533; src/console.cpp:188-189) — re-applied
commands on restart.  The Spark-native equivalent is a file-source
stream over the landing directory with a checkpointLocation: new doc
files are discovered incrementally, every micro-batch runs the SAME
mention-scan/link transformation as the batch pipeline, and restart
resumes from the sink checkpoint (offsets = the replay log).

Windowed/sessionized event aggregations (operators/events.py) compose
with ``withWatermark`` for late data the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from netbase_spark.operators.linking import link_mentions
from netbase_spark.operators.mentions import detect_mentions
from netbase_spark.schemas import DOCS_SCHEMA


def read_doc_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream of interleaved docs (input_hint schema)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(landing_dir)
    )


def stream_mention_triples(
    docs_stream: DataFrame,
    alias_names: list[str],
    aliases: DataFrame,
    blacklist: set[str],
) -> DataFrame:
    """The batch mention-scan + link plan applied to a streaming DF —
    stateless per-row transforms + a broadcast join, so it runs
    unchanged under micro-batching.

    ``distinct_per_doc``/``already_distinct`` are load-bearing here: a
    doc's mentions all live in one row, so per-doc dedup INSIDE the
    scan UDF gives the same output as a global dropDuplicates — but a
    streaming dropDuplicates is an UNBOUNDED stateful operator (one
    state-store entry per (doc, alias) forever, plus a state shuffle
    per micro-batch), which this formulation avoids entirely."""
    mentions = detect_mentions(
        docs_stream, alias_names, blacklist, distinct_per_doc=True
    )
    return link_mentions(mentions, aliases, already_distinct=True)


def start_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    alias_names: list[str],
    aliases: DataFrame,
    blacklist: set[str],
    available_now: bool = True,
) -> StreamingQuery:
    """Start (or resume, via checkpoint) the incremental construction.
    ``available_now=True`` drains the current backlog then stops —
    batch-equivalent semantics for tests and backfills."""
    triples = stream_mention_triples(
        read_doc_stream(spark, landing_dir), alias_names, aliases, blacklist
    )
    writer = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
