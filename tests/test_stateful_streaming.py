"""applyInPandasWithState operators: first-seen dedup + running counts
across micro-batches with checkpointed state."""

from __future__ import annotations

import pathlib

import pandas as pd


def _land(spark, tmp, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).write.mode("append").parquet(str(tmp / "landing"))


def _drain(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedup_stream_first_seen_wins(spark, tmp_path: pathlib.Path):
    from netbase_spark.streaming.stateful import dedup_stream

    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    # batch 1: two distinct texts, one in-batch duplicate
    _land(
        spark,
        tmp_path,
        [("d01", "alpha beta"), ("d02", "gamma"), ("d03", "alpha  beta")],
    )
    stream = spark.readStream.schema("doc_id string, text string").parquet(
        str(tmp_path / "landing")
    )
    _drain(dedup_stream(stream), out, ckpt)

    got1 = spark.read.parquet(str(out)).toPandas()
    # 'alpha beta' and 'alpha  beta' share a fingerprint (ws-normalized);
    # first-seen (min doc_id in batch) wins
    assert sorted(got1["doc_id"]) == ["d01", "d02"]

    # batch 2 after restart: one cross-batch dup, one new text
    _land(spark, tmp_path, [("d04", "ALPHA BETA"), ("d05", "delta")])
    stream2 = spark.readStream.schema("doc_id string, text string").parquet(
        str(tmp_path / "landing")
    )
    _drain(dedup_stream(stream2), out, ckpt)

    got2 = spark.read.parquet(str(out)).toPandas()
    # d04 suppressed by state persisted in the checkpoint; d05 admitted
    assert sorted(got2["doc_id"]) == ["d01", "d02", "d05"]


def test_running_counts_accumulate_across_batches(spark, tmp_path: pathlib.Path):
    from netbase_spark.streaming.stateful import running_counts_stream

    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    _land(spark, tmp_path, [("a", "x"), ("a", "y"), ("b", "z")])
    stream = spark.readStream.schema("doc_id string, text string").parquet(
        str(tmp_path / "landing")
    )
    _drain(running_counts_stream(stream, "doc_id"), out, ckpt)

    _land(spark, tmp_path, [("a", "w")])
    stream2 = spark.readStream.schema("doc_id string, text string").parquet(
        str(tmp_path / "landing")
    )
    _drain(running_counts_stream(stream2, "doc_id"), out, ckpt)

    got = spark.read.parquet(str(out)).toPandas()
    # latest emitted total per key: a=3 (2 then +1), b=1
    latest = got.groupby("key")["total"].max()
    assert latest["a"] == 3
    assert latest["b"] == 1
