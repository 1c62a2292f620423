"""Structured Streaming ingest: file-source docs stream -> mention
triples, availableNow drain, checkpoint resume, batch-equivalence."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F


def _write_landing(spark, tmp, n_docs, start=0):
    from netbase_spark.data.synth import docs_df

    docs = docs_df(spark, n_docs + start, seed=11).where(
        F.col("doc_id").cast("long") >= start
    )
    docs.write.mode("append").parquet(str(tmp / "landing"))


def test_stream_matches_batch_and_resumes(spark, tmp_path: pathlib.Path):
    from netbase_spark.data.fixtures import blacklist_fixture, labels_fixture
    from netbase_spark.operators.gazetteer import build_alias_table
    from netbase_spark.operators.linking import link_mentions
    from netbase_spark.operators.mentions import detect_mentions
    from netbase_spark.schemas import LABELS_SCHEMA
    from netbase_spark.streaming.ingest import start_ingest

    labels_df = spark.createDataFrame(
        [(r["key"], r["label"], r["label_type"], r["lang"]) for r in labels_fixture()],
        LABELS_SCHEMA,
    )
    aliases = build_alias_table(labels_df, with_seo=False)
    alias_names = [r[0] for r in aliases.select("name_norm").distinct().collect()]
    blacklist = blacklist_fixture()

    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    # micro-batch 1: 30 docs
    _write_landing(spark, tmp_path, 30)
    q = start_ingest(
        spark, str(tmp_path / "landing"), str(out), str(ckpt),
        alias_names, aliases, blacklist, available_now=True,
    )
    q.awaitTermination(120)

    # micro-batch 2 (restart from checkpoint): 20 more docs
    _write_landing(spark, tmp_path, 20, start=30)
    q2 = start_ingest(
        spark, str(tmp_path / "landing"), str(out), str(ckpt),
        alias_names, aliases, blacklist, available_now=True,
    )
    q2.awaitTermination(120)

    streamed = spark.read.parquet(str(out)).select("subj", "rel", "obj")

    batch_docs = spark.read.parquet(str(tmp_path / "landing"))
    batch = link_mentions(
        detect_mentions(batch_docs, alias_names, blacklist), aliases
    ).select("subj", "rel", "obj")

    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_watermark_drops_late_rows(spark, tmp_path: pathlib.Path):
    """Watermarked windowed counts: a window is emitted once the
    watermark passes its end, and a row arriving LATER than the
    watermark bound never updates it (bounded state; the checkpoint
    carries the watermark across restarts)."""
    import datetime as dt

    from netbase_spark.streaming.windows import start_windowed_counts

    landing = tmp_path / "events"
    out = tmp_path / "win_out"
    ckpt = tmp_path / "win_ckpt"

    def write(rows):
        spark.createDataFrame(
            [(u, dt.datetime(2026, 1, 1, h, m), a) for u, h, m, a in rows],
            "user_id long, ts timestamp, action string",
        ).write.mode("append").parquet(str(landing))

    # batch 1: three events in [10:00, 10:05) + one at 11:00 that pushes
    # the watermark (11:00 - 10min = 10:50) past that window's end
    write([(1, 10, 0, "a"), (1, 10, 2, "a"), (2, 10, 4, "a"), (9, 11, 0, "a")])
    q = start_windowed_counts(spark, str(landing), str(out), str(ckpt),
                              minutes=5, watermark_minutes=10)
    q.awaitTermination(120)
    first = {
        (r["win_start"].isoformat(), r["n"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert ("2026-01-01T10:00:00", 3) in first  # window finalized

    # batch 2 (restart from checkpoint): a LATE event for the closed
    # window + a fresh one advancing the clock
    write([(3, 10, 1, "late"), (9, 11, 30, "a")])
    q2 = start_windowed_counts(spark, str(landing), str(out), str(ckpt),
                               minutes=5, watermark_minutes=10)
    q2.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    counts_10 = [r["n"] for r in rows if r["win_start"].isoformat() == "2026-01-01T10:00:00"]
    assert counts_10 == [3]  # late row dropped, window not re-emitted
