"""Full-construction streaming loop (streaming/construct.py): docs land
as files, micro-batches append fresh canonical triples against prebuilt
artifacts, checkpoint restart resumes, and the final table equals a
full batch rebuild on the key set."""

from __future__ import annotations

import pathlib

import pytest

from pyspark.sql import functions as F

from netbase_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="test_streaming_construct", cpus=4,
                  shuffle_partitions=4, driver_memory="4g")
    yield s


def _land(spark, tmp, n_docs, start=0):
    from netbase_spark.data.synth import docs_df

    docs = docs_df(spark, n_docs + start, seed=17).where(
        F.col("doc_id").cast("long") >= start
    )
    docs.write.mode("append").parquet(str(tmp / "landing"))


def test_streaming_construct_matches_batch_rebuild(spark, tmp_path: pathlib.Path):
    from netbase_spark.plans.synth_pipeline import build_artifacts, construct_from
    from netbase_spark.streaming.construct import start_incremental_construct

    arts = build_artifacts(spark)
    table = tmp_path / "triples"
    ckpt = tmp_path / "ckpt"

    # drain 1: 40 docs
    _land(spark, tmp_path, 40)
    q = start_incremental_construct(
        spark, str(tmp_path / "landing"), str(table), str(ckpt), arts,
        available_now=True, max_files_per_trigger=2,
    )
    q.awaitTermination(180)

    # drain 2 (checkpoint restart): 25 more docs
    _land(spark, tmp_path, 25, start=40)
    q2 = start_incremental_construct(
        spark, str(tmp_path / "landing"), str(table), str(ckpt), arts,
        available_now=True, max_files_per_trigger=2,
    )
    q2.awaitTermination(180)

    streamed = spark.read.parquet(str(table))
    full = construct_from(
        spark, spark.read.parquet(str(tmp_path / "landing")), arts
    )
    keyset = lambda df: {(r.subj, r.rel, r.obj) for r in df.collect()}
    assert keyset(streamed) == keyset(full)
    # no key duplicates despite multi-batch appends + the label seed
    assert (
        streamed.count()
        == streamed.dropDuplicates(["subj", "rel", "obj"]).count()
    )
    # per-batch metrics + per-partition lineage were recorded, and the
    # lineage row counts reconcile with the appended table
    import json

    with open(table / "_construct_metrics.jsonl") as fh:
        recs = [json.loads(l) for l in fh]
    assert len(recs) >= 2  # multiple micro-batches ran
    assert all(r["fresh_rows"] == sum(n for _, n in r["partitions"]) for r in recs)
    label_rows = arts.label_triples.count()
    assert label_rows + sum(r["fresh_rows"] for r in recs) == streamed.count()


def test_streaming_construct_versioned_sink(spark, tmp_path: pathlib.Path):
    """versioned=True: each micro-batch commits a manifest version; the
    final state equals a full rebuild, intermediate versions stay
    time-travel readable, and metrics reconcile with the manifests."""
    from netbase_spark.plans import versioned as V
    from netbase_spark.plans.synth_pipeline import build_artifacts, construct_from
    from netbase_spark.streaming.construct import start_incremental_construct

    arts = build_artifacts(spark)
    table = tmp_path / "vtriples"
    ckpt = tmp_path / "vckpt"

    _land(spark, tmp_path, 40)
    q = start_incremental_construct(
        spark, str(tmp_path / "landing"), str(table), str(ckpt), arts,
        available_now=True, max_files_per_trigger=2, versioned=True,
    )
    q.awaitTermination(180)
    v_mid = V.current_version(str(table))
    assert v_mid >= 1

    _land(spark, tmp_path, 25, start=40)
    q2 = start_incremental_construct(
        spark, str(tmp_path / "landing"), str(table), str(ckpt), arts,
        available_now=True, max_files_per_trigger=2, versioned=True,
    )
    q2.awaitTermination(180)
    assert V.current_version(str(table)) > v_mid

    streamed = V.read(spark, str(table))
    full = construct_from(
        spark, spark.read.parquet(str(tmp_path / "landing")), arts
    )
    keyset = lambda df: {(r.subj, r.rel, r.obj) for r in df.collect()}
    assert keyset(streamed) == keyset(full)
    assert (
        streamed.count()
        == streamed.dropDuplicates(["subj", "rel", "obj"]).count()
    )
    # time travel: the mid-stream version is a strict subset of final
    mid = V.read(spark, str(table), v_mid)
    assert keyset(mid) < keyset(streamed)
    # metrics reconcile against the versioned table too
    import json

    with open(table / "_construct_metrics.jsonl") as fh:
        recs = [json.loads(l) for l in fh]
    label_rows = arts.label_triples.count()
    assert label_rows + sum(r["fresh_rows"] for r in recs) == streamed.count()
