"""Snapshot-versioned parquet tables (plans/versioned): fast-append,
time travel, rollback, replay idempotence, expiry — the sandbox twin of
the north star's Iceberg snapshot checkpoints."""

from __future__ import annotations

import os
import pathlib

import pytest

from netbase_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="test_versioned", cpus=4, shuffle_partitions=4,
                  driver_memory="4g")
    yield s


def _df(spark, rows):
    return spark.createDataFrame(rows, "subj string, rel int, obj string")


def test_versioned_append_time_travel_rollback(spark, tmp_path: pathlib.Path):
    from netbase_spark.plans import versioned as V

    t = str(tmp_path / "triples")
    assert V.create(_df(spark, [("a", 1, "x")]), t) == 0
    assert V.append(_df(spark, [("b", 1, "y")]), t) == 1
    assert V.append(_df(spark, [("c", 2, "z")]), t) == 2

    def rows(version=None):
        return {tuple(r) for r in V.read(spark, t, version).collect()}

    assert rows() == {("a", 1, "x"), ("b", 1, "y"), ("c", 2, "z")}
    assert rows(0) == {("a", 1, "x")}
    assert rows(1) == {("a", 1, "x"), ("b", 1, "y")}

    # rollback is O(1) and older data stays readable
    V.rollback(t, 1)
    assert V.current_version(t) == 1
    assert rows() == rows(1)
    # append after rollback branches with a FRESH version number
    v = V.append(_df(spark, [("d", 1, "w")]), t)
    assert v == 3 and V.read_manifest(t)["parent"] == 1
    assert rows() == {("a", 1, "x"), ("b", 1, "y"), ("d", 1, "w")}
    # the abandoned branch's manifest still exists untouched
    assert rows(2) == {("a", 1, "x"), ("b", 1, "y"), ("c", 2, "z")}

    # create refuses to clobber
    with pytest.raises(FileExistsError):
        V.create(_df(spark, [("e", 1, "v")]), t)


def test_versioned_replay_idempotence_and_expiry(spark, tmp_path: pathlib.Path):
    from netbase_spark.plans import versioned as V

    t = str(tmp_path / "triples")
    V.create(_df(spark, [("a", 1, "x")]), t)
    v1 = V.append(_df(spark, [("b", 1, "y")]), t, batch_id=7)
    # replaying the same foreachBatch id is a no-op commit
    v_again = V.append(_df(spark, [("b", 1, "y")]), t, batch_id=7)
    assert v_again == v1 == V.current_version(t)
    V.append(_df(spark, [("c", 1, "z")]), t, batch_id=8)
    n_rows = V.read(spark, t).count()
    assert n_rows == 3

    # a crashed append (data files written, no commit) leaves orphans...
    V._write_batch_files(_df(spark, [("junk", 9, "junk")]), t)
    # ...which expiry reclaims, along with old manifests
    deleted = V.expire_versions(t, keep=1)
    assert deleted  # the orphan (at least) went away
    assert V.read(spark, t).count() == n_rows  # CURRENT unaffected
    with pytest.raises(FileNotFoundError):
        V.read_manifest(t, 0)  # expired


def test_versioned_holds_construction_batches(spark, tmp_path: pathlib.Path):
    """The batch loop against a versioned table: each construct batch
    fast-appends its fresh triples; time travel reproduces any
    intermediate state of the graph."""
    from netbase_spark.data.synth import docs_df
    from netbase_spark.operators.evaluate import fresh_triples
    from netbase_spark.plans import versioned as V
    from netbase_spark.plans.synth_pipeline import build_artifacts, construct_from

    arts = build_artifacts(spark)
    t = str(tmp_path / "graph")
    V.create(arts.label_triples, t)

    for i, (n, seed) in enumerate([(60, 1), (40, 2)]):
        batch = construct_from(spark, docs_df(spark, n, seed=seed, partitions=2), arts)
        existing = V.read(spark, t)
        V.append(fresh_triples(existing, batch), t, batch_id=i)

    keyset = lambda df: {(r.subj, r.rel, r.obj) for r in df.collect()}
    # final state == full construction over both corpora (key set)
    both = docs_df(spark, 60, seed=1, partitions=2).unionByName(
        docs_df(spark, 40, seed=2, partitions=2)
    )
    assert keyset(V.read(spark, t)) == keyset(construct_from(spark, both, arts))
    # version 1 == label triples + batch 0 only
    b0 = construct_from(spark, docs_df(spark, 60, seed=1, partitions=2), arts)
    assert keyset(V.read(spark, t, 1)) == keyset(
        arts.label_triples.unionByName(b0)
    )


def test_versioned_replace_and_empty_read(spark, tmp_path: pathlib.Path):
    """replace() commits a full-rewrite version (only the new files);
    a version committed from an empty DataFrame stays readable via the
    manifest's recorded schema."""
    from netbase_spark.plans import versioned as V

    t = str(tmp_path / "triples")
    V.create(_df(spark, [("a", 1, "x"), ("b", 1, "y")]), t)
    v = V.replace(_df(spark, [("a", 1, "CANON")]), t, batch_id="m1")
    assert V.current_version(t) == v
    assert {tuple(r) for r in V.read(spark, t).collect()} == {("a", 1, "CANON")}
    # time travel still sees the pre-replace rows
    assert {tuple(r) for r in V.read(spark, t, 0).collect()} == {
        ("a", 1, "x"), ("b", 1, "y"),
    }
    # replay idempotence on the same batch_id
    assert V.replace(_df(spark, [("z", 9, "zz")]), t, batch_id="m1") == v
    # empty commit -> readable empty frame with the recorded schema
    empty = _df(spark, []).where("1=0")
    v2 = V.replace(empty, t)
    got = V.read(spark, t, v2)
    assert got.count() == 0
    assert got.schema == empty.schema


def test_versioned_expiry_reclaims_rolled_back_branch(spark, tmp_path: pathlib.Path):
    from netbase_spark.plans import versioned as V

    t = str(tmp_path / "triples")
    V.create(_df(spark, [("a", 1, "x")]), t)
    V.append(_df(spark, [("b", 1, "y")]), t)
    V.append(_df(spark, [("c", 1, "z")]), t)
    V.rollback(t, 1)
    # a crashed-append staging dir lingers
    os.makedirs(os.path.join(t, "_staging-deadbeef"), exist_ok=True)
    deleted = V.expire_versions(t, keep=2)
    # the abandoned branch (version 2) is gone: manifest AND its files
    with pytest.raises(FileNotFoundError):
        V.read_manifest(t, 2)
    assert deleted  # version 2's exclusive data file was reclaimed
    assert not [f for f in os.listdir(t) if f.startswith("_staging-")]
    # CURRENT unaffected
    assert {tuple(r) for r in V.read(spark, t).collect()} == {
        ("a", 1, "x"), ("b", 1, "y"),
    }
    # keep_future=True preserves the old behavior
    v = V.append(_df(spark, [("d", 1, "w")]), t)
    V.rollback(t, 1)
    V.expire_versions(t, keep=2, keep_future=True)
    assert V.read_manifest(t, v) is not None
