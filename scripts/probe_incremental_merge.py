#!/usr/bin/env python
"""Incremental-merge cost evidence (round-4): measure the late-merge
maintenance path (merge_mapping + recanonicalize_delta — the
apply_merges core) against the full-table rewrite on a triple table
with a REALISTIC subject distribution: 1M distinct subjects over ~12M
rows (the fixture corpus cannot exhibit the designed regime — its
gazetteer has ~80 entities, so every entity is corpus-order and any
merge touches a large fraction of rows).

Two regimes on the same table:

- ``tail``  — merges among ordinary subjects (~12 rows each): touched
  rows are delta-sized; the delta path re-canonicalizes thousands of
  rows without the full (subj, rel, obj) dedup exchange the rewrite
  pays over all 12M.
- ``hub``   — merges involving the hub subject (10% of all rows):
  touched is corpus-order, the delta path's advantage collapses by
  design (its extra table passes cost more than they save; use the
  full rewrite for mergeAll-scale corrections).

The same key-set correctness for both paths is pinned by
tests/test_incremental.py and the cc_incremental oracle; this probe is
about COST.  Writes BENCH/incremental_merge_probe.json.

Usage: python scripts/probe_incremental_merge.py [--rows 12000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SUBJECTS = 1_000_000
HUB_FRACTION = 10  # 1/10 of rows carry the hub subject


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12_000_000)
    ap.add_argument("--merges", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from netbase_spark.operators.canonicalize import (
        mapping_delta,
        merge_mapping,
        recanonicalize_delta,
        rewrite_triples,
    )
    from netbase_spark.session import get_spark

    spark = get_spark(
        app="probe_incremental_merge",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
        shuffle_partitions=32,
        driver_memory="24g",
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    table_dir = f"/tmp/probe_merge_synth_{args.rows}"
    if not os.path.exists(os.path.join(table_dir, "_SUCCESS")):
        subj = F.when(
            F.pmod("id", F.lit(HUB_FRACTION)) == 0, F.lit("HUB")
        ).otherwise(
            F.concat(
                F.lit("E"),
                F.pmod(F.xxhash64("id"), F.lit(N_SUBJECTS)).cast("string"),
            )
        )
        spark.range(args.rows).repartition(64).select(
            subj.alias("subj"),
            F.lit(7).alias("rel"),
            F.concat(F.lit("D"), F.col("id").cast("string")).alias("obj"),
            F.lit("mention").alias("rule"),
            F.concat(F.lit("D"), F.col("id").cast("string")).alias("doc_id"),
        ).write.mode("overwrite").parquet(table_dir)
    table = spark.read.parquet(table_dir)
    n_rows = table.count()

    empty_map = spark.createDataFrame([], "node string, rep string")
    # contiguous-in-sort-order tail subjects: "E10000xx" strings cluster
    # under the range layout, so their rows live in O(1) files — the
    # scattered pick (E0..E99 interleaves lexicographically with the
    # whole E-range) touched 16/58 files even range-partitioned
    tail_pairs = [
        (f"E100{2 * i + 1:03d}", f"E100{2 * i:03d}")
        for i in range(args.merges)
    ]
    hub_pairs = [("HUB", f"E100{2 * i:03d}") for i in range(args.merges)]

    rec = {"rows": n_rows, "subjects": N_SUBJECTS, "merges": args.merges}

    def timed(name, fn):
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            n = fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        rec[name + "_sec"] = round(best, 2)
        rec[name + "_rows"] = n
        print(f"{name}: {best:.2f}s rows={n}", flush=True)

    for regime, pairs in (("tail", tail_pairs), ("hub", hub_pairs)):
        late = spark.createDataFrame(pairs, "src string, dst string")
        m1 = merge_mapping(empty_map, late).localCheckpoint()
        changed = mapping_delta(empty_map, m1).localCheckpoint()
        rec[f"{regime}_delta_nodes"] = changed.count()
        timed(f"{regime}_delta",
              lambda c=changed: recanonicalize_delta(table, c).count())
        timed(f"{regime}_rewrite_full",
              lambda c=changed: rewrite_triples(table, c).count())
        rec[f"{regime}_speedup"] = round(
            rec[f"{regime}_rewrite_full_sec"] / rec[f"{regime}_delta_sec"], 2
        )

    # --- the path that actually wins at scale: SURGICAL file-level
    # replace on a versioned table (writes only the touched files +
    # a manifest swap) vs the full-rewrite commit (re-writes every
    # byte).  Both timed END-TO-END including their writes, one run
    # each on identical fresh tables (a second identical merge is a
    # no-op by design, so best-of-N does not apply).
    import shutil

    from netbase_spark.plans import versioned as V
    from netbase_spark.streaming.construct import _surgical_recanonicalize

    # key-CLUSTERED layout (range partition on subj): each subject's rows
    # live in O(1) files, so the surgical path rewrites only those —
    # hash partitioning would scatter 100 subjects over most files and
    # the file-level win evaporates (measured: 16/64 files touched
    # hashed vs 1-2 range-clustered)
    src_df = table.repartitionByRange(64, "subj")
    for name in ("surgical", "fullwrite"):
        d = f"/tmp/probe_merge_v_{name}"
        shutil.rmtree(d, ignore_errors=True)
        V.create(src_df, d)
    late = spark.createDataFrame(tail_pairs, "src string, dst string")
    m1 = merge_mapping(empty_map, late).localCheckpoint()
    changed = mapping_delta(empty_map, m1).localCheckpoint()
    changed.count()

    t0 = time.monotonic()
    _surgical_recanonicalize(spark, "/tmp/probe_merge_v_surgical", changed, "m")
    rec["tail_surgical_commit_sec"] = round(time.monotonic() - t0, 2)
    man = V.read_manifest("/tmp/probe_merge_v_surgical")
    man0 = V.read_manifest("/tmp/probe_merge_v_surgical", 0)
    rec["surgical_files_total"] = len(man0["files"])
    rec["surgical_files_rewritten"] = len(
        set(man["files"]) - set(man0["files"])
    )

    t0 = time.monotonic()
    V.replace(
        recanonicalize_delta(
            V.read(spark, "/tmp/probe_merge_v_fullwrite"), changed
        ),
        "/tmp/probe_merge_v_fullwrite",
        batch_id="m",
    )
    rec["tail_fullwrite_commit_sec"] = round(time.monotonic() - t0, 2)
    rec["surgical_speedup"] = round(
        rec["tail_fullwrite_commit_sec"] / rec["tail_surgical_commit_sec"], 2
    )

    with open(os.path.join(REPO, "BENCH", "incremental_merge_probe.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
