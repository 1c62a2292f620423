#!/usr/bin/env python
"""Layout-maintenance evidence (round-5 ask #1): the round-4 surgical
merge commit's win exists only on key-clustered layouts, and streamed
appends decay clustering over time.  This probe pins the invariant
``rewrite_data_files`` buys: a surgical merge AFTER N appended batches
is back to touching O(touched-subject) files once compaction restores
the cluster-by-subj layout.

Sequence, all on one synthetic 1M-subject triple table:

1. create a versioned table range-clustered by subj (the layout the
   round-4 probe measured the 2x commit win on);
2. append ``--batches`` streamed batches whose subjects span the whole
   key range (the streaming loop's normal decay mode);
3. surgical tail-merge on the DECAYED layout -> files touched + secs;
4. ``rewrite_data_files(cluster_by=subj)`` -> compaction secs,
   file count before/after;
5. the same tail-merge on the COMPACTED layout -> files touched + secs.

Writes BENCH/compaction_probe.json.

Usage: python scripts/probe_compaction.py [--rows 12000000 --batches 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SUBJECTS = 1_000_000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-rows", type=int, default=150_000)
    ap.add_argument("--merges", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from netbase_spark.operators.canonicalize import mapping_delta, merge_mapping
    from netbase_spark.plans import versioned as V
    from netbase_spark.session import get_spark
    from netbase_spark.streaming.construct import _surgical_recanonicalize

    spark = get_spark(
        app="probe_compaction",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
        shuffle_partitions=32,
        driver_memory="24g",
        extra={"spark.ui.showConsoleProgress": "false"},
    )

    def synth(n, salt):
        return spark.range(n).repartition(32).select(
            F.concat(
                F.lit("E"),
                F.pmod(F.xxhash64(F.col("id") + F.lit(salt)), F.lit(N_SUBJECTS))
                .cast("string"),
            ).alias("subj"),
            F.lit(7).alias("rel"),
            F.concat(F.lit(f"D{salt}-"), F.col("id").cast("string")).alias("obj"),
            F.lit("mention").alias("rule"),
            F.concat(F.lit(f"D{salt}-"), F.col("id").cast("string")).alias("doc_id"),
        )

    table = "/tmp/probe_compaction_table"
    shutil.rmtree(table, ignore_errors=True)
    V.create(synth(args.rows, 0).repartitionByRange(64, "subj"), table)
    rec = {
        "rows_base": args.rows,
        "batches": args.batches,
        "batch_rows": args.batch_rows,
        "merges": args.merges,
        "files_initial": len(V.read_manifest(table)["files"]),
    }

    # 2. streamed appends decay the clustering: every batch spans the
    # whole subject range, so each adds files holding rows for keys
    # everywhere in the sort order
    for k in range(args.batches):
        V.append(synth(args.batch_rows, k + 1), table, batch_id=k)
    rec["files_after_appends"] = len(V.read_manifest(table)["files"])

    empty_map = spark.createDataFrame([], "node string, rep string")
    # same contiguous-tail pick as the round-4 probe: subjects adjacent
    # in sort order, so the CLUSTERED layout holds them in O(1) files
    pairs = [
        (f"E100{2 * i + 1:03d}", f"E100{2 * i:03d}") for i in range(args.merges)
    ]

    def surgical(tag):
        late = spark.createDataFrame(pairs, "src string, dst string")
        m1 = merge_mapping(empty_map, late).localCheckpoint()
        changed = mapping_delta(empty_map, m1).localCheckpoint()
        changed.count()
        before = set(V.read_manifest(table)["files"])
        t0 = time.monotonic()
        _surgical_recanonicalize(spark, table, changed, f"m-{tag}")
        rec[f"{tag}_merge_sec"] = round(time.monotonic() - t0, 2)
        after = set(V.read_manifest(table)["files"])
        data_dir = os.path.join(table, "data")

        def mb(files):
            return round(
                sum(os.path.getsize(os.path.join(data_dir, f)) for f in files)
                / 1e6, 1,
            )

        rec[f"{tag}_files_total"] = len(before)
        rec[f"{tag}_files_rewritten"] = len(before - after)
        # at 100-TB scale the cost IS the rewritten bytes (write-bound):
        # record them next to the file counts
        rec[f"{tag}_mb_total"] = mb(before)
        rec[f"{tag}_mb_rewritten"] = mb(before - after)
        print(
            f"{tag}: {rec[f'{tag}_merge_sec']}s "
            f"{rec[f'{tag}_files_rewritten']}/{rec[f'{tag}_files_total']} files "
            f"{rec[f'{tag}_mb_rewritten']}/{rec[f'{tag}_mb_total']} MB",
            flush=True,
        )
        # undo so the next regime merges the same pairs on the same rows
        V.rollback(table, V.read_manifest(table)["parent"])

    # 3. decayed layout
    surgical("decayed")

    # 4. compaction
    t0 = time.monotonic()
    V.rewrite_data_files(spark, table, cluster_by=["subj"],
                         target_file_bytes=8 * 1024 * 1024)
    rec["compaction_sec"] = round(time.monotonic() - t0, 2)
    rec["files_after_compaction"] = len(V.read_manifest(table)["files"])
    print(
        f"compaction: {rec['compaction_sec']}s -> "
        f"{rec['files_after_compaction']} files",
        flush=True,
    )

    # 5. compacted layout
    surgical("compacted")

    rec["touch_fraction_decayed"] = round(
        rec["decayed_files_rewritten"] / rec["decayed_files_total"], 3
    )
    rec["touch_fraction_compacted"] = round(
        rec["compacted_files_rewritten"] / rec["compacted_files_total"], 3
    )
    rec["merge_speedup_after_compaction"] = round(
        rec["decayed_merge_sec"] / rec["compacted_merge_sec"], 2
    )

    with open(os.path.join(REPO, "BENCH", "compaction_probe.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
