#!/usr/bin/env python
"""Isolate the post-triples tail (adjacency, degrees) from kept pipeline
snapshots and time layout variants at one parallelism.

Usage: python scripts/probe_tail_stages.py --exp /tmp/kg_exp --cpus 16
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="/tmp/kg_exp")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--variants", default="a0,d0,d1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from netbase_spark.operators.materialize import adjacency, node_degrees
    from netbase_spark.session import get_spark

    spark = get_spark(app="probe_tail", cpus=args.cpus,
                      extra={"spark.ui.showConsoleProgress": "false"})

    triples = spark.read.parquet(os.path.join(args.exp, "triples"))
    adj_path = os.path.join(args.exp, "adjacency")

    def degrees_from_adjacency(adj):
        # each adjacency row is one (node, nbr) incidence, so degree ==
        # group-count over the node column alone: a column-pruned scan of
        # the already-written adjacency table, no triple re-scan/explode
        salted = adj.select("node").withColumn(
            "salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(32))
        )
        partial = salted.groupBy("node", "salt").agg(F.count(F.lit(1)).alias("c"))
        return partial.groupBy("node").agg(F.sum("c").alias("degree"))

    variants = {
        # current pipeline paths
        "a0": lambda p: adjacency(triples).write.mode("overwrite").parquet(p),
        "d0": lambda p: node_degrees(triples).write.mode("overwrite").parquet(p),
        # degrees from the adjacency snapshot (column-pruned, no explode)
        "d1": lambda p: degrees_from_adjacency(
            spark.read.parquet(adj_path)).write.mode("overwrite").parquet(p),
        # degrees without the salt stage (plain group-count w/ map combine)
        "d2": lambda p: spark.read.parquet(adj_path).groupBy("node").agg(
            F.count(F.lit(1)).alias("degree")).write.mode("overwrite").parquet(p),
        # adjacency written partitioned by dir (pruning for direction scans)
        "a1": lambda p: adjacency(triples).write.mode("overwrite")
            .partitionBy("dir").parquet(p),
    }

    # make sure an adjacency snapshot exists for d-variants
    if not os.path.exists(os.path.join(adj_path, "_SUCCESS")):
        variants["a0"](adj_path)

    out = {}
    for name in args.variants.split(","):
        path = f"/tmp/probe_tail_{name}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.monotonic()
        variants[name](path)
        secs = time.monotonic() - t0
        out[name] = {"secs": round(secs, 2)}
        print(json.dumps({name: out[name]}), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
