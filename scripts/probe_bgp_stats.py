#!/usr/bin/env python
"""Stats-driven BGP ordering evidence (round-5 ask #4): on an
adversarial pattern set where every pattern has the same variable count
(the static constant-count heuristic ties and keeps user order), the
static plan joins two huge rel partitions first — a fan-out shuffle join
— while the rel_stats plan starts from the tiny rel and keeps every
intermediate broadcast-sized.  Same results, very different cost.

Query shape (all three patterns are 2-var ties for the static order):

    ?x BIG  ?y .    (N rows, fan-out on ?y)
    ?y BIG2 ?z .    (N rows, fan-out on ?y)
    ?y TINY ?w .    (1k rows)

static:  BIG JOIN BIG2 on ?y  ->  |y| * fanout^2 intermediate rows
stats:   TINY first, then BIG, then BIG2 -> intermediates ~ |TINY| * fanout

Writes BENCH/bgp_stats_probe.json.

Usage: python scripts/probe_bgp_stats.py [--rows 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BIG, BIG2, TINY = 1, 2, 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--distinct-y", type=int, default=200_000)
    ap.add_argument("--tiny", type=int, default=1_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from netbase_spark.operators.graph_query import (
        _ordered_indices, bgp_match, rel_counts,
    )
    from netbase_spark.session import get_spark

    spark = get_spark(
        app="probe_bgp_stats",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
        shuffle_partitions=32,
        driver_memory="24g",
        extra={"spark.ui.showConsoleProgress": "false"},
    )

    ys = F.concat(
        F.lit("y"), F.pmod(F.xxhash64("id"), F.lit(args.distinct_y)).cast("string")
    )
    big = spark.range(args.rows).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("subj"),
        F.lit(BIG).alias("rel"),
        ys.alias("obj"),
    )
    big2 = spark.range(args.rows).select(
        ys.alias("subj"),
        F.lit(BIG2).alias("rel"),
        F.concat(F.lit("z"), F.col("id").cast("string")).alias("obj"),
    )
    tiny = spark.range(args.tiny).select(
        F.concat(F.lit("y"), F.col("id").cast("string")).alias("subj"),
        F.lit(TINY).alias("rel"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("obj"),
    )
    table_dir = f"/tmp/probe_bgp_stats_table_{args.rows}"
    if not os.path.exists(os.path.join(table_dir, "_SUCCESS")):
        big.unionByName(big2).unionByName(tiny).repartition(32).write.mode(
            "overwrite"
        ).parquet(table_dir)
    triples = spark.read.parquet(table_dir)

    pats = [("?x", BIG, "?y"), ("?y", BIG2, "?z"), ("?y", TINY, "?w")]
    stats = rel_counts(triples)
    rec = {
        "rows_per_big_rel": args.rows,
        "distinct_y": args.distinct_y,
        "tiny_rows": args.tiny,
        "static_order": _ordered_indices(pats, None),
        "stats_order": _ordered_indices(pats, stats),
    }

    def timed(name, **kw):
        best, n = None, None
        for _ in range(3):
            t0 = time.monotonic()
            n = bgp_match(triples, pats, **kw).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        rec[name + "_sec"] = round(best, 2)
        rec[name + "_rows"] = n
        print(f"{name}: {best:.2f}s rows={n}", flush=True)
        return n

    n1 = timed("static")
    n2 = timed("stats", rel_stats=stats)
    assert n1 == n2, "ordering must not change results"
    rec["speedup"] = round(rec["static_sec"] / rec["stats_sec"], 2)

    with open(os.path.join(REPO, "BENCH", "bgp_stats_probe.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
