#!/usr/bin/env python
"""Query-side scale evidence (round-5 ask #2): the construction path
has 0.8-1.0 N->4N efficiency proofs at 3.2M docs; this probe gives the
BGP/path/closure query family the same treatment on a >=100M-edge
synthetic taxonomy with hub skew (the reference's own hub problem —
filterWikiType's ~100-entry DROP list, src/query.cpp:1632-1734, exists
because Wikimedia-category hubs blow up its BFS).

Synthetic graph (deterministic, generated once to /tmp, 64 files):

- class taxonomy: ``C`` classes, parent(i) = i div 10 -> a fan-out-10
  DAG of depth log10(C) (10M classes = 10M SubClass edges, depth 7);
- instances: ``I`` TYPE edges; 30% land on ONE hub class (the
  Q5/owl:Thing analog), the rest hash-uniform over all classes.

Queries, each timed at local[N] and local[4N] (separate taskset-pinned
subprocesses, interleaved best-of-K — the host has multi-minute weather
modes):

- ``closure``  — path_closure(SubClass+, max_hops=8, distributed
  frontier loop) over the 10M-edge class DAG: the taxonomy closure is
  dimension-sized by design (instances join it, they don't enter it —
  that is how isa_closure is used in the engine);
- ``bgp``      — bgp_match (?x TYPE ?c)(?c SubClass ?p) with
  rel_stats: a 90M x 10M join whose build side carries the hub key
  (AQE skew-join splits it);
- ``subtree``  — instances under a subtree: closure filtered to a
  mid-level root, semi-joined against all 90M TYPE edges — the
  all_instances2/3 shape at corpus scale, hub class included.

Writes BENCH/query_scaling.json.

Usage: python scripts/probe_query_scaling.py [--n 8] [--classes 10000000]
       [--instances 90000000] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TYPE_REL = 1
SUBCLASS_REL = 2
HUB_CLASS = 1_234_5
HUB_PCT = 30


def table_dir(classes: int, instances: int) -> str:
    return f"/tmp/probe_query_scaling_{classes}_{instances}"


def generate(spark, classes: int, instances: int) -> str:
    from pyspark.sql import functions as F

    d = table_dir(classes, instances)
    if os.path.exists(os.path.join(d, "_SUCCESS")):
        return d
    sub = (
        spark.range(10, classes)
        .select(
            F.col("id").alias("subj"),
            F.lit(SUBCLASS_REL).alias("rel"),
            (F.col("id") / 10).cast("long").alias("obj"),
        )
    )
    cls = F.when(
        F.pmod(F.xxhash64("id"), F.lit(100)) < HUB_PCT, F.lit(HUB_CLASS)
    ).otherwise(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(classes)))
    inst = spark.range(instances).select(
        (F.col("id") + 10_000_000_000).alias("subj"),
        F.lit(TYPE_REL).alias("rel"),
        cls.cast("long").alias("obj"),
    )
    sub.unionByName(inst).repartition(64).write.mode("overwrite").parquet(d)
    return d


def run_queries(spark, d: str, which: list[str]) -> dict:
    from pyspark.sql import functions as F

    from netbase_spark.operators.graph_query import (
        Path, bgp_match, path_closure, rel_counts,
    )

    triples = spark.read.parquet(d)
    out = {}

    def timed(name, fn):
        t0 = time.monotonic()
        n = fn()
        out[name] = {"secs": round(time.monotonic() - t0, 2), "rows": n}
        print(f"{name}: {out[name]}", flush=True)

    if "closure" in which:
        timed(
            "closure",
            lambda: path_closure(
                triples.where(F.col("rel") == SUBCLASS_REL),
                Path(SUBCLASS_REL, "+", max_hops=8),
                driver_threshold=0,
            ).count(),
        )
    if "bgp" in which:
        stats = rel_counts(triples)
        timed(
            "bgp",
            lambda: bgp_match(
                triples,
                [("?x", TYPE_REL, "?c"), ("?c", SUBCLASS_REL, "?p")],
                distinct=False,
                rel_stats=stats,
            ).count(),
        )
    if "shuffle_floor" in which:
        # calibration, not an engine operator: ONE plain full-table
        # groupBy over all 100M rows.  On a single host, 8 -> 32
        # threads share one memory subsystem, so shuffle/sort-bound
        # work has a hardware scaling ceiling that a real N -> 4N
        # EXECUTOR cluster (4x memory channels, 4x disks) does not.
        # The closure numbers should be read against this floor.
        timed(
            "shuffle_floor",
            lambda: triples.groupBy("subj")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1000)
            .count(),
        )
    if "subtree" in which:
        # all instances under a depth-2 subtree containing the hub:
        # closure (dimension-sized) filtered to the root, broadcast
        # against the 90M instance edges
        root = HUB_CLASS // 100
        def _subtree():
            cl = path_closure(
                triples.where(F.col("rel") == SUBCLASS_REL),
                Path(SUBCLASS_REL, "+", max_hops=8),
                driver_threshold=0,
            )
            under = (
                cl.where(F.col("obj") == root)
                .select(F.col("subj").alias("c"))
                .unionByName(
                    spark.createDataFrame([(root,)], "c long")
                )
            )
            return (
                triples.where(F.col("rel") == TYPE_REL)
                .join(F.broadcast(under), F.col("obj") == F.col("c"), "left_semi")
                .count()
            )
        timed("subtree", _subtree)
    return out


def worker(args) -> None:
    from netbase_spark.session import get_spark

    spark = get_spark(
        app=f"probe_query_scaling_{args.cpus}",
        cpus=args.cpus,
        shuffle_partitions=max(32, args.cpus * 2),
        driver_memory="48g",
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    d = generate(spark, args.classes, args.instances)
    res = run_queries(spark, d, args.queries.split(","))
    print("RESULT " + json.dumps(res), flush=True)


def run_at(cpus: int, args) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
         os.path.abspath(__file__), "--worker", "--cpus", str(cpus),
         "--classes", str(args.classes), "--instances", str(args.instances),
         "--queries", args.queries],
        capture_output=True, text=True, cwd=REPO, timeout=5400,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"worker at {cpus} cores failed (rc={out.returncode}); "
            f"stderr tail:\n{out.stderr[-3000:]}"
        )
    return json.loads(lines[-1][len("RESULT "):])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--classes", type=int, default=10_000_000)
    ap.add_argument("--instances", type=int, default=90_000_000)
    ap.add_argument("--queries", default="closure,bgp,subtree,shuffle_floor")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    if args.worker:
        worker(args)
        return

    # pre-generate once with a full-width session so both workers read
    # the identical table
    from netbase_spark.session import get_spark

    spark = get_spark(
        app="probe_query_scaling_gen", cpus=32, shuffle_partitions=64,
        driver_memory="48g", extra={"spark.ui.showConsoleProgress": "false"},
    )
    d = generate(spark, args.classes, args.instances)
    n_edges = spark.read.parquet(d).count()
    spark.stop()

    lo_runs, hi_runs = [], []
    for _ in range(args.repeats):
        lo_runs.append(run_at(args.n, args))
        hi_runs.append(run_at(args.n * 4, args))

    rec = {
        "edges_total": n_edges,
        "classes": args.classes,
        "instances": args.instances,
        "hub_pct": HUB_PCT,
        "n": args.n,
        "queries": {},
    }
    names = args.queries.split(",")
    effs = []
    for q in names:
        lo = min(r[q]["secs"] for r in lo_runs)
        hi = min(r[q]["secs"] for r in hi_runs)
        rows = lo_runs[0][q]["rows"]
        eff = (lo / hi) / 4 if hi else 0.0
        effs.append(eff)
        rec["queries"][q] = {
            "rows": rows,
            f"sec_local{args.n}": lo,
            f"sec_local{args.n * 4}": hi,
            "scaling_efficiency": round(eff, 3),
        }
        print(f"{q}: local[{args.n}]={lo}s local[{args.n*4}]={hi}s eff={eff:.3f}",
              flush=True)
    rec["min_scaling_efficiency"] = round(min(effs), 3)

    with open(os.path.join(REPO, "BENCH", "query_scaling.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
