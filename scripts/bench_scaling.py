#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule): run the SAME
construction job at local[N] and local[4N] in separate processes
(Spark master is fixed per JVM), report throughput at both plus
scaling efficiency, and write BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [--n 8] [--docs 40000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--pipeline-only", "--cpus", str(cpus), "--docs", str(docs)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--docs", type=int, default=40000)
    args = ap.parse_args()

    lo = run_at(args.n, args.docs)
    hi = run_at(args.n * 4, args.docs)
    tps_lo = lo["pipeline"]["triples_per_sec"]
    tps_hi = hi["pipeline"]["triples_per_sec"]
    eff = (tps_hi / tps_lo) / 4 if tps_lo else 0.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — measured scaling evidence

Same KG-construction job (synthetic interleaved corpus, {args.docs} docs,
seed 42) at two parallelism levels — `local[{args.n}]` standing in for N
executors and `local[{args.n * 4}]` for 4N (per driver instruction; no real
cluster in this sandbox).

| parallelism | docs | triples | seconds | triples/sec |
|---|---|---|---|---|
| local[{args.n}] (N) | {args.docs} | {lo["pipeline"]["triples"]} | {lo["pipeline"]["sec"]} | {tps_lo} |
| local[{args.n * 4}] (4N) | {args.docs} | {hi["pipeline"]["triples"]} | {hi["pipeline"]["sec"]} | {tps_hi} |

**Scaling efficiency** = (tps@4N / tps@N) / 4 = **{eff:.3f}** (target >= 0.8).

Notes: throughput excludes Spark session startup; the doc side never
shuffles (mapInPandas scan over doc partitions with broadcast gazetteer);
the fixed-cost tail is the union-find driver loop on the (small)
sameAs-edge set, which amortizes as docs grow.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({
        "n": args.n, "docs": args.docs,
        "tps_lo": tps_lo, "tps_hi": tps_hi,
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
