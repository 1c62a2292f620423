#!/usr/bin/env python
"""Skewed-corpus scaling evidence (round-3 verdict item 3): the staged
spark-submit scaling measurement re-run on the SKEWED corpus twin — one
hub entity in ~30% of documents and one viral boilerplate sentence in
~30% (data/synth SKEW_* rates) — plus per-stage task-duration
histograms from the Spark event log proving no straggler partition.

The hub guards under test: the fused scan dedupes per doc (hub mentions
cost one row per doc, never a hot key explosion), the canonical rewrite
repartitions on the uniform (subj, rel, obj) key before dedup (hub
SUBJECTS spread across partitions), and degree/prior aggregations are
salted two-stage.  The reference's skew answer is a drop list
(filterWikiType, src/query.cpp:1632); ours must hold WITHOUT dropping.

Appends a "## Skewed-corpus scaling" section to BENCH/BASELINE.md
(idempotent, section-scoped) and writes BENCH/skew_scaling.json.

Usage: python scripts/bench_skew_scaling.py [--n 4] [--docs 3200000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def submit(cores: int, docs: int, evlog: str | None) -> dict:
    env = dict(os.environ)
    if evlog:
        shutil.rmtree(evlog, ignore_errors=True)
        env["EVLOG_DIR"] = evlog
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         os.path.join(REPO, "scripts", "submit_pipeline.sh"),
         str(cores), str(docs), "--corpus", "--no-oracle", "--warmup",
         "--skew"],
        capture_output=True, text=True, cwd=REPO, timeout=3600, env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"submit at {cores} cores failed (rc={out.returncode}); "
            f"stderr tail:\n{out.stderr[-4000:]}"
        )
    m = re.search(r"^\{.*\}", out.stdout, re.DOTALL | re.MULTILINE)
    if not m:
        raise RuntimeError(f"no JSON in submit stdout:\n{out.stdout[-2000:]}")
    return json.loads(m.group(0))


def stage_histograms(evlog: str, top_k: int = 6) -> list[dict]:
    """Per-stage task-duration stats for the top_k stages by total task
    time (from the event log): the straggler evidence.  max/p50 near 1
    == balanced partitions; a hub-skewed shuffle shows up as one task
    several times the median."""
    stage_names: dict[int, str] = {}
    tasks: dict[int, list[float]] = {}
    files = [
        f for f in glob.glob(os.path.join(evlog, "**", "*"), recursive=True)
        if os.path.isfile(f) and "events" in os.path.basename(f)
        and not f.endswith(".inprogress")
    ]
    for evfile in files:
        with open(evfile) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageSubmitted":
                    si = ev.get("Stage Info", {})
                    stage_names[si.get("Stage ID")] = si.get("Stage Name", "")
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info", {})
                    dur = (
                        ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                    ) / 1e3
                    tasks.setdefault(ev.get("Stage ID"), []).append(dur)
    out = []
    for sid, ds in sorted(
        tasks.items(), key=lambda kv: -sum(kv[1])
    )[:top_k]:
        ds = sorted(ds)
        n = len(ds)
        p50 = ds[n // 2]
        out.append({
            "stage": sid,
            "name": (stage_names.get(sid, "") or "")[:60],
            "tasks": n,
            "total_s": round(sum(ds), 1),
            "p50_s": round(p50, 2),
            "max_s": round(ds[-1], 2),
            "straggler_ratio": round(ds[-1] / p50, 2) if p50 > 0 else None,
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--docs", type=int, default=3200000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from netbase_spark.plans.synth_pipeline import materialize_corpus
    from netbase_spark.session import get_spark

    spark = get_spark(app="mat_skew_corpus", cpus=16,
                      extra={"spark.ui.showConsoleProgress": "false"})
    materialize_corpus(spark, args.docs, seed=42, partitions=256, skew=True)
    spark.stop()

    # interleaved N,4N,... (same host-weather rationale as
    # bench_submit_scaling.py); event log captured on every run, the
    # BEST run's histogram is reported
    lo_runs, hi_runs = [], []
    ev_lo, ev_hi = "/tmp/skew_evlog_lo", "/tmp/skew_evlog_hi"
    hist_lo = hist_hi = None
    for _ in range(args.repeats):
        r = submit(args.n, args.docs, ev_lo)
        if not lo_runs or r["sec"] < min(x["sec"] for x in lo_runs):
            hist_lo = stage_histograms(ev_lo)
        lo_runs.append(r)
        r = submit(args.n * 4, args.docs, ev_hi)
        if not hi_runs or r["sec"] < min(x["sec"] for x in hi_runs):
            hist_hi = stage_histograms(ev_hi)
        hi_runs.append(r)
    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / 4

    rec = {
        "n": args.n, "docs": args.docs, "skew": True,
        "tps_lo": lo["triples_per_sec"], "tps_hi": hi["triples_per_sec"],
        "sec_lo": lo["sec"], "sec_hi": hi["sec"],
        "scaling_efficiency": round(eff, 3),
        "all_sec": {"lo": [r["sec"] for r in lo_runs],
                    "hi": [r["sec"] for r in hi_runs]},
        "stage_histograms": {"lo": hist_lo, "hi": hist_hi},
    }
    with open(os.path.join(REPO, "BENCH", "skew_scaling.json"), "w") as fh:
        json.dump(rec, fh, indent=1)

    def hist_md(h):
        rows = "\n".join(
            f"| {s['stage']} | {s['name']} | {s['tasks']} | {s['total_s']} "
            f"| {s['p50_s']} | {s['max_s']} | {s['straggler_ratio']} |"
            for s in h
        )
        return (
            "| stage | name | tasks | total s | p50 s | max s | max/p50 |\n"
            "|---|---|---|---|---|---|---|\n" + rows
        )

    md = f"""

## Skewed-corpus scaling (spark-submit, hub + boilerplate stress)

Same staged spark-submit measurement as the section above, on the
SKEWED corpus twin (`--skew`): one hub entity appears in ~30% of the
{args.docs} documents and one viral boilerplate sentence in ~30%
(data/synth SKEW_HUB_RATE / SKEW_BOILERPLATE_RATE), so one mention
subject and one sentence's aliases dominate the scan output — the
Q5/owl:Thing shape the north rule names.  No drop list is used (the
reference drops hub types instead: filterWikiType,
src/query.cpp:1632); the guards are per-doc scan dedup, the uniform
(subj, rel, obj) repartition before canonical dedup, and salted
two-stage aggregation.

| parallelism | docs | triples | seconds | triples/sec |
|---|---|---|---|---|
| local[{args.n}] (N) | {args.docs} | {lo["triples"]} | {lo["sec"]} | {lo["triples_per_sec"]} |
| local[{args.n * 4}] (4N) | {args.docs} | {hi["triples"]} | {hi["sec"]} | {hi["triples_per_sec"]} |

**Scaling efficiency (skewed corpus)** = (tps@4N / tps@N) / 4 =
**{eff:.3f}** (target >= 0.8).  Best of {args.repeats} interleaved
submissions per config; all wall seconds:
N={[r["sec"] for r in lo_runs]}, 4N={[r["sec"] for r in hi_runs]}.

Per-stage task-duration histograms (best run, top stages by total task
time, from the Spark event log) — max/p50 near 1 means no straggler
partition despite the hub:

N={args.n}:

{hist_md(hist_lo)}

4N={args.n * 4}:

{hist_md(hist_hi)}
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    base = open(path).read() if os.path.exists(path) else "# BENCH/BASELINE\n"
    cut = base.find("\n## Skewed-corpus scaling")
    if cut != -1:
        nxt = base.find("\n## ", cut + 1)
        tail = base[nxt:] if nxt != -1 else ""
        # in-place splice: the refreshed section keeps its position,
        # later sections keep theirs
        out_text = base[:cut].rstrip("\n") + md + tail
    else:
        out_text = base.rstrip("\n") + md
    with open(path, "w") as f:
        f.write(out_text)
    print(json.dumps({k: rec[k] for k in
                      ("scaling_efficiency", "tps_lo", "tps_hi", "all_sec")}))


if __name__ == "__main__":
    main()
