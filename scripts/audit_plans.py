#!/usr/bin/env python
"""Physical-plan audit: dump `.explain(formatted)` for every contract
query at sf0.01 and grade each plan on the scale checklist:

- scan pruning: ReadSchema narrower than the full table schema
- filter pushdown: PushedFilters non-empty where the query filters a scan
- broadcast joins for dimension-sized sides (no SortMergeJoin of a
  broadcastable side)
- WholeStageCodegen coverage (JVM-side expression eval)
- no single-partition global Window / Exchange SinglePartition except in
  intentional top-k (TakeOrderedAndProject is the GOOD form)
- codegen actually COMPILES: each query is also executed once with
  `spark.sql.codegen.fallback=false`, so a Janino compile failure that
  production Spark hides behind a silent interpreted fallback (the
  pushed-down YAGO keep-filter was one: 47 KB plan text — under the
  plan-size guard — yet uncompilable) fails the audit loudly instead.
  Skip with --no-exec for a fast plan-text-only pass.

Writes PLANS.md.  Run: python scripts/audit_plans.py
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def grade(plan: str) -> list[str]:
    notes = []
    if "PushedFilters: [" in plan:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        nonempty = [p for p in pushed if p.strip()]
        if nonempty:
            notes.append(f"pushdown: {len(nonempty)} scan(s) with pushed filters")
    if "BroadcastHashJoin" in plan:
        notes.append(f"broadcast joins: {plan.count('BroadcastHashJoin')}")
    if "SortMergeJoin" in plan:
        notes.append(f"sort-merge joins: {plan.count('SortMergeJoin')}")
    if "TakeOrderedAndProject" in plan:
        notes.append("top-k via TakeOrderedAndProject (no global sort)")
    # expression-inlining blowup guard: CollapseProject + filter
    # pushdown inline staged projections; past ~100 KB of plan text
    # codegen gives up and evaluation goes interpreted (the YAGO parse
    # hit 2.1 MB / 25-48 s before split_part+folded-map leaves fixed it)
    if len(plan) > 100_000:
        notes.append(f"WARN plan-size: {len(plan)//1000} KB plan text")
    n_wsc = plan.count("WholeStageCodegen")
    if n_wsc:
        notes.append(f"codegen spans: {n_wsc}")
    if "Exchange SinglePartition" in plan and "TakeOrderedAndProject" not in plan:
        notes.append("WARNING: Exchange SinglePartition present")
    if re.search(r"Window.*\n.*Sort", plan) and "partitionBy" not in plan:
        pass  # formatted plans don't show partitionBy; single-partition case caught above
    if "InMemoryTableScan" in plan:
        notes.append("reads persisted intermediate (iterative operator)")
    return notes


def main():
    import __spark_entry__ as em
    from netbase_spark.session import get_spark

    exec_check = "--no-exec" not in sys.argv
    spark = get_spark(
        app="plan_audit",
        cpus=8,
        # strict mode: a whole-stage codegen compile failure raises
        # instead of silently running the stage interpreted
        extra={"spark.sql.codegen.fallback": "false"} if exec_check else {},
    )
    qs = em.queries()

    out = [
        "# PLANS — physical-plan audit of every contract query",
        "",
        f"`explain(formatted)` at `{SF_DIR}`, graded for: parquet filter/schema",
        "pushdown, broadcast-vs-shuffle joins, WholeStageCodegen coverage, and",
        "absence of accidental single-partition stages.  Regenerate with",
        "`python scripts/audit_plans.py`.",
        "",
    ]
    warnings = 0
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, SF_DIR)
            plan = plan_text(df)
        except Exception as e:  # noqa: BLE001
            out += [f"## {name}", "", f"ERROR building plan: {e}", ""]
            continue
        notes = grade(plan)
        if exec_check:
            try:
                df.write.format("noop").mode("overwrite").save()
                # iterative operators leave their last round persisted;
                # free it so queries audit independently
                spark.catalog.clearCache()
                for rdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    rdd.unpersist()
            except Exception as e:  # noqa: BLE001
                first = str(e).splitlines()[0][:200]
                notes.append(f"WARNING codegen/exec (fallback=false): {first}")
        warnings += sum(1 for n in notes if n.startswith("WARNING"))
        out.append(f"## {name}")
        out.append("")
        for n in notes:
            out.append(f"- {n}")
        out.append("")
        out.append("```")
        # keep the audit readable: plan body capped per query
        lines = plan.rstrip().splitlines()
        out.extend(lines[:120])
        if len(lines) > 120:
            out.append(f"... ({len(lines) - 120} more lines)")
        out.append("```")
        out.append("")
        print(f"[audit] {name}: {'; '.join(notes) or 'no notes'}", file=sys.stderr)

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({warnings} warnings)", file=sys.stderr)


if __name__ == "__main__":
    main()
