#!/usr/bin/env python
"""Drive the full KG-construction pipeline end-to-end on the synthetic
interleaved corpus: stage metrics, lineage, resume, and P/R vs the
reference-rule oracle.

Usage: python scripts/run_pipeline.py [--docs 200] [--out DIR] [--resume]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from netbase_spark.data.fixtures import (
        blacklist_fixture,
        labels_fixture,
        raw_synonym_edges,
        synonym_pairs,
    )
    from netbase_spark.data.synth import docs_df, docs_local
    from netbase_spark.oracle.rules import oracle_triples
    from netbase_spark.plans.pipeline import Pipeline
    from netbase_spark.schemas import LABELS_SCHEMA
    from netbase_spark.session import get_spark

    out = args.out or tempfile.mkdtemp(prefix="kg_out_")
    spark = get_spark(app="run_pipeline", cpus=args.cpus,
                      extra={"spark.ui.showConsoleProgress": "false"})

    labels = labels_fixture()
    labels_df = spark.createDataFrame(
        [(r["key"], r["label"], r["label_type"], r["lang"]) for r in labels],
        LABELS_SCHEMA,
    )
    syn_df = spark.createDataFrame(
        [(s, r, o, "raw", None) for s, r, o in raw_synonym_edges()],
        "subj string, rel int, obj string, rule string, doc_id string",
    )
    docs = docs_df(spark, args.docs, seed=42, partitions=args.cpus)

    pipe = Pipeline(spark, out, resume=True)
    triples = pipe.run(docs, labels_df, blacklist_fixture(), raw_triples=syn_df)
    got = {(r.subj, r.rel, r.obj) for r in triples.collect()}

    expected = oracle_triples(
        labels, docs_local(args.docs, seed=42), blacklist_fixture(), synonym_pairs()
    )
    tp = len(got & expected)
    p = tp / len(got) if got else 0.0
    r = tp / len(expected) if expected else 0.0

    print(json.dumps({
        "out": out,
        "stages": pipe.metrics,
        "triples": len(got),
        "oracle_triples": len(expected),
        "precision": round(p, 4),
        "recall": round(r, 4),
        "pr_gate": bool(p >= 0.95 and r >= 0.95),
    }, indent=2))

    if not args.keep and args.out is None:
        shutil.rmtree(out, ignore_errors=True)
    if not (p >= 0.95 and r >= 0.95):
        sys.exit(1)


if __name__ == "__main__":
    main()
