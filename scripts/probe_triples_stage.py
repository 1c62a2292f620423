#!/usr/bin/env python
"""Isolate the `triples` stage (rewrite + partitioned write) from kept
pipeline snapshots and time layout/dedup variants at one parallelism.

Usage: python scripts/probe_triples_stage.py --exp /tmp/kg_exp --cpus 16
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
    ap.add_argument("--variants", default="v0,v1,v2,v3,v4")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from netbase_spark.operators.canonicalize import rewrite_triples
    from netbase_spark.relations import SAMEAS_CLASS_RELS
    from netbase_spark.session import get_spark

    spark = get_spark(app="probe_triples", cpus=args.cpus,
                      extra={"spark.ui.showConsoleProgress": "false"})

    mt = spark.read.parquet(os.path.join(args.exp, "mention_triples"))
    ex = spark.read.parquet(os.path.join(args.exp, "extract_triples"))
    raw = mt.unionByName(ex)
    mapping = spark.read.parquet(os.path.join(args.exp, "canonical_map"))

    def rewrite_nodedup(t, m):
        m_s = F.broadcast(m.select(F.col("node").alias("subj"), F.col("rep").alias("s_rep")))
        m_o = F.broadcast(m.select(F.col("node").alias("obj"), F.col("rep").alias("o_rep")))
        return (
            t.where(~F.col("rel").isin(list(SAMEAS_CLASS_RELS)))
            .join(m_s, "subj", "left").join(m_o, "obj", "left")
            .select(F.coalesce("s_rep", "subj").alias("subj"), "rel",
                    F.coalesce("o_rep", "obj").alias("obj"), "rule", "doc_id")
            .where(F.col("subj") != F.col("obj"))
        )

    def direct_write(df, path):
        df.write.mode("overwrite").partitionBy("rel").parquet(path)

    def salted_write(df, path, buckets):
        salt = F.pmod(F.xxhash64("subj", "obj"), F.lit(buckets))
        df.repartition(F.col("rel"), salt).write.mode("overwrite").partitionBy(
            "rel").parquet(path)

    from netbase_spark.operators.materialize import write_triples as _pkg_write

    buckets = max(8, 2 * spark.sparkContext.defaultParallelism)
    variants = {
        # current pipeline path: dedup agg exchange + (rel,salt) exchange
        "v0": lambda p: salted_write(rewrite_triples(raw, mapping), p, buckets),
        # floor: no dedup, no exchange at all
        "v1": lambda p: direct_write(rewrite_nodedup(raw, mapping), p),
        # dedup agg exchange only, write straight from agg output
        "v2": lambda p: direct_write(rewrite_triples(raw, mapping), p),
        # explicit repartition on the dedup key, then dedup (no partial/final
        # split across an exchange), direct write
        "v3": lambda p: direct_write(
            rewrite_nodedup(raw, mapping)
            .repartition("subj", "rel", "obj")
            .dropDuplicates(["subj", "rel", "obj"]), p),
        # no dedup + (rel,salt) exchange: isolates the layout shuffle cost
        "v4": lambda p: salted_write(rewrite_nodedup(raw, mapping), p, buckets),
        # the package path as wired in the pipeline (rewrite_triples +
        # write_triples defaults)
        "v5": lambda p: _pkg_write(rewrite_triples(raw, mapping), p),
        # dedup path, plain parquet write (no partitionBy): isolates the
        # dynamic-partition writer's sort+multi-file overhead
        "v6": lambda p: rewrite_triples(raw, mapping).write.mode(
            "overwrite").parquet(p),
        # dedup path, noop sink: pure scan+join+exchange+agg compute
        "v7": lambda p: rewrite_triples(raw, mapping).write.mode(
            "overwrite").format("noop").save(),
        # no dedup, noop sink: pure scan+broadcast-join+filter compute
        "v8": lambda p: rewrite_nodedup(raw, mapping).write.mode(
            "overwrite").format("noop").save(),
    }

    out = {}
    for name in args.variants.split(","):
        path = f"/tmp/probe_triples_{name}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.monotonic()
        variants[name](path)
        secs = time.monotonic() - t0
        rows = (None if name in ("v7", "v8")
                else spark.read.parquet(path).count())
        out[name] = {"secs": round(secs, 2), "rows": rows}
        print(json.dumps({name: out[name]}), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
