"""End-to-end KG-construction pipeline with lineage, metrics, and
checkpoint resume.

Stage graph (north_rule):

    labels ──> gazetteer(aliases) ──┐
    docs ──> mentions ──> link ─────┼──> raw triples ──> canonicalize ──> triples
    labels ──> dissect + alias edges┘                                      ├─> adjacency
                                                                           └─> degrees

Every stage writes parquet under ``<out>/<stage>/``; a stage whose
output already exists (``_SUCCESS``) is skipped on resume — the Iceberg
snapshot-checkpoint analog in the sandbox (the reference's .bin snapshot
+ replay log, src/export.cpp:5-47, src/netbase.cpp:2521-2533).
Per-stage metrics (rows in/out, wall seconds, partitions) append to
``<out>/_metrics``; per-partition lineage rows to ``<out>/_lineage``.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netbase_spark.operators.canonicalize import (
    connected_components,
    rewrite_triples,
    sameas_edges,
)
from netbase_spark.operators.extraction import alias_instance_edges, dissect_triples
from netbase_spark.operators.gazetteer import alias_keys_local, build_alias_table
from netbase_spark.operators.linking import link_mentions
from netbase_spark.operators.materialize import adjacency, node_degrees, write_triples
from netbase_spark.operators.mentions import detect_mentions


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


class Pipeline:
    def __init__(self, spark: SparkSession, out_dir: str, resume: bool = True):
        self.spark = spark
        self.out = out_dir
        self.resume = resume
        self.metrics: list[dict] = []

    def _stage(self, name: str, build) -> DataFrame:
        """Run (or resume) a stage; record metrics + per-partition lineage."""
        path = os.path.join(self.out, name)
        t0 = time.time()
        if self.resume and _done(path):
            df = self.spark.read.parquet(path)
            self.metrics.append(
                {"stage": name, "resumed": True, "rows": df.count(), "secs": 0.0}
            )
            return df
        df = build()
        df.write.mode("overwrite").parquet(path)
        out_df = self.spark.read.parquet(path)
        rows = out_df.count()
        secs = time.time() - t0
        lineage = (
            out_df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("output_rows"))
            .withColumn("stage", F.lit(name))
        )
        lineage.write.mode("append").parquet(os.path.join(self.out, "_lineage"))
        self.metrics.append(
            {"stage": name, "resumed": False, "rows": rows, "secs": round(secs, 3)}
        )
        return out_df

    def run(
        self,
        docs: DataFrame,
        labels: DataFrame,
        blacklist: set[str],
        raw_triples: DataFrame | None = None,
        german: bool = False,
    ) -> DataFrame:
        """Full construction; returns the canonical triple table."""
        aliases = self._stage("aliases", lambda: build_alias_table(labels))

        # gazetteer names for the scan come from label/altLabel rows only
        # (SEO slugs are lookup aliases, not scan surface forms)
        scan_aliases = aliases.where(F.col("source") != "seo")
        alias_names = alias_keys_local(scan_aliases)

        mentions = self._stage(
            "mentions",
            lambda: detect_mentions(
                docs, alias_names, blacklist, german, distinct_per_doc=True
            ),
        )
        mention_triples = self._stage(
            "mention_triples",
            lambda: link_mentions(mentions, scan_aliases, already_distinct=True),
        )
        extract = self._stage(
            "extract_triples",
            lambda: dissect_triples(labels, german).unionByName(
                alias_instance_edges(labels)
            ),
        )

        def build_raw():
            raw = mention_triples.unionByName(extract)
            if raw_triples is not None:
                raw = raw.unionByName(raw_triples)
            return raw

        raw = self._stage("raw_triples", build_raw)

        mapping = self._stage(
            "canonical_map",
            lambda: connected_components(sameas_edges(raw)),
        )
        triples = self._stage("triples", lambda: rewrite_triples(raw, mapping))

        self._stage("adjacency", lambda: adjacency(triples))
        self._stage("degrees", lambda: node_degrees(triples))

        write_triples(triples, os.path.join(self.out, "triples_by_rel"))

        metrics_df = self.spark.createDataFrame(
            [
                (m["stage"], bool(m["resumed"]), int(m["rows"]), float(m["secs"]))
                for m in self.metrics
            ],
            "stage string, resumed boolean, rows long, secs double",
        )
        metrics_df.write.mode("append").parquet(os.path.join(self.out, "_metrics"))
        return triples
