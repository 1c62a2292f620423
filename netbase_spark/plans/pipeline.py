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

import glob
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


def _file_stats(path: str) -> list[tuple[int, int]]:
    """Per-output-partition (file_index, num_rows) from parquet FOOTERS —
    driver-side metadata only, no scan.  At 100 TB this is the only
    affordable way to record per-partition lineage: re-reading every
    stage snapshot just to count rows per partition would double the
    pipeline's I/O (and it measurably capped scaling efficiency in the
    sandbox — one full re-scan + shuffle per stage).  The recursive glob
    also covers hive-partitioned stage outputs (rel=*/part-*)."""
    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(path, "part-*.parquet"))
        or glob.glob(os.path.join(path, "*", "part-*.parquet"))
    )
    return [(i, pq.read_metadata(f).num_rows) for i, f in enumerate(files)]


class Pipeline:
    def __init__(self, spark: SparkSession, out_dir: str, resume: bool = True):
        self.spark = spark
        self.out = out_dir
        self.resume = resume
        self.metrics: list[dict] = []
        self._lineage: list[tuple[str, int, int]] = []

    def _stage(self, name: str, build, write=None) -> DataFrame:
        """Run (or resume) a stage; record metrics + per-partition lineage.
        Rows and lineage come from parquet footers (`_file_stats`), so a
        stage costs exactly one Spark job: its own write.  ``write``
        overrides the plain parquet snapshot (e.g. the rel-partitioned
        final layout) — resume re-reads whatever layout was written."""
        path = os.path.join(self.out, name)
        t0 = time.time()
        if self.resume and _done(path):
            rows = sum(n for _, n in _file_stats(path))
            self.metrics.append(
                {"stage": name, "resumed": True, "rows": rows, "secs": 0.0}
            )
            return self.spark.read.parquet(path)
        df = build()
        if write is not None:
            write(df, path)
        else:
            df.write.mode("overwrite").parquet(path)
        stats = _file_stats(path)
        secs = time.time() - t0
        self._lineage.extend((name, pid, n) for pid, n in stats)
        self.metrics.append(
            {
                "stage": name,
                "resumed": False,
                "rows": sum(n for _, n in stats),
                "secs": round(secs, 3),
            }
        )
        return self.spark.read.parquet(path)

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

        # raw = union of three already-snapshotted inputs.  NOT its own
        # snapshot stage: materializing the union is a byte-for-byte
        # copy of mention_triples + extract_triples (at 100 TB, a full
        # extra write+read of the whole triple set) and resume already
        # recovers it for free from the input stages' parquet.
        raw = mention_triples.unionByName(extract)
        if raw_triples is not None:
            raw = raw.unionByName(raw_triples)

        mapping = self._stage(
            "canonical_map",
            lambda: connected_components(sameas_edges(raw)),
        )
        # the canonical triple table is written ONCE, directly in its
        # final rel-partitioned layout (predicate pruning): a plain
        # snapshot followed by a separate partitioned copy was a second
        # full-table write+read that cannot scale with doc-side cores
        triples = self._stage(
            "triples",
            lambda: rewrite_triples(raw, mapping),
            write=write_triples,
        )

        self._stage("adjacency", lambda: adjacency(triples))
        self._stage("degrees", lambda: node_degrees(triples))

        self._flush_run_metadata()
        return triples

    def _flush_run_metadata(self) -> None:
        """Append this run's lineage + metrics as parquet, written
        driver-side with pyarrow (both tables are O(stages) rows — no
        reason to spin Spark jobs for them)."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        run_id = uuid.uuid4().hex[:12]
        if self._lineage:
            ldir = os.path.join(self.out, "_lineage")
            os.makedirs(ldir, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "stage": [s for s, _, _ in self._lineage],
                        "partition_id": pa.array(
                            [p for _, p, _ in self._lineage], pa.int32()
                        ),
                        "output_rows": pa.array(
                            [n for _, _, n in self._lineage], pa.int64()
                        ),
                    }
                ),
                os.path.join(ldir, f"part-{run_id}.parquet"),
            )
        mdir = os.path.join(self.out, "_metrics")
        os.makedirs(mdir, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "stage": [m["stage"] for m in self.metrics],
                    "resumed": pa.array(
                        [bool(m["resumed"]) for m in self.metrics], pa.bool_()
                    ),
                    "rows": pa.array([int(m["rows"]) for m in self.metrics], pa.int64()),
                    "secs": pa.array(
                        [float(m["secs"]) for m in self.metrics], pa.float64()
                    ),
                }
            ),
            os.path.join(mdir, f"part-{run_id}.parquet"),
        )
