"""Triple extraction: dissect pattern rules + alias-instance edges.

Reference: ``dissectWord``/``dissectParent`` extract (s,p,o) triples
from entity NAMES via ordered pattern rules (src/netbase.cpp:1010-1164,
939-992); ``add``/``getAbstract`` create the word->Instance->entity
edges (src/netbase.cpp:621-647).

Spark-first: rules run over DISTINCT (key, label) pairs only — the
distributed analog of the reference's ``dissected`` memo — inside
``mapInPandas`` (Arrow-batched; the rule pack is shared verbatim with
the oracle module so engine and contract cannot drift).  Output is
set-semantics triples; the reference's physical insert-order tricks are
replaced by the ``rule`` tag column (SURVEY.md §2.5 Mutation note).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from netbase_spark.normalize import norm_name_col

DISSECT_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("rel", T.IntegerType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("rule", T.StringType()),
    ]
)


def alias_instance_edges(labels: DataFrame) -> DataFrame:
    """(alias word, Instance, entity) for every label row — the
    getAbstract/add edge (src/netbase.cpp:641)."""
    from netbase_spark.relations import INSTANCE

    return (
        labels.select(
            norm_name_col(F.col("label")).alias("subj"),
            F.lit(INSTANCE).alias("rel"),
            F.col("key").alias("obj"),
            F.lit("alias").alias("rule"),
            F.lit(None).cast("string").alias("doc_id"),
        )
        .where((F.length("subj") > 0) & (F.col("subj") != F.col("obj")))
        .dropDuplicates(["subj", "rel", "obj"])
    )


def dissect_triples(labels: DataFrame, german: bool = False) -> DataFrame:
    """Rule-pack extraction over distinct primary labels.

    labels(key, label, label_type) -> triples(subj, rel, obj, rule, doc_id).
    """
    # one primary label per key (lexicographic min) — keeps the result
    # independent of row order; mirrors the oracle exactly
    distinct = (
        labels.where(F.col("label_type") == "label")
        .groupBy("key")
        .agg(F.min("label").alias("label"))
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from netbase_spark.oracle.rules import dissect_name

        for pdf in batches:
            subjs, rels, objs, rules = [], [], [], []
            memo: set[str] = set()
            for key, label in zip(pdf["key"], pdf["label"]):
                for s, p, o, rule in dissect_name(label, key, [], memo, german):
                    subjs.append(s)
                    rels.append(p)
                    objs.append(o)
                    rules.append(rule)
            yield pd.DataFrame(
                {
                    "subj": subjs,
                    "rel": pd.Series(rels, dtype="int32"),
                    "obj": objs,
                    "rule": rules,
                }
            )

    return (
        distinct.mapInPandas(run, schema=DISSECT_SCHEMA)
        # deterministic rule tag when several rules emit the same triple
        .groupBy("subj", "rel", "obj")
        .agg(F.min("rule").alias("rule"))
        .withColumn("doc_id", F.lit(None).cast("string"))
    )


def collect_instances(triples: DataFrame) -> DataFrame:
    """``collectInstances`` rebuild (src/init.cpp:504-524; console
    ``:ci``): re-derive the (abstract, Instance, node) edge for every
    node whose id is not its own abstract form (normalized name, any
    ``~ordinal`` allocation suffix cut) and upsert — the global
    abstract-hash rebuild, idempotent over an existing graph.  One
    distinct over the node set + the upsert's keyed shuffle; no
    driver-side pass."""
    from netbase_spark.operators.mutate import upsert_triples
    from netbase_spark.relations import INSTANCE

    nodes = (
        triples.select(F.col("subj").alias("node"))
        .unionByName(triples.select(F.col("obj").alias("node")))
        .distinct()
    )
    abstract = norm_name_col(F.regexp_replace(F.col("node"), r"~\d+$", ""))
    edges = nodes.select(
        abstract.alias("subj"),
        F.lit(INSTANCE).alias("rel"),
        F.col("node").alias("obj"),
        F.lit("collect").alias("rule"),
        F.lit(None).cast("string").alias("doc_id"),
    ).where((F.length("subj") > 0) & (F.col("subj") != F.col("obj")))
    cols = triples.columns
    return upsert_triples(triples, edges.select(*cols))
