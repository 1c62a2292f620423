"""Tabular ingestion: wide-CSV melt, list import, 2-column facts —
the ``importCsv`` / ``importList`` / ``importFacts`` analogs.

Reference: ``importCsv`` turns the header row into predicates and each
cell into one (row-subject, column-predicate, typed-value) statement
(src/import.cpp:807-974); ``importList`` maps one name per line to
``(name, Type, type)`` (src/import.cpp:976-1001); ``importFacts`` reads
2-col TSV with a containment heuristic that picks the ``Member``
relation (src/import.cpp:1932-1980).

Spark-first: melt is a single ``stack()`` projection — no shuffle, no
UDF; typed values keep their column type in a struct payload instead of
the reference's union Value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netbase_spark.relations import MEMBER, TYPE


def melt(
    df: DataFrame,
    subject: Column,
    value_cols: list[str],
    included: list[str] | None = None,
    ignored: list[str] | None = None,
) -> DataFrame:
    """Wide -> long: one (subj, pred, obj_text, obj_num) row per cell.

    ``included``/``ignored`` mirror importCsv's field lists
    (src/import.cpp:826-827, 941-946) — column pruning happens here, so
    the parquet scan only reads the projected columns.
    """
    cols = [c for c in value_cols if included is None or c in included]
    cols = [c for c in cols if not ignored or c not in ignored]
    pairs = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    n = len(cols)
    stacked = df.select(
        subject.alias("subj"),
        F.stack(F.lit(n), *pairs).alias("pred", "obj_text"),
    )
    # typed literal: numeric cells also carry a double payload
    # (``value(vali, atof)``, src/import.cpp:949-952)
    return stacked.where(F.col("obj_text").isNotNull()).select(
        "subj",
        "pred",
        "obj_text",
        F.when(
            F.col("obj_text").rlike(r"^-?\d+(\.\d+)?$"),
            F.col("obj_text").cast("double"),
        ).alias("obj_num"),
    )


def import_list(names: DataFrame, type_key: str, col: str = "value") -> DataFrame:
    """One name per row -> (name, TYPE, type_key)."""
    return names.select(
        F.col(col).alias("subj"),
        F.lit(TYPE).alias("rel"),
        F.lit(type_key).alias("obj"),
    ).where(F.length("subj") > 0)


def import_facts(pairs: DataFrame, rel_id: int, s: str = "s", o: str = "o") -> DataFrame:
    """2-column facts; when the object name contains the subject name the
    relation flips to MEMBER (containment heuristic,
    src/import.cpp:1964-1967)."""
    return pairs.select(
        F.col(s).alias("subj"),
        F.when(F.col(o).contains(F.col(s)), F.lit(MEMBER))
        .otherwise(F.lit(rel_id))
        .alias("rel"),
        F.col(o).alias("obj"),
    )


def export_statement_names(
    triples: DataFrame, names: DataFrame, skip_rels: tuple[int, ...] = ()
) -> DataFrame:
    """``export_csv`` statement-names analog (src/export.cpp:50-88):
    join subject/object ids to display names, skipping Instance rows.
    The names dimension is broadcast — the triple side never shuffles."""
    n_s = F.broadcast(names.select(F.col("key").alias("subj"), F.col("name").alias("subj_name")))
    n_o = F.broadcast(names.select(F.col("key").alias("obj"), F.col("name").alias("obj_name")))
    t = triples
    if skip_rels:
        t = t.where(~F.col("rel").isin(*skip_rels))
    return (
        t.join(n_s, "subj", "left")
        .join(n_o, "obj", "left")
        .select(
            "subj",
            F.coalesce("subj_name", "subj").alias("subj_name"),
            "rel",
            "obj",
            F.coalesce("obj_name", "obj").alias("obj_name"),
        )
    )
