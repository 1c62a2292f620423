"""WikiData staged import orchestration — the ``importWikiData`` analog.

Reference (src/import.cpp:2502-2540): a fixed stage order — property
labels first, primary-language terms, THEN alt labels ("don't mess with
abstracts before"), then the taxonomy / instances / simple-statements
N3 dumps, and finally the secondary-language terms as FILL-UP-MISSING
only ("Not before, otherwise would get useless statements").  The
reference also reserves the first half of the node-id space for Q-ids
(``context->lastNode = maxNodes/2``, src/import.cpp:2512) so wikidata
ids stay dense and stable.

Spark-first: each stage is a DataFrame over ``parse_nt_lines``; the
fill-up-missing rule is one anti-join on the entity key; stage order
becomes row provenance (``rule``), not mutation order — our storage is
set-semantics, so "don't touch abstracts yet" is simply which label
row wins the alias-table window later.  The id-space reservation is
structural: the Q-id STRING is the node id (deterministic, collision-
free), so no numeric range needs reserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netbase_spark.relations import LABEL
from netbase_spark.sources.n3 import parse_nt_lines

_LABEL_PREDS = ("label", "prefLabel")
_ALT_PREDS = ("altLabel",)


def parse_wiki_labels(lines: DataFrame, alt: bool = False) -> DataFrame:
    """``importWikiLabels`` (src/import.cpp:1313-1435): NT label lines ->
    (key, label).  ``alt=True`` selects the skos altLabel rows (the
    third positional flag of the reference's importWikiLabels)."""
    preds = _ALT_PREDS if alt else _LABEL_PREDS
    return (
        parse_nt_lines(lines)
        .where(F.col("pred").isin(*preds))
        .select(F.col("subj").alias("key"), F.col("obj").alias("label"))
        .where(F.col("key").rlike("^[QP][0-9]+$"))
        .dropDuplicates(["key", "label"])
    )


def fill_up_missing(primary: DataFrame, secondary: DataFrame) -> DataFrame:
    """The reference's fill-up rule (importWikiLabels(file, false):
    "fill up missing ONLY", src/import.cpp:2524,2536): a secondary-
    language label is taken only for keys with NO primary label.
    One broadcast-able anti-join."""
    return secondary.join(
        primary.select("key").distinct(), "key", "left_anti"
    )


def import_wikidata(
    properties_lines: DataFrame,
    terms_primary_lines: DataFrame,
    terms_fillup_lines: DataFrame,
    alt_lines: DataFrame,
    taxonomy_lines: DataFrame,
    instances_lines: DataFrame,
    statements_lines: DataFrame,
) -> DataFrame:
    """Full staged orchestration (src/import.cpp:2502-2540) -> one
    triple table (subj, rel, obj, rule), rule = stage provenance:

    1. property labels (P-ids)          rule='property'
    2. primary-language terms           rule='term_primary'
    3. secondary terms, missing only    rule='term_fillup'
    4. alt labels (after the terms)     rule='term_alt'
    5. taxonomy NT (P279 -> SuperClass) rule='taxonomy'
    6. instances NT (P31 -> Type)       rule='instances'
    7. simple statements NT             rule='statements'

    Labels become (key, Label, text) rows feeding the alias-table
    stage; the N3 stages resolve predicates through the canonical
    registry (``canonicalize_predicates``).
    """
    from netbase_spark.relations import PREDICATE_CANON
    from netbase_spark.sources.n3 import canonicalize_predicates

    def label_rows(df: DataFrame, rule: str) -> DataFrame:
        return df.select(
            F.col("key").alias("subj"),
            F.lit(LABEL).alias("rel"),
            F.col("label").alias("obj"),
            F.lit(rule).alias("rule"),
        )

    props = parse_wiki_labels(properties_lines)
    primary = parse_wiki_labels(terms_primary_lines)
    fillup = fill_up_missing(primary, parse_wiki_labels(terms_fillup_lines))
    alts = parse_wiki_labels(alt_lines, alt=True)

    def nt_rows(lines: DataFrame, rule: str) -> DataFrame:
        mapping = {k: v for k, v in PREDICATE_CANON.items()}
        t = canonicalize_predicates(
            parse_nt_lines(lines).withColumn("pred", F.lower(F.col("pred"))),
            mapping,
        )
        return t.select("subj", "rel", "obj", F.lit(rule).alias("rule"))

    out = (
        label_rows(props, "property")
        .unionByName(label_rows(primary, "term_primary"))
        .unionByName(label_rows(fillup, "term_fillup"))
        .unionByName(label_rows(alts, "term_alt"))
        .unionByName(nt_rows(taxonomy_lines, "taxonomy"))
        .unionByName(nt_rows(instances_lines, "instances"))
        .unionByName(nt_rows(statements_lines, "statements"))
    )
    return out.dropDuplicates(["subj", "rel", "obj", "rule"])
