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

from netbase_spark.relations import KIND_ABSTRACT, LABEL
from netbase_spark.sources.n3 import parse_nt_lines

_LABEL_PREDS = ("label", "prefLabel")
_ALT_PREDS = ("altLabel",)
_DESC_PREDS = ("description",)


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
    stages = [
        ("property", properties_lines),
        ("term_primary", terms_primary_lines),
        ("term_fillup", terms_fillup_lines),
        ("term_alt", alt_lines),
        ("taxonomy", taxonomy_lines),
        ("instances", instances_lines),
        ("statements", statements_lines),
    ]
    return import_wikidata_tagged(tag_stage_lines(stages))


def tag_stage_lines(stages: list[tuple[str, DataFrame]]) -> DataFrame:
    """Union per-stage line tables into ONE tagged (value, rule) table.
    Tagging the RAW lines before one shared parse keeps the
    resolve_term expression tree out of every stage branch (seven
    copies once inflated the wikidata plan to 199 KB — the YAGO
    importer's blowup class, PLANS.md guard)."""
    tagged = None
    for rule, df in stages:
        t = df.select(F.col("value"), F.lit(rule).alias("rule"))
        tagged = t if tagged is None else tagged.unionByName(t)
    return tagged


def import_wikidata_tagged(tagged: DataFrame) -> DataFrame:
    """Same orchestration over ONE pre-tagged line table (value, rule)
    — the shape a cluster job gets by tagging each dump file's lines
    with its stage (e.g. from ``input_file_name()``).  The parse tree
    appears once per CONSUMER branch (labels, NT statements — two),
    not once per stage (seven); each branch's rule filter prunes to
    its stage's files when the tagged table is partitioned by rule,
    and a deployment that wants exactly one physical scan snapshots
    the parsed relation as a pipeline stage first."""
    from pyspark.sql import Window

    from netbase_spark.relations import PREDICATE_CANON
    from netbase_spark.sources.n3 import canonicalize_predicates

    parsed = parse_nt_lines(tagged, keep=("rule",))

    label_stages = ("property", "term_primary", "term_fillup", "term_alt")
    labels = (
        parsed.where(F.col("rule").isin(*label_stages))
        .where(
            ((F.col("rule") == "term_alt") & F.col("pred").isin(*_ALT_PREDS))
            | ((F.col("rule") != "term_alt") & F.col("pred").isin(*_LABEL_PREDS))
        )
        .select("rule", F.col("subj").alias("key"), F.col("obj").alias("label"))
        .where(F.col("key").rlike("^[QP][0-9]+$"))
        .dropDuplicates(["rule", "key", "label"])
    )
    # fill-up-missing as one per-key window instead of an anti-join, so
    # the labels branch is consumed ONCE (no second scan of the dumps
    # just to list labeled keys).  A key is "already labeled" when ANY
    # earlier stage named it — primary OR alt: the reference's fill-up
    # skip tests ``node->name`` (src/import.cpp:1346), which the alt
    # stage also sets, and fill-up runs AFTER the alt labels ("Not
    # before, otherwise would get useless statements", 2534-2537)
    has_label = F.max((F.col("rule") != "term_fillup").cast("int")).over(
        Window.partitionBy("key")
    )
    label_out = labels.withColumn("_hp", has_label).where(
        (F.col("rule") != "term_fillup") | (F.col("_hp") == 0)
    )
    label_rows = label_out.select(
        F.col("key").alias("subj"),
        F.lit(LABEL).alias("rel"),
        F.col("label").alias("obj"),
        "rule",
    )

    # description lines inside the term dumps (src/import.cpp:1365-1389):
    # a description starting with "Wikimedia" (disambiguation / category /
    # list pages) demotes the Q-node to the _abstract kind in ANY run —
    # it is a word, not a linkable entity; other descriptions are stored
    # as node text, and only during the alt-labels run (the
    # ``if(!altLabels)continue`` gate, 1377).  Descriptions never count
    # as labels, so the fill-up window above is untouched.
    from netbase_spark.operators.mutate import rel_id_for

    descs = (
        parsed.where(F.col("rule").isin("term_primary", "term_fillup", "term_alt"))
        .where(F.col("pred").isin(*_DESC_PREDS))
        .select("rule", F.col("subj").alias("key"), F.col("obj").alias("text"))
        .where(F.col("key").rlike("^[QP][0-9]+$"))
    )
    is_wikimedia = F.col("text").startswith("Wikimedia")
    demote_rows = descs.where(is_wikimedia).select(
        F.col("key").alias("subj"),
        F.lit(KIND_ABSTRACT).alias("rel"),
        F.col("text").alias("obj"),
        F.lit("demote").alias("rule"),
    )
    desc_rows = descs.where(
        (F.col("rule") == "term_alt") & ~is_wikimedia
    ).select(
        F.col("key").alias("subj"),
        F.lit(rel_id_for("description")).alias("rel"),
        F.col("text").alias("obj"),
        F.lit("description").alias("rule"),
    )

    nt_rows = canonicalize_predicates(
        parsed.where(~F.col("rule").isin(*label_stages)).withColumn(
            "pred", F.lower(F.col("pred"))
        ),
        dict(PREDICATE_CANON),
    ).select("subj", "rel", "obj", "rule")

    return (
        label_rows.unionByName(demote_rows)
        .unionByName(desc_rows)
        .unionByName(nt_rows)
        .dropDuplicates(["subj", "rel", "obj", "rule"])
    )


def wikimedia_abstract_keys(triples: DataFrame) -> DataFrame:
    """Keys demoted to the _abstract kind by a Wikimedia description
    (src/import.cpp:1365-1376) — the exclusion set for THE-entity
    selection (``getThe`` resolves abstracts through their instances
    instead of returning them, src/netbase.cpp:2310-2335)."""
    return (
        triples.where(F.col("rel") == KIND_ABSTRACT)
        .select(F.col("subj").alias("key"))
        .distinct()
    )
