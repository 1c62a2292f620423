"""N-Triples / Turtle-line ingestion — the ``importN3`` analog.

Reference: ``importN3`` scans NT lines with ``sscanf("%s\\t%s\\t%[^@>]s")``,
strips angle brackets / namespace prefixes, resolves Q/P wikidata ids on
a fast path, and drops external-ID predicates before creating statements
(src/import.cpp:1824-1919, 1670-1741, 1744-1791).

Spark-first: the whole parse is JVM-side column expressions over
``spark.read.text`` lines — regexp_extract for the three terms, a
``when``-chain for IRI resolution (the ``getEntity`` fast paths), and a
broadcast predicate-canonicalization map (``getRelation``).  Nothing
leaves whole-stage codegen; filters push down to the text scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one NT line: <subj> <pred> "literal"|<iri> .   (whitespace separated)
_TERM = r"(<[^>]*>|_:\S+|\"[^\"]*\"(?:\^\^<[^>]*>|@\w+)?)"
NT_LINE_RE = rf"^\s*{_TERM}\s+{_TERM}\s+{_TERM}\s*\.\s*$"

# external-ID predicates dropped at import (dropBadPredicate,
# src/import.cpp:1757-1786: P213/P214/P646 VIAF/Freebase ids etc.)
DROP_PREDICATES = ("P213", "P214", "P227", "P244", "P646", "P1245")


def resolve_term(c: Column) -> Column:
    """``getEntity`` fast paths as a when-chain (src/import.cpp:1670-1741):

    - ``_:b0`` blank node -> kept verbatim;
    - ``"lit"^^<type>`` / ``"lit"@lang`` -> bare literal text;
    - ``<.../Q123>`` / ``<.../P31>`` -> ``Q123`` / ``P31`` id slot;
    - other IRIs -> local name after the last ``#`` or ``/``
      (namespace cut, src/import.cpp:1689-1702), underscores -> spaces.
    """
    qp = F.regexp_extract(c, r"<[^>]*/([QP]\d+)>$", 1)
    lit = F.regexp_extract(c, r'^"([^"]*)"', 1)
    local = F.regexp_extract(c, r"<[^>]*[#/]([^#/>]+)>$", 1)
    bare = F.regexp_extract(c, r"^<([^#/>]+)>$", 1)
    return (
        F.when(c.startswith("_:"), c)
        .when(c.startswith('"'), lit)
        .when(qp != "", qp)
        .when(local != "", F.regexp_replace(local, "_", " "))
        .otherwise(bare)
    )


def parse_nt_lines(
    lines: DataFrame, col: str = "value", keep: tuple[str, ...] = ()
) -> DataFrame:
    """lines(col: one NT statement per row) -> (subj, pred, obj).

    Malformed lines and dropped external-ID predicates are filtered out
    (dropBadPredicate); filters sit directly on the scan so they push
    down before any downstream join.  ``keep`` names passthrough
    columns (e.g. a stage tag) — tagging + unioning raw lines BEFORE
    one shared parse keeps the resolve_term expression tree out of
    every branch of a multi-stage import (plan-size guard, PLANS.md).
    """
    c = F.col(col)
    parsed = lines.select(
        *[F.col(k) for k in keep],
        resolve_term(F.regexp_extract(c, NT_LINE_RE, 1)).alias("subj"),
        resolve_term(F.regexp_extract(c, NT_LINE_RE, 2)).alias("pred"),
        resolve_term(F.regexp_extract(c, NT_LINE_RE, 3)).alias("obj"),
        F.regexp_extract(c, NT_LINE_RE, 2).alias("_rawp"),
    )
    return (
        parsed.where((F.col("subj") != "") & (F.col("pred") != "") & (F.col("obj") != ""))
        .where(~F.col("pred").isin(*DROP_PREDICATES))
        .drop("_rawp")
    )


def canonicalize_predicates(triples: DataFrame, mapping: dict[str, int]) -> DataFrame:
    """Broadcast predicate canonicalization (``getRelation``/``rdfOwl``,
    src/relations.cpp:479-592): text predicate -> built-in relation id
    where known, else a stable hash-derived positive id."""
    items = [F.lit(x) for kv in mapping.items() for x in kv]
    m = F.create_map(*items) if items else F.create_map()
    return triples.withColumn(
        "rel",
        F.coalesce(
            m[F.col("pred")].cast("int"),
            F.pmod(F.xxhash64("pred"), F.lit(1 << 30)).cast("int"),
        ),
    )
