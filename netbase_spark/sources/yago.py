"""YAGO TSV facts scanner — the ``importYago`` analog.

Reference: ``importYago`` scans tab-separated fact files with per-line
shape autodetect (``countRows``, src/import.cpp:1125-1132): 3 columns =
(subj, pred, obj), 4 columns = (id, subj, pred, obj) unless the
filename contains "Data" (trailing id); ``@eng`` lines switch to label
mode with a quoted object (src/import.cpp:1140-1173).  Terms resolve
through ``getYagoConcept`` (src/import.cpp:1103-1124): ``<wordnet_*>``
keys cut the trailing synset id and remap it (``parseWordnetKey`` +
``norm_wordnet_id``, 1094-1101, 100-139), prefixed vocabulary names map
through ``rdfOwl`` (1051-1091), special label/domain names short-
circuit, ``^^``-typed values keep their lexical form, everything else
is ``fixYagoName`` (1033-1050: strip angle brackets + the
wikicategory_/geoclass_/wordnetDomain_/wordnet_ heads).  Dropped rows:
``<hasGeonamesEntityId>`` predicates (1198), self-labels
(``wordhash(obj) == wordhash(subj)``, 1197), facts whose object
resolves to the Type builtin (1202-1205), and malformed lines.

Spark-first: the whole scan is JVM-side column expressions over
``spark.read.text`` lines — one split, a when-chain per term, broadcast
vocab map — so filters push down to the text scan and nothing leaves
whole-stage codegen.  The synset-id remap reuses the wordnet importer's
broadcast join (:func:`netbase_spark.sources.wordnet.remap_ids`).
Deviation noted: the reference strips unknown-prefix names with
``strstr(name, ":") + 2`` (dropping the char after the colon,
src/import.cpp:1085-1088) — an off-by-one we do not replicate; we keep
everything after the colon.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netbase_spark.normalize import norm_name_col

# rdfOwl vocabulary (src/import.cpp:1051-1091) + getYagoConcept special
# names (1107-1110), keyed lowercase.
YAGO_VOCAB: dict[str, str] = {
    "rdf:type": "type",
    "rdfs:superclassof": "superclass of",
    "rdfs:subclassof": "subclass of",
    "rdfs:subpropertyof": "subclass of",
    "rdfs:label": "label",
    "skos:preflabel": "label",
    "rdfs:property": "relation",
    "rdf:property": "relation",
    "rdfs:domain": "domain",
    "rdfs:range": "range",
    "rdfs:comment": "comment",
    "rdfs:class": "class",
    "xsd:date": "date",
    "xsd:decimal": "number",
    "xsd:integer": "number",
    "xsd:nonnegativeinteger": "number",
    "xsd:boolean": "boolean",
    "xsd:gyear": "year",
    "owl:disjointwith": "disjoint with",
    "owl:functionalproperty": "label",
    "owl:symmetricproperty": "relation",
    "owl:transitiveproperty": "relation",
    "ispreferredmeaningof": "label",
    "#label": "label",
    "hasgloss": "label",
    "haswordnetdomain": "domain",
}

_HEADS = r"^(wikicategory_|geoclass_|wordnetDomain_|wordnet_)"


def yago_term(c: Column) -> Column:
    """``getYagoConcept`` as a when-chain (src/import.cpp:1103-1124)."""
    wn = F.regexp_extract(c, r"^<wordnet_.*_(\d+)>$", 1)
    typed = F.regexp_extract(c, r'^"([^"]*)"\^\^', 1)
    stripped = F.regexp_replace(c, r"^<|>$", "")
    headless = F.regexp_replace(stripped, _HEADS, "")
    vocab_items = [F.lit(x) for kv in YAGO_VOCAB.items() for x in kv]
    vocab = F.create_map(*vocab_items)[F.lower(headless)]
    # unknown prefixed names (not http IRIs): keep after the colon
    pref = F.when(
        ~F.lower(stripped).startswith("http"),
        F.regexp_extract(headless, r"^[A-Za-z]\w*:(.+)$", 1),
    ).otherwise(F.lit(""))
    return (
        F.when(wn != "", F.concat(F.lit("syn"), wn))
        .when(typed != "", typed)
        .when(vocab.isNotNull(), vocab)
        .when(pref != "", pref)
        .otherwise(headless)
    )


def parse_yago_lines(
    lines: DataFrame,
    col: str = "value",
    leading_id: bool = True,
    synset_map: DataFrame | None = None,
) -> DataFrame:
    """lines(col: one YAGO TSV row per line) -> (subj, pred, obj).

    ``leading_id`` mirrors the reference's ``!contains(file, "Data")``
    switch (src/import.cpp:1158): 4-column rows carry the statement id
    first (True) or last (False).  ``synset_map(old_id, new_id)`` remaps
    stale ``syn<id>`` terms (``norm_wordnet_id``).
    """
    c = F.col(col)
    toks = F.filter(F.split(c, "\t"), lambda t: t != "")
    n = F.size(toks)
    is_label = c.endswith("@eng")
    # label rows always carry the id FIRST when 4-column (the reference
    # label branch skips the first field regardless of leadingId,
    # src/import.cpp:1155-1157); fact rows follow the leading_id switch
    # F.get (NULL on out-of-bounds), not [] — pushed-down filters merge
    # into one conjunctive Filter whose predicate order Catalyst may
    # rearrange, so ANSI-strict indexing can evaluate before the n >= 3
    # guard on short rows
    shift = F.when(is_label | F.lit(leading_id), n >= 4).otherwise(F.lit(False))
    s_raw = F.when(shift, F.get(toks, 1)).otherwise(F.get(toks, 0))
    p_raw = F.when(shift, F.get(toks, 2)).otherwise(F.get(toks, 1))
    obj_raw = F.when(shift, F.get(toks, 3)).otherwise(F.get(toks, 2))

    parsed = lines.where(n >= 3).select(
        yago_term(s_raw).alias("subj"),
        yago_term(p_raw).alias("pred"),
        F.when(
            is_label, F.regexp_extract(obj_raw, r'^"([^"]*)"', 1)
        ).otherwise(yago_term(obj_raw)).alias("obj"),
        p_raw.alias("_rawp"),
        is_label.alias("_label"),
    )
    out = (
        parsed.where(
            (F.col("subj") != "") & (F.col("pred") != "") & (F.col("obj") != "")
        )
        # geonames external ids dropped (src/import.cpp:1198)
        .where(F.col("_rawp") != "<hasGeonamesEntityId>")
        # facts whose object resolves to the Type builtin are skipped
        # (object == Type guard, src/import.cpp:1202-1205)
        .where(F.col("_label") | (F.col("obj") != "type"))
        # self-labels dropped (wordhash equality, src/import.cpp:1197)
        .where(
            ~F.col("_label")
            | (norm_name_col(F.col("subj")) != norm_name_col(F.col("obj")))
        )
        .drop("_rawp", "_label")
        .dropDuplicates(["subj", "pred", "obj"])
    )
    if synset_map is not None:
        from netbase_spark.sources.wordnet import remap_ids

        out = remap_ids(out, synset_map, ("subj", "obj"))
    return out
