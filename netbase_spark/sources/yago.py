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
``spark.read.text`` lines — filters push down to the text scan and
nothing leaves whole-stage codegen.  The resolution is STAGED into
successive projections (tokens -> raw terms -> per-term components ->
assembled terms) so each regex/split subexpression materializes as one
column evaluated once per row: Catalyst's CollapseProject declines to
inline non-trivial expressions consumed more than once, whereas a
single nested expression tree re-evaluates the shared subtrees (the
split, the bracket-strip, the lowered lookup key) at every use site —
at 10^9 import lines that re-evaluation dominates the scan.  The
synset-id remap reuses the wordnet importer's broadcast join
(:func:`netbase_spark.sources.wordnet.remap_ids`).
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


def _vocab_col(key: Column) -> Column:
    """YAGO_VOCAB lookup as a flat when-chain over an ALREADY-
    MATERIALIZED key column.  NOT ``create_map``: a map built from
    literals is re-constructed on every evaluation (one 52-entry java
    map allocation per term per row); the when-chain is plain branch
    compares against a column reference, zero allocation, and stays
    inside whole-stage codegen.  ``key`` must be a cheap reference —
    passing a nested expression would duplicate it into all 26
    branches."""
    expr = None
    for k, v in YAGO_VOCAB.items():
        expr = F.when(key == k, v) if expr is None else expr.when(key == k, v)
    return expr


def yago_term(c: Column) -> Column:
    """``getYagoConcept`` as one nested expression (src/import.cpp:
    1103-1124).  Convenience form for single-column use; the bulk
    scanner below stages the same logic through projections so shared
    subtrees evaluate once per row."""
    wn = F.regexp_extract(c, r"^<wordnet_.*_(\d+)>$", 1)
    typed = F.regexp_extract(c, r'^"([^"]*)"\^\^', 1)
    stripped = F.regexp_replace(c, r"^<|>$", "")
    headless = F.regexp_replace(stripped, _HEADS, "")
    vocab = _vocab_col(F.lower(headless))
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


def _term_components(raw: str, p: str) -> list[Column]:
    """Stage-2 columns for one raw term column: everything
    ``getYagoConcept`` needs, each computed once."""
    c = F.col(raw)
    stripped = F.regexp_replace(c, r"^<|>$", "")
    return [
        F.regexp_extract(c, r"^<wordnet_.*_(\d+)>$", 1).alias(f"{p}_wn"),
        F.regexp_extract(c, r'^"([^"]*)"\^\^', 1).alias(f"{p}_typed"),
        F.regexp_replace(stripped, _HEADS, "").alias(f"{p}_headless"),
        (~F.lower(stripped).startswith("http")).alias(f"{p}_nonhttp"),
    ]


def _assemble_term(p: str) -> Column:
    """Stage-3 assembly from the stage-2 component columns (cheap
    references, so the when-chain adds no re-evaluation)."""
    wn = F.col(f"{p}_wn")
    typed = F.col(f"{p}_typed")
    headless = F.col(f"{p}_headless")
    key = F.col(f"{p}_key")
    pref = F.when(
        F.col(f"{p}_nonhttp"),
        F.regexp_extract(headless, r"^[A-Za-z]\w*:(.+)$", 1),
    ).otherwise(F.lit(""))
    return (
        F.when(wn != "", F.concat(F.lit("syn"), wn))
        .when(typed != "", typed)
        .when(_vocab_col(key).isNotNull(), _vocab_col(key))
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
    # stage 0: tokenize once; the split array is consumed five times
    # downstream, so it must be a materialized column, not a repeated
    # subexpression
    toksed = lines.select(
        F.filter(F.split(c, "\t"), lambda t: t != "").alias("_toks"),
        c.endswith("@eng").alias("_label"),
    ).where(F.size("_toks") >= 3)
    # stage 1: positional raw terms.  label rows always carry the id
    # FIRST when 4-column (the reference label branch skips the first
    # field regardless of leadingId, src/import.cpp:1155-1157); fact
    # rows follow the leading_id switch.  F.get (NULL on out-of-bounds),
    # not [] — pushed-down filters merge into one conjunctive Filter
    # whose predicate order Catalyst may rearrange, so ANSI-strict
    # indexing can evaluate before the size guard on short rows.
    n = F.size("_toks")
    shift = F.when(F.col("_label") | F.lit(leading_id), n >= 4).otherwise(
        F.lit(False)
    )
    raw = toksed.select(
        F.when(shift, F.get("_toks", 1)).otherwise(F.get("_toks", 0)).alias("_s"),
        F.when(shift, F.get("_toks", 2)).otherwise(F.get("_toks", 1)).alias("_p"),
        F.when(shift, F.get("_toks", 3)).otherwise(F.get("_toks", 2)).alias("_o"),
        "_label",
    )
    # stage 2: per-term components (each regex evaluated once per row)
    parts = raw.select(
        "_label",
        "_p",
        "_o",
        *_term_components("_s", "s"),
        *_term_components("_p", "p"),
        *_term_components("_o", "o"),
    )
    # stage 2b: lowered vocab keys (consumed 26x by the when-chain —
    # must be a column reference, see _vocab_col)
    parts = parts.select(
        "*",
        F.lower("s_headless").alias("s_key"),
        F.lower("p_headless").alias("p_key"),
        F.lower("o_headless").alias("o_key"),
    )
    # stage 3: assembled terms
    terms = parts.select(
        _assemble_term("s").alias("subj"),
        _assemble_term("p").alias("pred"),
        F.when(
            F.col("_label"), F.regexp_extract("_o", r'^"([^"]*)"', 1)
        ).otherwise(_assemble_term("o")).alias("obj"),
        "_label",
        "_p",
    )
    out = (
        terms.where(
            (F.col("subj") != "")
            & (F.col("pred") != "")
            & (F.col("obj") != "")
            # geonames external ids dropped (src/import.cpp:1198)
            & (F.col("_p") != "<hasGeonamesEntityId>")
            # facts whose object resolves to the Type builtin are
            # skipped (object == Type guard, src/import.cpp:1202-1205)
            & (F.col("_label") | (F.col("obj") != "type"))
            # self-labels dropped (wordhash equality, import.cpp:1197)
            & (
                ~F.col("_label")
                | (norm_name_col(F.col("subj")) != norm_name_col(F.col("obj")))
            )
        )
        .select("subj", "pred", "obj")
        .dropDuplicates(["subj", "pred", "obj"])
    )
    if synset_map is not None:
        from netbase_spark.sources.wordnet import remap_ids

        out = remap_ids(out, synset_map, ("subj", "obj"))
    return out


_FB_MEDIA_EXT = r"\.(svg|png|PNG|jpg|JPG|gif|bmp)$"


def fix_freebase_name(c: Column) -> Column:
    """``fixFreebaseName`` (src/import.cpp:1234-1253): ``fixYagoName``
    first; http names and media/3-char-file endings pass through;
    otherwise the dotted freebase namespace is stripped right-to-left —
    cut at the last '.' preceded by a non-digit (version numbers never
    cut) or at a '#' fragment, skipping exact ``.topic`` suffixes:
    "organization.organization.parent" -> "parent".  The companion
    ``freebaseHash`` shared-memory key map (import.cpp:1254-1267) is
    obviated here — string node ids ARE the keys."""
    stripped = F.regexp_replace(c, r"^<|>$", "")
    base = F.regexp_replace(stripped, _HEADS, "")
    ext = base.rlike(_FB_MEDIA_EXT) | base.rlike(r"^.{2,}\.[^.]{3}$")
    t = F.regexp_replace(base, r"(\.topic)+$", "")
    seg = F.regexp_extract(t, r"^.*[:-~]\.([^#]*)$", 1)
    frag = F.regexp_extract(t, r"#([^#]*)$", 1)
    cut = F.when(seg != "", seg).when(frag != "", frag).otherwise(t)
    return F.when(base.startswith("http") | ext, base).otherwise(cut)
