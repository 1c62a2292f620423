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
    """YAGO_VOCAB lookup: ``element_at`` over a ``create_map`` of
    literals.  An all-literal CreateMap is foldable, so ConstantFolding
    turns it into ONE map literal at plan time — per row this is a
    single hash probe, and the whole lookup is a 2-node expression
    (literal + key).  The earlier 26-branch when-chain referenced
    ``key`` 26 times; after Catalyst's CollapseProject + filter
    pushdown inlined the staged projections, those 26 references each
    carried the full key subtree and blew the plan past the codegen
    size limit (measured 2.1 MB plan text, zero WholeStageCodegen
    spans, 25-48 s for an 8k-line import)."""
    pairs = []
    for k, v in YAGO_VOCAB.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.element_at(F.create_map(*pairs), key)


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
    references, so the when-chain adds no re-evaluation).  The vocab
    lookup is itself a staged column (``{p}_vocab``) — referencing it
    twice here is free, whereas instantiating the 26-branch chain at
    both use sites doubled the expression tree (and after Catalyst's
    CollapseProject + filter pushdown inlined the stages, that doubling
    multiplied into a plan too large for whole-stage codegen)."""
    wn = F.col(f"{p}_wn")
    typed = F.col(f"{p}_typed")
    headless = F.col(f"{p}_headless")
    vocab = F.col(f"{p}_vocab")
    pref = F.when(
        F.col(f"{p}_nonhttp"),
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
    # stage 0: normalize the line (trim edge tabs, collapse runs — the
    # empty-token skip) and count fields.  Positional access below is
    # ``split_part`` on the normalized LINE, not ``F.get`` over a
    # materialized split array: the staged projections inevitably
    # collapse (CollapseProject) and their predicates push into the
    # scan, inlining every column reference's defining expression at
    # every use site — so the design constraint is that each leaf stays
    # a 2-3 node tree.  The array form inlined
    # ``filter(split(line))`` + ``get`` chains at ~40 use sites x 8
    # union branches (measured: "split(" 7,791 times in one plan).
    # ``split_part`` is 1-based and returns '' out of range (same
    # drop behavior as a NULL ``get`` under the != '' guards).
    nl = F.regexp_replace(
        F.regexp_replace(c, r"^\t+|\t+$", ""), r"\t+", "\t"
    )
    toksed = lines.select(
        nl.alias("_line"),
        F.size(F.split(nl, "\t")).alias("_n"),
        c.endswith("@eng").alias("_label"),
    ).where(F.col("_n") >= 3)
    # stage 1: positional raw terms.  label rows always carry the id
    # FIRST when 4-column (the reference label branch skips the first
    # field regardless of leadingId, src/import.cpp:1155-1157); fact
    # rows follow the leading_id switch.
    shift = (F.col("_label") | F.lit(leading_id)) & (F.col("_n") >= 4)

    def _part(i: int) -> Column:
        return F.split_part(F.col("_line"), F.lit("\t"), F.lit(i))

    raw = toksed.select(
        F.when(shift, _part(2)).otherwise(_part(1)).alias("_s"),
        F.when(shift, _part(3)).otherwise(_part(2)).alias("_p"),
        F.when(shift, _part(4)).otherwise(_part(3)).alias("_o"),
        "_label",
    )
    # stage 2: per-term components (each regex evaluated once per row).
    # The _barrier column is NON-DETERMINISTIC on purpose (always >= 0,
    # never read): CollapseProject refuses to merge through it, so
    # stages 2/2b/3 stay separate Project nodes whose codegen methods
    # are individually small.  Without it the collapsed single
    # doConsume grew past what Janino can compile and the whole stage
    # silently ran interpreted.
    parts = raw.select(
        "_label",
        "_p",
        "_o",
        *_term_components("_s", "s"),
        *_term_components("_p", "p"),
        *_term_components("_o", "o"),
        F.monotonically_increasing_id().alias("_barrier"),
    )
    # stage 2b: lowered vocab keys (consumed 26x by the when-chain —
    # must be a column reference, see _vocab_col)
    parts = parts.select(
        "*",
        F.lower("s_headless").alias("s_key"),
        F.lower("p_headless").alias("p_key"),
        F.lower("o_headless").alias("o_key"),
    )
    parts = parts.select(
        "*",
        _vocab_col(F.col("s_key")).alias("s_vocab"),
        _vocab_col(F.col("p_key")).alias("p_vocab"),
        _vocab_col(F.col("o_key")).alias("o_vocab"),
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
    # all drop rules as ONE staged boolean: filter pushdown substitutes
    # a predicate's column refs with their full defining expressions —
    # five separate conjuncts inlined five copies of the term trees
    # into the scan filter (x the union branch count), which is what
    # pushed the collapsed plan past the codegen size limit
    keep = (
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
    # _keep is wrapped in a CASE WHEN on monotonically_increasing_id()
    # (always >= 0, so semantics are exactly `keep`) to make the COLUMN
    # non-deterministic: PushDownPredicates pushes even a filter on a
    # plain alias through every all-deterministic projection below it,
    # substituting the alias with its full defining expression — which
    # inlined the whole term-resolution tree into one Generate-adjacent
    # Filter too large for Janino to compile, so the entire fused stage
    # silently ran interpreted AND re-evaluated every term a second
    # time in the projections above.  A non-deterministic field pins
    # the filter at this level (and survives column pruning because the
    # filter consumes it).
    nd_keep = F.when(
        F.monotonically_increasing_id() >= 0, keep
    ).otherwise(F.lit(False))
    out = (
        terms.select("subj", "pred", "obj", nd_keep.alias("_keep"))
        .where(F.col("_keep"))
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
