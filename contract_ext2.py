"""Round-2 extension queries for the driver contract (imported by
``__spark_entry__``): the mutation path (learn/upsert), semantic
pattern match over the isA closure, XML + WordNet importers, per-edge-
type meronymy BFS, countInstances, sortTopics, property questions,
statement reification, mergeAll star edges, and SEO conflict
resolution.  Every query routes through a package operator and has a
DuckDB oracle so green rows certify the engine, not inline SQL
(VERDICT round 1, "What's wrong" #2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from netbase_spark.relations import INSTANCE, PART, SIMILAR, TYPE

# Must stay textually identical to __spark_entry__.NORM_SQL (the DuckDB
# twin of netbase_spark.normalize.norm_name_col).
NORM_SQL = (
    "lower(trim(regexp_replace(regexp_replace({c}, '^[\"''\\s]+|[\"''\\s]+$', '', 'g'),"
    " '[\\s_\\-]+', ' ', 'g')))"
)

# DuckDB twin of netbase_spark.operators.mutate.rel_id_for's md5 fallback
MD5_REL_SQL = "CAST(CAST(('0x' || substr(md5({name}), 1, 8)) AS BIGINT) % 1073741824 AS INT)"


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sk(col, prefix):
    return F.concat(F.lit(prefix), F.col(col).cast("string"))


def _type_triples(spark, sf_dir):
    """(S, Type, N) + (N, Type, R) fixture used by the subsumption
    queries (same shape as __spark_entry__._supplier_type_triples)."""
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return supplier.select(
        _sk("s_suppkey", "S").alias("subj"),
        F.lit(TYPE).alias("rel"),
        _sk("s_nationkey", "N").alias("obj"),
    ).unionByName(
        nation.select(
            _sk("n_nationkey", "N").alias("subj"),
            F.lit(TYPE).alias("rel"),
            _sk("n_regionkey", "R").alias("obj"),
        )
    )


# ---------------------------------------------------------------------------
# semantic pattern match (find_statements(..., semantic=True))
# ---------------------------------------------------------------------------


def q_pattern_semantic(spark, sf_dir):
    """``findStatement`` SEMANTIC match (src/netbase.cpp:1764-1785;
    isA4 src/query.cpp:2457-2552): pattern (Any, Type, R0) where the
    object term matches R0 OR any isA-descendant of R0 — so it returns
    the (nation, Type, R0) rows AND the (supplier, Type, nation-in-R0)
    rows that an exact match would miss."""
    from netbase_spark.operators.query_ops import find_statements

    return find_statements(
        _type_triples(spark, sf_dir), rel=TYPE, obj="R0", semantic=True
    )


ORACLE_PATTERN_SEMANTIC = """
    WITH RECURSIVE t AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj, CAST(-3 AS INT) AS rel,
               'N' || CAST(s_nationkey AS VARCHAR) AS obj FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR), CAST(-3 AS INT),
               'R' || CAST(n_regionkey AS VARCHAR) FROM nation
    ), up AS (
        SELECT subj AS node, obj AS anc FROM t
    ), closure AS (
        SELECT node, anc FROM up
        UNION
        SELECT c.node, u.anc FROM closure c JOIN up u ON c.anc = u.node
    ), keys AS (
        SELECT 'R0' AS k
        UNION
        SELECT node FROM closure WHERE anc = 'R0'
    )
    SELECT DISTINCT subj, rel, obj FROM t WHERE obj IN (SELECT k FROM keys)
"""


# ---------------------------------------------------------------------------
# predicate sub-property hierarchy (initWikiRelations)
# ---------------------------------------------------------------------------


def q_pattern_subproperty(spark, sf_dir):
    """``initWikiRelations`` predicate hierarchy (src/relations.cpp:
    595-612) in the pattern matcher: a PartOf pattern with
    ``rel_subsumption=True`` also matches P131 edges directly (stored
    rel preserved) and, through the inverse rewrite, flipped Part and
    P150 edges reported as PartOf."""
    from netbase_spark.operators.mutate import rel_id_for
    from netbase_spark.operators.query_ops import find_statements
    from netbase_spark.relations import PART, PART_OF

    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    def tri(df, s, r, o):
        return df.select(s.alias("subj"), F.lit(r).alias("rel"), o.alias("obj"))

    triples = (
        tri(supplier, _sk("s_suppkey", "S"), PART_OF, _sk("s_nationkey", "N"))
        .unionByName(
            tri(customer, _sk("c_custkey", "C"), rel_id_for("p131"),
                _sk("c_nationkey", "N"))
        )
        .unionByName(
            tri(region, _sk("r_regionkey", "R"), PART,
                _sk("r_regionkey", "asset"))
        )
        .unionByName(
            tri(nation, _sk("n_nationkey", "N"), rel_id_for("p150"),
                _sk("n_nationkey", "dist"))
        )
    )
    return find_statements(triples, rel=PART_OF, rel_subsumption=True)


ORACLE_PATTERN_SUBPROPERTY = f"""
    SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj, CAST(-12 AS INT) AS rel,
           'N' || CAST(s_nationkey AS VARCHAR) AS obj
    FROM supplier
    UNION ALL
    SELECT 'C' || CAST(c_custkey AS VARCHAR), {MD5_REL_SQL.format(name="'p131'")},
           'N' || CAST(c_nationkey AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'asset' || CAST(r_regionkey AS VARCHAR), CAST(-12 AS INT),
           'R' || CAST(r_regionkey AS VARCHAR)
    FROM region
    UNION ALL
    SELECT 'dist' || CAST(n_nationkey AS VARCHAR), CAST(-12 AS INT),
           'N' || CAST(n_nationkey AS VARCHAR)
    FROM nation
"""


# ---------------------------------------------------------------------------
# learn / upsert mutation path
# ---------------------------------------------------------------------------


def q_learn_roundtrip(spark, sf_dir):
    """``learn(sentence)`` + idempotent upsert roundtrip
    (src/netbase.cpp:2200-2218; testFactLearning src/tests.cpp:
    1227-1259): 3-token sentences with stop-word strip ("the C5 is N3"),
    dotted evaluate forms ("C5.segment=BUILDING"), free predicates via
    the md5 relation-id fallback, malformed sentences dropped, and
    re-learning an existing base fact keeps the BASE row (idempotent
    MERGE — duplicate facts are the same statement)."""
    from netbase_spark.operators.mutate import learn

    cust = _t(spark, sf_dir, "customer")
    ck = _sk("c_custkey", "C")
    nk = _sk("c_nationkey", "N")
    sentences = (
        cust.select(
            F.concat(F.lit("the "), ck, F.lit(" is "), nk).alias("sentence")
        )
        .unionByName(
            cust.select(F.concat(ck, F.lit(" likes "), nk).alias("sentence"))
        )
        .unionByName(
            cust.select(
                F.concat(ck, F.lit(".segment="), F.col("c_mktsegment")).alias(
                    "sentence"
                )
            )
        )
        .unionByName(
            cust.where(F.col("c_custkey") % 7 == 0).select(
                F.lit("this sentence has too many tokens").alias("sentence")
            )
        )
    )
    base = cust.where(F.col("c_custkey") % 10 == 0).select(
        F.lower(ck).alias("subj"),
        F.lit(TYPE).alias("rel"),
        F.lower(nk).alias("obj"),
        F.lit("base").alias("rule"),
        F.lit(None).cast("string").alias("doc_id"),
    )
    return learn(base, sentences).select("subj", "rel", "obj", "rule")


ORACLE_LEARN = f"""
    WITH learned AS (
        SELECT DISTINCT * FROM (
            SELECT 'c' || CAST(c_custkey AS VARCHAR) AS subj, CAST(-3 AS INT) AS rel,
                   'n' || CAST(c_nationkey AS VARCHAR) AS obj, 'learn' AS rule
            FROM customer
            UNION ALL
            SELECT 'c' || CAST(c_custkey AS VARCHAR), {MD5_REL_SQL.format(name="'likes'")},
                   'n' || CAST(c_nationkey AS VARCHAR), 'learn'
            FROM customer
            UNION ALL
            SELECT 'c' || CAST(c_custkey AS VARCHAR), {MD5_REL_SQL.format(name="'segment'")},
                   lower(c_mktsegment), 'learn'
            FROM customer
        )
    ), base AS (
        SELECT 'c' || CAST(c_custkey AS VARCHAR) AS subj, CAST(-3 AS INT) AS rel,
               'n' || CAST(c_nationkey AS VARCHAR) AS obj, 'base' AS rule
        FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT subj, rel, obj, rule FROM (
        SELECT *, row_number() OVER (
            PARTITION BY subj, rel, obj
            ORDER BY CASE rule WHEN 'base' THEN 0 ELSE 1 END) AS rn
        FROM (SELECT * FROM base UNION ALL SELECT * FROM learned)
    ) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# importXml
# ---------------------------------------------------------------------------


def q_xml_triples(spark, sf_dir):
    """``importXml`` (src/import.cpp:608-729): nested elements emit
    Member edges, leaf <k>v</k> elements emit (subject, k, v) triples,
    and <name> fields rename the enclosing subject (namify,
    src/import.cpp:578-587).  One XML document per nation with its
    suppliers nested."""
    from netbase_spark.sources.xml import parse_xml_docs

    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    frag = F.concat(
        F.lit("<supplier><name>S"),
        F.col("s_suppkey").cast("string"),
        F.lit("</name><bal>"),
        (F.col("s_suppkey") * 7).cast("string"),
        F.lit("</bal></supplier>"),
    )
    sups = supplier.groupBy("s_nationkey").agg(
        F.concat_ws("", F.sort_array(F.collect_list(frag))).alias("sups")
    )
    docs = (
        nation.join(
            sups, nation["n_nationkey"] == sups["s_nationkey"], "left"
        ).select(
            F.concat(
                F.lit("<nation><name>N"),
                F.col("n_nationkey").cast("string"),
                F.lit("</name><rcode>R"),
                F.col("n_regionkey").cast("string"),
                F.lit("</rcode>"),
                F.coalesce(F.col("sups"), F.lit("")),
                F.lit("</nation>"),
            ).alias("xml")
        )
    )
    return parse_xml_docs(docs, name_fields=("name",))


ORACLE_XML = """
    SELECT 'N' || CAST(n_nationkey AS VARCHAR) AS subj, 'rcode' AS pred,
           'R' || CAST(n_regionkey AS VARCHAR) AS obj
    FROM nation
    UNION
    SELECT 'N' || CAST(s_nationkey AS VARCHAR), 'member',
           'S' || CAST(s_suppkey AS VARCHAR)
    FROM supplier
    UNION
    SELECT 'S' || CAST(s_suppkey AS VARCHAR), 'bal',
           CAST(s_suppkey * 7 AS VARCHAR)
    FROM supplier
"""


# ---------------------------------------------------------------------------
# importYago TSV scanner
# ---------------------------------------------------------------------------


def q_yago_import(spark, sf_dir):
    """``importYago`` (src/import.cpp:1134-1232): per-line 3/4-column
    autodetect, @eng label lines with quoted objects, rdfOwl vocabulary
    mapping, wordnet-key synset extraction + remap, and the drop rules
    (hasGeonamesEntityId, self-labels, object-resolves-to-Type,
    malformed lines)."""
    from netbase_spark.sources.yago import parse_yago_lines

    sup = _t(spark, sf_dir, "supplier")
    sk = F.col("s_suppkey").cast("string")
    nk = F.col("s_nationkey").cast("string")
    # one scan + explode (NOT an 8-way union: project/filter pushdown
    # through Union duplicates the whole parse expression tree into
    # every branch — measured 8x plan size for identical output)
    lines = sup.select(
        F.explode(
            F.array(
                # 3-col fact with vocab predicate + wikicategory head strip
                F.concat(F.lit("<S"), sk, F.lit(">\trdf:type\t<wikicategory_N"), nk, F.lit(">")),
                # 4-col fact with leading statement id
                F.concat(F.lit("<id_"), sk, F.lit(">\t<S"), sk, F.lit(">\t<created>\t<P_"), sk, F.lit(">")),
                # wordnet-key object (ids < 50 are stale -> remapped)
                F.concat(F.lit("<S"), sk, F.lit(">\t<hasKind>\t<wordnet_thing_"), (F.col("s_suppkey") % 100).cast("string"), F.lit(">")),
                # label line (quoted @eng object)
                F.concat(F.lit("<S"), sk, F.lit('>\tskos:prefLabel\t"Supplier '), sk, F.lit('"@eng')),
                # dropped: self-label, geonames id, object==Type, malformed
                F.concat(F.lit("<Acme_"), sk, F.lit('>\tskos:prefLabel\t"acme '), sk, F.lit('"@eng')),
                F.concat(F.lit("<S"), sk, F.lit(">\t<hasGeonamesEntityId>\t<g"), sk, F.lit(">")),
                F.concat(F.lit("<S"), sk, F.lit(">\t<weird>\trdf:type")),
                F.lit("malformed line"),
            )
        ).alias("value")
    )
    synset_map = spark.range(50).select(
        F.concat(F.lit("syn"), F.col("id").cast("string")).alias("old_id"),
        F.concat(F.lit("syn"), (F.col("id") + 1000).cast("string")).alias(
            "new_id"
        ),
    )
    return parse_yago_lines(lines, synset_map=synset_map)


ORACLE_YAGO = """
    SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj, 'type' AS pred,
           'N' || CAST(s_nationkey AS VARCHAR) AS obj
    FROM supplier
    UNION
    SELECT 'S' || CAST(s_suppkey AS VARCHAR), 'created',
           'P_' || CAST(s_suppkey AS VARCHAR)
    FROM supplier
    UNION
    SELECT 'S' || CAST(s_suppkey AS VARCHAR), 'hasKind',
           'syn' || CAST(CASE WHEN s_suppkey % 100 < 50
                              THEN s_suppkey % 100 + 1000
                              ELSE s_suppkey % 100 END AS VARCHAR)
    FROM supplier
    UNION
    SELECT 'S' || CAST(s_suppkey AS VARCHAR), 'label',
           'Supplier ' || CAST(s_suppkey AS VARCHAR)
    FROM supplier
"""


# ---------------------------------------------------------------------------
# importWordnet synset remap
# ---------------------------------------------------------------------------


def q_wordnet_import(spark, sf_dir):
    """``importWordnet`` orchestration with synset-id remapping
    (src/import.cpp:100-139, 2118-2323): senses -> Instance triples,
    synsets -> POS Type triples, lexlinks with redundant
    Instance/SubClass rows skipped; stale ids (< 50) remap through
    synset_map via broadcast joins."""
    from netbase_spark.sources.wordnet import import_wordnet

    part = _t(spark, sf_dir, "part")
    k = F.col("p_partkey") % 300
    sid = F.concat(F.lit("syn"), k.cast("string"))
    senses = part.select(F.col("p_name").alias("word"), sid.alias("synset_id"))
    synsets = part.select(
        sid.alias("synset_id"),
        F.when(k % 2 == 0, "noun").otherwise("verb").alias("pos"),
        F.lit("gloss").alias("gloss"),
    ).distinct()
    lexlinks = part.select(
        sid.alias("src_id"),
        F.when(k % 3 == 0, -1).otherwise(F.when(k % 3 == 1, -2).otherwise(-11))
        .cast("int")
        .alias("rel"),
        F.concat(F.lit("syn"), ((k * 7 + 1) % 300).cast("string")).alias(
            "dst_id"
        ),
    ).distinct()
    synset_map = spark.range(50).select(
        F.concat(F.lit("syn"), F.col("id").cast("string")).alias("old_id"),
        F.concat(F.lit("syn"), (F.col("id") + 1000).cast("string")).alias(
            "new_id"
        ),
    )
    return import_wordnet(senses, synsets, lexlinks, synset_map).select(
        "subj", "rel", "obj", "rule"
    )


_REMAP = "CAST(CASE WHEN {k} < 50 THEN {k} + 1000 ELSE {k} END AS VARCHAR)"

ORACLE_WORDNET = f"""
    WITH ks AS (SELECT DISTINCT p_partkey % 300 AS k FROM part),
    senses AS (
        SELECT DISTINCT {NORM_SQL.format(c="p_name")} AS subj,
               CAST(-4 AS INT) AS rel,
               'syn' || {_REMAP.format(k="p_partkey % 300")} AS obj,
               'sense' AS rule
        FROM part WHERE length({NORM_SQL.format(c="p_name")}) > 0
    ), synsets AS (
        SELECT DISTINCT 'syn' || {_REMAP.format(k="k")} AS subj,
               CAST(-3 AS INT) AS rel,
               CASE WHEN k % 2 = 0 THEN 'noun' ELSE 'verb' END AS obj,
               'synset_pos' AS rule
        FROM ks
    ), lex AS (
        SELECT DISTINCT 'syn' || {_REMAP.format(k="k")} AS subj,
               CAST(CASE WHEN k % 3 = 0 THEN -1 ELSE -11 END AS INT) AS rel,
               'syn' || {_REMAP.format(k="(k * 7 + 1) % 300")} AS obj,
               'lexlink' AS rule
        FROM ks WHERE k % 3 <> 1
    )
    SELECT * FROM senses UNION ALL SELECT * FROM synsets
    UNION ALL SELECT * FROM lex
"""


# ---------------------------------------------------------------------------
# importWikiData staged orchestration
# ---------------------------------------------------------------------------


def q_wikidata_stages(spark, sf_dir):
    """``importWikiData`` (src/import.cpp:2502-2540): staged label
    imports with the fill-up-missing rule (secondary-language labels
    only for keys without a primary one), alt labels after the terms,
    then taxonomy/instances/simple-statements N3 with canonical
    predicate resolution."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    nk = F.col("n_nationkey").cast("string")
    rk = F.col("r_regionkey").cast("string")
    ent = "<http://www.wikidata.org/entity/Q"
    lbl = "> <http://www.w3.org/2000/01/rdf-schema#label> "
    alt = "> <http://www.w3.org/2004/02/skos/core#altLabel> "

    props = region.select(F.concat(
        F.lit("<http://www.wikidata.org/entity/P10"), rk, F.lit(lbl),
        F.lit('"prop'), rk, F.lit('"@en .')).alias("value"))
    desc = "> <http://schema.org/description> "
    primary = nation.where(F.col("n_nationkey") % 2 == 0).select(F.concat(
        F.lit(ent), nk, F.lit(lbl), F.lit('"Nde'), nk, F.lit('"@de .')
    ).alias("value")).unionByName(
        # Wikimedia descriptions demote in ANY run (import.cpp:1365-1376)
        nation.where(F.col("n_nationkey") % 5 == 0).select(F.concat(
            F.lit(ent), nk, F.lit(desc), F.lit('"Wikimedia-Kategorie '),
            nk, F.lit('"@en .')).alias("value"))
    )
    fillup = nation.select(F.concat(
        F.lit(ent), nk, F.lit(lbl), F.lit('"Nen'), nk, F.lit('"@en .')
    ).alias("value"))
    # alts on a key subset (%3==0) so the fill-up leg stays exercised:
    # an alt label ALSO blocks fill-up (node->name is set, import.cpp:1346)
    alts = nation.where(F.col("n_nationkey") % 3 == 0).select(F.concat(
        F.lit(ent), nk, F.lit(alt), F.lit('"altn'), nk, F.lit('"@de .')
    ).alias("value")).unionByName(
        # plain descriptions only bind during the alt run (import.cpp:1377)
        nation.where(F.col("n_nationkey") % 5 == 1).select(F.concat(
            F.lit(ent), nk, F.lit(desc), F.lit('"Desc '), nk,
            F.lit('"@de .')).alias("value"))
    ).unionByName(
        nation.where(F.col("n_nationkey") % 5 == 2).select(F.concat(
            F.lit(ent), nk, F.lit(desc), F.lit('"Wikimedia-Liste '), nk,
            F.lit('"@en .')).alias("value"))
    )
    taxonomy = region.select(F.concat(
        F.lit(ent), (F.col("r_regionkey") + 1000).cast("string"),
        F.lit("> <http://www.wikidata.org/prop/P279> "),
        F.lit(ent), F.lit("9999> .")).alias("value"))
    instances = nation.select(F.concat(
        F.lit(ent), nk, F.lit("> <http://www.wikidata.org/prop/P31> "),
        F.lit(ent), (F.col("n_regionkey") + 1000).cast("string"),
        F.lit("> .")).alias("value"))
    statements = nation.select(F.concat(
        F.lit(ent), nk, F.lit("> <http://www.wikidata.org/prop/P361> "),
        F.lit(ent), (F.col("n_regionkey") + 1000).cast("string"),
        F.lit("> .")).alias("value"))
    # ONE localCheckpoint of the tagged union of the (dimension-sized)
    # synthesized dumps: without it, predicate pushdown inlines the
    # full resolve_term CASE tree — with the concat() line synthesis
    # substituted in — into every scan's Filter condition (8 scans x
    # ~22 KB = the 199 KB plan-text WARN in PLANS.md).  A real
    # deployment reads the dumps with spark.read.text, where the same
    # filters land on a plain column.
    from netbase_spark.sources.wikidata import (
        import_wikidata_tagged,
        tag_stage_lines,
    )

    tagged = tag_stage_lines(
        [
            ("property", props),
            ("term_primary", primary),
            ("term_fillup", fillup),
            ("term_alt", alts),
            ("taxonomy", taxonomy),
            ("instances", instances),
            ("statements", statements),
        ]
    )
    return import_wikidata_tagged(tagged.localCheckpoint())


ORACLE_WIKIDATA = """
    SELECT 'P10' || CAST(r_regionkey AS VARCHAR) AS subj, CAST(-38 AS INT) AS rel,
           'prop' || CAST(r_regionkey AS VARCHAR) AS obj, 'property' AS rule
    FROM region
    UNION ALL
    SELECT 'Q' || CAST(n_nationkey AS VARCHAR), CAST(-38 AS INT),
           'Nde' || CAST(n_nationkey AS VARCHAR), 'term_primary'
    FROM nation WHERE n_nationkey % 2 = 0
    UNION ALL
    SELECT 'Q' || CAST(n_nationkey AS VARCHAR), CAST(-38 AS INT),
           'Nen' || CAST(n_nationkey AS VARCHAR), 'term_fillup'
    FROM nation WHERE n_nationkey % 2 = 1 AND n_nationkey % 3 <> 0
    UNION ALL
    SELECT 'Q' || CAST(n_nationkey AS VARCHAR), CAST(-38 AS INT),
           'altn' || CAST(n_nationkey AS VARCHAR), 'term_alt'
    FROM nation WHERE n_nationkey % 3 = 0
    UNION ALL
    SELECT 'Q' || CAST(n_nationkey AS VARCHAR), CAST(-102 AS INT),
           'Wikimedia-Kategorie ' || CAST(n_nationkey AS VARCHAR), 'demote'
    FROM nation WHERE n_nationkey % 5 = 0
    UNION ALL
    SELECT 'Q' || CAST(n_nationkey AS VARCHAR), CAST(-102 AS INT),
           'Wikimedia-Liste ' || CAST(n_nationkey AS VARCHAR), 'demote'
    FROM nation WHERE n_nationkey % 5 = 2
    UNION ALL
    SELECT 'Q' || CAST(n_nationkey AS VARCHAR), CAST(668662060 AS INT),
           'Desc ' || CAST(n_nationkey AS VARCHAR), 'description'
    FROM nation WHERE n_nationkey % 5 = 1
    UNION ALL
    SELECT 'Q' || CAST(r_regionkey + 1000 AS VARCHAR), CAST(-1 AS INT),
           'Q9999', 'taxonomy'
    FROM region
    UNION ALL
    SELECT 'Q' || CAST(n_nationkey AS VARCHAR), CAST(-3 AS INT),
           'Q' || CAST(n_regionkey + 1000 AS VARCHAR), 'instances'
    FROM nation
    UNION ALL
    SELECT 'Q' || CAST(n_nationkey AS VARCHAR), CAST(-12 AS INT),
           'Q' || CAST(n_regionkey + 1000 AS VARCHAR), 'statements'
    FROM nation
"""


# ---------------------------------------------------------------------------
# meronymy BFS (memberFilter per-edge-type predicate sets)
# ---------------------------------------------------------------------------


def _meronymy_triples(spark, sf_dir):
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    def tri(df, s, r, o):
        return df.select(s.alias("subj"), F.lit(r).alias("rel"), o.alias("obj"))

    return (
        # class-on-subject instance rows: nation has supplier instances
        tri(supplier, _sk("s_nationkey", "N"), INSTANCE, _sk("s_suppkey", "S"))
        .unionByName(tri(nation, _sk("n_nationkey", "N"), PART,
                         _sk("n_nationkey", "res")))
        .unionByName(tri(nation, _sk("n_nationkey", "N"), TYPE,
                         _sk("n_regionkey", "R")))
        # skip-listed noise edges (Similar) must not step the BFS
        .unionByName(tri(nation, _sk("n_nationkey", "N"), SIMILAR,
                         F.lit("noise")))
        .unionByName(tri(region, _sk("r_regionkey", "R"), PART,
                         _sk("r_regionkey", "asset")))
    )


def q_meronymy_bfs(spark, sf_dir):
    """``memberFilter`` meronymy BFS (src/query.cpp:1266-1336) — the
    has(duck, feather) traversal: suppliers climb to their nation class
    (reverse Instance), reach the nation's parts (forward Part), climb
    Type to the region and reach its parts too; Similar edges are in
    the hard-skip set and must not contribute."""
    from netbase_spark.operators.query_ops import bfs_distances, member_edges

    triples = _meronymy_triples(spark, sf_dir)
    sources = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 10)
        .select(_sk("s_suppkey", "S").alias("node"))
    )
    return bfs_distances(member_edges(triples), sources, max_depth=4).select(
        "root", "node", "depth"
    )


ORACLE_MERONYMY = """
    WITH RECURSIVE edges AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS src,
               'N' || CAST(s_nationkey AS VARCHAR) AS dst FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR),
               'res' || CAST(n_nationkey AS VARCHAR) FROM nation
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR),
               'R' || CAST(n_regionkey AS VARCHAR) FROM nation
        UNION ALL
        SELECT 'R' || CAST(r_regionkey AS VARCHAR),
               'asset' || CAST(r_regionkey AS VARCHAR) FROM region
    ), bfs AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS root,
               'S' || CAST(s_suppkey AS VARCHAR) AS node, 0 AS depth
        FROM supplier WHERE s_suppkey <= 10
        UNION ALL
        SELECT b.root, e.dst, b.depth + 1
        FROM bfs b JOIN edges e ON b.node = e.src WHERE b.depth < 4
    )
    SELECT root, node, CAST(MIN(depth) AS INT) AS depth
    FROM bfs GROUP BY root, node
"""


# ---------------------------------------------------------------------------
# countInstances
# ---------------------------------------------------------------------------


def q_count_instances(spark, sf_dir):
    """``countInstances`` (src/query.cpp:1174-1187): direct instance
    count vs transitive count through the isA closure — regions count
    their own 'gov' instance plus every supplier of their nations."""
    from netbase_spark.operators.query_ops import count_instances

    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    triples = (
        supplier.select(
            _sk("s_nationkey", "N").alias("subj"),
            F.lit(INSTANCE).alias("rel"),
            _sk("s_suppkey", "S").alias("obj"),
        )
        .unionByName(
            region.select(
                _sk("r_regionkey", "R").alias("subj"),
                F.lit(INSTANCE).alias("rel"),
                _sk("r_regionkey", "gov").alias("obj"),
            )
        )
        .unionByName(
            nation.select(
                _sk("n_nationkey", "N").alias("subj"),
                F.lit(TYPE).alias("rel"),
                _sk("n_regionkey", "R").alias("obj"),
            )
        )
    )
    return count_instances(triples)


ORACLE_COUNT_INSTANCES = """
    WITH inst AS (
        SELECT 'N' || CAST(s_nationkey AS VARCHAR) AS cls,
               'S' || CAST(s_suppkey AS VARCHAR) AS i FROM supplier
        UNION ALL
        SELECT 'R' || CAST(r_regionkey AS VARCHAR),
               'gov' || CAST(r_regionkey AS VARCHAR) FROM region
    ), anc AS (
        SELECT 'N' || CAST(n_nationkey AS VARCHAR) AS node,
               'R' || CAST(n_regionkey AS VARCHAR) AS anc FROM nation
    ), direct AS (
        SELECT cls AS node, CAST(count(DISTINCT i) AS BIGINT) AS n_direct
        FROM inst GROUP BY cls
    ), trans AS (
        SELECT node, CAST(count(DISTINCT i) AS BIGINT) AS n_transitive FROM (
            SELECT cls AS node, i FROM inst
            UNION ALL
            SELECT a.anc, inst.i FROM inst JOIN anc a ON inst.cls = a.node
        ) GROUP BY node
    )
    SELECT coalesce(d.node, t.node) AS node,
           coalesce(n_direct, 0) AS n_direct,
           coalesce(n_transitive, 0) AS n_transitive
    FROM direct d FULL JOIN trans t ON d.node = t.node
"""


# ---------------------------------------------------------------------------
# sortTopics ordered ancestor list
# ---------------------------------------------------------------------------


def q_sort_topics(spark, sf_dir):
    """``sortTopics`` (src/query.cpp:2105-2124): the ORDERED ancestor
    list per node, furthest first — each supplier's region at rank 1,
    nation at rank 2."""
    from netbase_spark.operators.query_ops import sort_topics

    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = supplier.select(
        _sk("s_suppkey", "S").alias("src"), _sk("s_nationkey", "N").alias("dst")
    ).unionByName(
        nation.select(
            _sk("n_nationkey", "N").alias("src"),
            _sk("n_regionkey", "R").alias("dst"),
        )
    )
    nodes = supplier.select(_sk("s_suppkey", "S").alias("node"))
    return sort_topics(nodes, edges)


ORACLE_SORT_TOPICS = """
    WITH seen AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS node,
               'N' || CAST(s_nationkey AS VARCHAR) AS cur, 1 AS depth
        FROM supplier
        UNION ALL
        SELECT 'S' || CAST(s_suppkey AS VARCHAR),
               'R' || CAST(n_regionkey AS VARCHAR), 2
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT node, CAST(row_number() OVER (
               PARTITION BY node ORDER BY depth DESC, cur ASC) AS INT) AS rank,
           cur AS topic
    FROM seen
"""


# ---------------------------------------------------------------------------
# findPath / reconstructPath
# ---------------------------------------------------------------------------


def q_find_path(spark, sf_dir):
    """``findPath`` + ``reconstructPath`` (src/query.cpp:1737-1790,
    1477-1496): the reconstructed shortest node sequence S5 -> nation ->
    region, returned as (pos, node) rows."""
    from netbase_spark.operators.query_ops import find_path

    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = supplier.select(
        _sk("s_suppkey", "S").alias("src"), _sk("s_nationkey", "N").alias("dst")
    ).unionByName(
        nation.select(
            _sk("n_nationkey", "N").alias("src"),
            _sk("n_regionkey", "R").alias("dst"),
        )
    )
    dst = (
        supplier.where(F.col("s_suppkey") == 5)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(_sk("n_regionkey", "R").alias("d"))
        .first()["d"]
    )
    path = find_path(edges, "S5", dst, max_depth=4) or []
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(path)], "pos int, node string"
    )


ORACLE_FIND_PATH = """
    SELECT CAST(0 AS INT) AS pos, 'S5' AS node
    UNION ALL
    SELECT CAST(1 AS INT), 'N' || CAST(s_nationkey AS VARCHAR)
    FROM supplier WHERE s_suppkey = 5
    UNION ALL
    SELECT CAST(2 AS INT), 'R' || CAST(n_regionkey AS VARCHAR)
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey = 5
"""


# ---------------------------------------------------------------------------
# parseProperties property questions
# ---------------------------------------------------------------------------


def q_property_question(spark, sf_dir):
    """``parseProperties`` + the retry ladder (src/query.cpp:1847-1898):
    'P of T' parses and answers directly; the dotted 'T.P' form with no
    direct rows falls back to the INVERSE direction flipped."""
    from netbase_spark.functions.query_lang import property_question
    from netbase_spark.operators.mutate import rel_id_for

    supplier = _t(spark, sf_dir, "supplier")
    triples = supplier.select(
        F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("subj"),
        F.lit(rel_id_for("supplier")).alias("rel"),
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("obj"),
    )
    direct = property_question("supplier of n3", triples).withColumn(
        "q", F.lit("direct")
    )
    inverse = property_question("s7.supplier", triples).withColumn(
        "q", F.lit("inverse")
    )
    return direct.unionByName(inverse).select("q", "name", "value")


ORACLE_PROPERTY_QUESTION = """
    SELECT 'direct' AS q, 'n3' AS name, 's' || CAST(s_suppkey AS VARCHAR) AS "value"
    FROM supplier WHERE s_nationkey = 3
    UNION ALL
    SELECT 'inverse', 's7', 'n' || CAST(s_nationkey AS VARCHAR)
    FROM supplier WHERE s_suppkey = 7
"""


# ---------------------------------------------------------------------------
# reified statement ids
# ---------------------------------------------------------------------------


def q_reify_ids(spark, sf_dir):
    """``reify(s)`` (src/netbase.cpp:352-363): md5 statement-id
    surrogate over the (subj, rel, obj) key, usable as a subject FK for
    qualifier facts."""
    from netbase_spark.operators.materialize import reify

    return reify(_type_triples(spark, sf_dir)).select(
        "subj", "rel", "obj", "statement_id"
    )


ORACLE_REIFY = """
    SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj, CAST(-3 AS INT) AS rel,
           'N' || CAST(s_nationkey AS VARCHAR) AS obj,
           md5('S' || CAST(s_suppkey AS VARCHAR) || '|-3|N'
               || CAST(s_nationkey AS VARCHAR)) AS statement_id
    FROM supplier
    UNION ALL
    SELECT 'N' || CAST(n_nationkey AS VARCHAR), CAST(-3 AS INT),
           'R' || CAST(n_regionkey AS VARCHAR),
           md5('N' || CAST(n_nationkey AS VARCHAR) || '|-3|R'
               || CAST(n_regionkey AS VARCHAR))
    FROM nation
"""


# ---------------------------------------------------------------------------
# mergeAll star edges
# ---------------------------------------------------------------------------


def q_merge_all(spark, sf_dir):
    """``mergeAll`` (src/netbase.cpp:2491-2497): every entity sharing a
    surface form (first two words of the part name) merges into the
    min-key hub — emitted as star edges feeding connected_components."""
    from netbase_spark.operators.canonicalize import merge_all_edges
    from netbase_spark.normalize import norm_name_col

    part = _t(spark, sf_dir, "part")
    two_words = F.concat_ws(" ", F.slice(F.split(F.col("p_name"), " "), 1, 2))
    aliases = part.select(
        norm_name_col(two_words).alias("name_norm"),
        _sk("p_partkey", "P").alias("key"),
    )
    return merge_all_edges(aliases)


ORACLE_MERGE_ALL = f"""
    WITH a AS (
        SELECT DISTINCT
            {NORM_SQL.format(c="(split_part(p_name, ' ', 1) || ' ' || split_part(p_name, ' ', 2))")} AS name_norm,
            'P' || CAST(p_partkey AS VARCHAR) AS key
        FROM part
    ), hub AS (
        SELECT name_norm, min(key) AS src FROM a GROUP BY name_norm
    )
    SELECT h.src, a.key AS dst FROM a JOIN hub h USING (name_norm)
    WHERE a.key <> h.src
"""


# ---------------------------------------------------------------------------
# SEO index conflict resolution
# ---------------------------------------------------------------------------


def q_seo_conflict(spark, sf_dir):
    """``buildSeoIndex`` conflict resolution by degree
    (src/netbase.cpp:2555-2593, 2564-2569): one row per slug; on a slug
    collision the higher-degree key wins, ties break on min key."""
    from netbase_spark.operators.gazetteer import seo_index

    part = _t(spark, sf_dir, "part")
    two_words = F.concat_ws(" ", F.slice(F.split(F.col("p_name"), " "), 1, 2))
    labels = part.select(
        _sk("p_partkey", "P").alias("key"), two_words.alias("label")
    )
    degrees = part.select(
        _sk("p_partkey", "P").alias("node"),
        (F.col("p_partkey") % 17).cast("long").alias("degree"),
    )
    return seo_index(labels, degrees)


ORACLE_SEO = """
    WITH slugs AS (
        SELECT DISTINCT
            replace(lower(trim(split_part(p_name, ' ', 1) || ' '
                || split_part(p_name, ' ', 2))), ' ', '-') AS slug,
            'P' || CAST(p_partkey AS VARCHAR) AS key,
            CAST(p_partkey % 17 AS BIGINT) AS degree
        FROM part
    )
    SELECT slug, key, degree FROM (
        SELECT *, row_number() OVER (
            PARTITION BY slug ORDER BY degree DESC, key ASC) AS rn
        FROM slugs
    ) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def q_ann_ivf(spark, sf_dir):
    """IVF similarity search (coarse k-means quantizer + per-cell
    posting lists — the second ANN scale path next to LSH buckets).
    Probing ALL cells (nprobe == n_cells) is exhaustive, so the result
    must equal the brute-force top-10 — the DuckDB oracle; the pruned
    nprobe=1 path is covered by the recall unit test."""
    from netbase_spark.operators.dedup import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ivf_topk(emb, query_id=0, k=10, n_cells=4, nprobe=4, iters=2)


ORACLE_ANN_IVF = """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           CAST(floor(list_cosine_similarity(embedding, qv) * 10000) AS BIGINT) AS sim_e4
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY sim_e4 DESC, vec_id ASC
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# getSingleton / getNew node allocation
# ---------------------------------------------------------------------------


def q_singleton_nodes(spark, sf_dir):
    """``getSingleton`` get-or-create (src/netbase.cpp:1180-1193; used
    by importers via the ``getSingletons`` switch, src/import.cpp:
    924-929): present names are untouched, each missing name gets one
    (name, Type, type) row — idempotent anti-join insert."""
    from netbase_spark.operators.mutate import ensure_singletons
    from netbase_spark.relations import TYPE

    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    triples = nation.select(
        F.lower(_sk("n_nationkey", "N")).alias("subj"),
        F.lit(TYPE).alias("rel"),
        F.lower(_sk("n_regionkey", "R")).alias("obj"),
        F.lit("base").alias("rule"),
        F.lit(None).cast("string").alias("doc_id"),
    )
    requested = customer.select(F.col("c_mktsegment").alias("name")).unionByName(
        nation.select(F.lower(_sk("n_nationkey", "N")).alias("name"))
    )
    out = ensure_singletons(triples, requested, type_name="Market Segment")
    return out.select("subj", "rel", "obj", "rule")


ORACLE_SINGLETON = f"""
    WITH base AS (
        SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS subj, CAST(-3 AS INT) AS rel,
               'r' || CAST(n_regionkey AS VARCHAR) AS obj, 'base' AS rule
        FROM nation
    ), nodes AS (
        SELECT subj AS n FROM base UNION SELECT obj FROM base
    ), requested AS (
        SELECT DISTINCT {NORM_SQL.format(c="c_mktsegment")} AS name FROM customer
        UNION
        SELECT DISTINCT 'n' || CAST(n_nationkey AS VARCHAR) FROM nation
    )
    SELECT subj, rel, obj, rule FROM base
    UNION ALL
    SELECT name, CAST(-3 AS INT), 'market segment', 'singleton'
    FROM requested WHERE name NOT IN (SELECT n FROM nodes)
"""


def q_getnew_alloc(spark, sf_dir):
    """``getNew`` always-fresh allocation (src/netbase.cpp:1168-1173):
    ambiguous surface forms are distinct nodes — the n-th node sharing
    a base name gets ``name~n``, ordinals continuing after existing
    same-named nodes ('building' is taken, so its first allocation is
    'building~2')."""
    from netbase_spark.operators.mutate import get_new_names
    from netbase_spark.relations import TYPE

    customer = _t(spark, sf_dir, "customer")
    triples = spark.createDataFrame(
        [("building", TYPE, "structure", "base", None)],
        "subj string, rel int, obj string, rule string, doc_id string",
    )
    names = customer.where(F.col("c_custkey") <= 40).select(
        F.col("c_mktsegment").alias("name")
    )
    return get_new_names(triples, names)


ORACLE_GETNEW = f"""
    WITH req AS (
        SELECT {NORM_SQL.format(c="c_mktsegment")} AS name
        FROM customer WHERE c_custkey <= 40
    ), taken AS (
        SELECT 'building' AS base, 1 AS cnt UNION ALL SELECT 'structure', 1
    ), ranked AS (
        SELECT name,
               row_number() OVER (PARTITION BY name ORDER BY name)
                   + COALESCE(cnt, 0) AS ord
        FROM req LEFT JOIN taken ON req.name = taken.base
    )
    SELECT name,
           CASE WHEN ord = 1 THEN name
                ELSE name || '~' || CAST(ord AS VARCHAR) END AS allocated
    FROM ranked
"""


def q_statement_nr(spark, sf_dir):
    """``getStatementNr`` instance-gap ordering (src/netbase.cpp:
    686-758; testInstanceLogic src/tests.cpp:804-816): per subject,
    property statements rank before Instance edges."""
    from netbase_spark.operators.materialize import statement_nr
    from netbase_spark.relations import INSTANCE, TYPE

    supplier = _t(spark, sf_dir, "supplier")
    triples = (
        supplier.select(
            _sk("s_suppkey", "S").alias("subj"),
            F.lit(INSTANCE).alias("rel"),
            _sk("s_suppkey", "I").alias("obj"),
        )
        .unionByName(
            supplier.select(
                _sk("s_suppkey", "S").alias("subj"),
                F.lit(TYPE).alias("rel"),
                _sk("s_nationkey", "N").alias("obj"),
            )
        )
        .unionByName(
            supplier.select(
                _sk("s_suppkey", "S").alias("subj"),
                F.lit(7).alias("rel"),
                F.col("s_name").alias("obj"),
            )
        )
    )
    return statement_nr(triples)


ORACLE_STATEMENT_NR = """
    WITH t AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj, CAST(-4 AS INT) AS rel,
               'I' || CAST(s_suppkey AS VARCHAR) AS obj
        FROM supplier
        UNION ALL
        SELECT 'S' || CAST(s_suppkey AS VARCHAR), CAST(-3 AS INT),
               'N' || CAST(s_nationkey AS VARCHAR)
        FROM supplier
        UNION ALL
        SELECT 'S' || CAST(s_suppkey AS VARCHAR), CAST(7 AS INT), s_name
        FROM supplier
    )
    SELECT subj, rel, obj,
           CAST(row_number() OVER (
               PARTITION BY subj
               ORDER BY CASE WHEN rel = -4 THEN 1 ELSE 0 END, rel, obj
           ) AS INT) AS nr
    FROM t
"""


def q_image_triples(spark, sf_dir):
    """``importImageTripels`` (src/import.cpp:225-267) + ``formatImage``
    (src/netbase.cpp:2455-2467): '%s %*s %s' line scan, first-image-
    per-title wins, (abstract(title), wiki_image, abstract(image))
    triples plus the md5 commons URL for each kept image."""
    from netbase_spark.operators.media import format_image, import_image_triples

    part = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    title = F.concat(F.lit("P"), pk.cast("string"))
    lines = part.select(
        F.concat(title, F.lit(" x Img_"), pk.cast("string"), F.lit("a.jpg")).alias(
            "value"
        ),
        (pk * 2).alias("ord"),
    ).unionByName(
        part.select(
            F.concat(
                title, F.lit(" x Img_"), pk.cast("string"), F.lit("b.jpg")
            ).alias("value"),
            (pk * 2 + 1).alias("ord"),
        )
    )
    out = import_image_triples(lines, order_col="ord")
    return out.withColumn("url", format_image(F.col("obj")))


# DuckDB twin: first image per title by line order, then the commons
# URL over the normalized name with spaces back to underscores
ORACLE_IMAGE_TRIPLES = f"""
    WITH lines AS (
        SELECT 'P' || CAST(p_partkey AS VARCHAR) AS t,
               'Img_' || CAST(p_partkey AS VARCHAR) || 'a.jpg' AS img,
               p_partkey * 2 AS ord
        FROM part
        UNION ALL
        SELECT 'P' || CAST(p_partkey AS VARCHAR),
               'Img_' || CAST(p_partkey AS VARCHAR) || 'b.jpg',
               p_partkey * 2 + 1
        FROM part
    ), normed AS (
        SELECT {NORM_SQL.format(c="t")} AS subj,
               {NORM_SQL.format(c="img")} AS obj, ord
        FROM lines
    ), first AS (
        SELECT subj, min_by(obj, ord) AS obj FROM normed GROUP BY subj
    ), named AS (
        SELECT subj, obj, replace(obj, ' ', '_') AS n FROM first
    )
    SELECT subj, {MD5_REL_SQL.format(name="'wiki image'")} AS rel, obj,
           'http://upload.wikimedia.org/wikipedia/commons/'
               || substr(md5(n), 1, 1) || '/' || substr(md5(n), 1, 2) || '/' || n
               AS url
    FROM named
"""



# ---------------------------------------------------------------------------
# collectInstances rebuild
# ---------------------------------------------------------------------------


def q_collect_instances(spark, sf_dir):
    """``collectInstances`` global rebuild (src/init.cpp:504-524;
    console ``:ci``): every node whose id differs from its abstract
    form (normalized name, ``~ordinal`` allocation suffix cut) gains an
    (abstract, Instance, node) edge; idempotent upsert over the
    existing graph."""
    from netbase_spark.operators.extraction import collect_instances

    customer = _t(spark, sf_dir, "customer")
    triples = customer.where(F.col("c_custkey") <= 300).select(
        F.when(
            F.col("c_custkey") % 3 == 0, F.concat(F.col("c_name"), F.lit("~2"))
        )
        .otherwise(F.col("c_name"))
        .alias("subj"),
        F.lit(TYPE).alias("rel"),
        F.col("c_mktsegment").alias("obj"),
        F.lit("base").alias("rule"),
        F.lit(None).cast("string").alias("doc_id"),
    )
    return collect_instances(triples).select("subj", "rel", "obj", "rule")


_ABSTRACT_SQL = NORM_SQL.format(c="regexp_replace(node, '~\\d+$', '')")

ORACLE_COLLECT_INSTANCES = f"""
    WITH base AS (
        SELECT CASE WHEN c_custkey % 3 = 0 THEN c_name || '~2' ELSE c_name END AS subj,
               CAST(-3 AS INT) AS rel, c_mktsegment AS obj, 'base' AS rule
        FROM customer WHERE c_custkey <= 300
    ), nodes AS (
        SELECT subj AS node FROM base UNION SELECT obj FROM base
    ), edges AS (
        SELECT {_ABSTRACT_SQL} AS subj,
               CAST(-4 AS INT) AS rel, node AS obj, 'collect' AS rule
        FROM nodes
    )
    SELECT subj, rel, obj, rule FROM base
    UNION ALL
    SELECT subj, rel, obj, rule FROM edges
    WHERE length(subj) > 0 AND subj != obj
      AND NOT EXISTS (
          SELECT 1 FROM base b
          WHERE b.subj = edges.subj AND b.rel = edges.rel AND b.obj = edges.obj
      )
"""


# ---------------------------------------------------------------------------
# rename cascade / update / gazetteer expansion / findMatch bare term
# ---------------------------------------------------------------------------


def q_rename_cascade(spark, sf_dir):
    """``setLabel``/``setName`` rename cascade (src/netbase.cpp:
    2385-2427): renamed entities feed the alias-table rebuild; the
    rename itself is one broadcast left join."""
    from netbase_spark.operators.gazetteer import rename_nodes

    nation = _t(spark, sf_dir, "nation")
    entities = nation.select(
        F.col("n_nationkey").alias("key"), F.col("n_name").alias("name")
    )
    renames = nation.where(F.col("n_nationkey") % 5 == 0).select(
        F.col("n_nationkey").alias("key"),
        F.concat(F.lower("n_name"), F.lit(" renamed")).alias("new_name"),
    )
    return rename_nodes(entities, renames).select("key", "name")


ORACLE_RENAME = """
    SELECT n_nationkey AS key,
           CASE WHEN n_nationkey % 5 = 0 THEN lower(n_name) || ' renamed'
                ELSE n_name END AS name
    FROM nation
"""


def q_update_field(spark, sf_dir):
    """``update(query)`` (src/query.cpp:1824-1843): SET status =
    'Blocked' for every negative-balance supplier — anti-join drop of
    the old single-valued rows + union insert."""
    from netbase_spark.operators.mutate import rel_id_for, update_statements

    supplier = _t(spark, sf_dir, "supplier")
    triples = supplier.select(
        _sk("s_suppkey", "S").alias("subj"),
        F.lit(rel_id_for("status")).alias("rel"),
        F.lit("active").alias("obj"),
        F.lit("base").alias("rule"),
        F.lit(None).cast("string").alias("doc_id"),
    )
    targets = (
        supplier.where(F.col("s_acctbal") < 0)
        .select(_sk("s_suppkey", "S").alias("node"))
        .distinct()
    )
    out = update_statements(triples, targets, "status", "Blocked")
    return out.select("subj", "rel", "obj", "rule")


_STATUS_REL = MD5_REL_SQL.format(name="'status'")

ORACLE_UPDATE = f"""
    WITH targets AS (
        SELECT DISTINCT 'S' || CAST(s_suppkey AS VARCHAR) AS node
        FROM supplier WHERE s_acctbal < 0
    )
    SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj, {_STATUS_REL} AS rel,
           'active' AS obj, 'base' AS rule
    FROM supplier
    WHERE 'S' || CAST(s_suppkey AS VARCHAR) NOT IN (SELECT node FROM targets)
    UNION ALL
    SELECT node, {_STATUS_REL}, 'blocked', 'update' FROM targets
"""


def q_prefix_aliases(spark, sf_dir):
    """``addSubword``/``addSubCategories`` gazetteer expansion
    (src/import.cpp:740-802): 2-word prefixes of multi-word part names
    + per-segment rows of '/'-joined category paths."""
    from netbase_spark.operators.gazetteer import (
        category_alias_rows,
        prefix_alias_rows,
    )

    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 2000)
    labels = part.select(
        F.col("p_name").alias("label"), _sk("p_partkey", "P").alias("key")
    )
    pref = prefix_alias_rows(labels, k=1)
    cats = category_alias_rows(
        part.select(
            F.concat_ws("/", "p_type", "p_brand").alias("label"),
            _sk("p_partkey", "P").alias("key"),
        )
    )
    return pref.unionByName(cats).select("name_norm", "key", "source")


_NN_PART = NORM_SQL.format(c="p_name")
_NN_SEG = NORM_SQL.format(c="seg")

ORACLE_PREFIX_ALIASES = f"""
    WITH lbl AS (
        SELECT {_NN_PART} AS nn, 'P' || CAST(p_partkey AS VARCHAR) AS key
        FROM part WHERE p_partkey <= 2000
    )
    SELECT DISTINCT array_to_string(list_slice(string_split(nn, ' '), 1, 1), ' ')
               AS name_norm,
           key, 'prefix' AS source
    FROM lbl
    WHERE len(string_split(nn, ' ')) > 1
      AND length(array_to_string(list_slice(string_split(nn, ' '), 1, 1), ' ')) > 0
    UNION ALL
    SELECT DISTINCT {_NN_SEG} AS name_norm, key, 'category' AS source
    FROM (
        SELECT unnest(string_split(p_type || '/' || p_brand, '/')) AS seg,
               'P' || CAST(p_partkey AS VARCHAR) AS key
        FROM part WHERE p_partkey <= 2000
    )
    WHERE length({_NN_SEG}) > 0
"""


def q_findmatch_bare(spark, sf_dir):
    """``findMatch`` bare where-term ("Karin with Rufnummer",
    src/query.cpp:1506-1533; testSqlDe src/tests.cpp:1475-1482): keep
    the instances that HAVE the property, projected wide."""
    from netbase_spark.functions.query_lang import run_graph_query
    from netbase_spark.operators.mutate import rel_id_for
    from netbase_spark.relations import INSTANCE

    customer = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    inst = customer.select(
        F.lit("customer").alias("subj"),
        F.lit(INSTANCE).alias("rel"),
        _sk("c_custkey", "C").alias("obj"),
    )
    phones = customer.where(F.col("c_custkey") % 3 == 0).select(
        _sk("c_custkey", "C").alias("subj"),
        F.lit(rel_id_for("segment")).alias("rel"),
        F.col("c_mktsegment").alias("obj"),
    )
    out = run_graph_query("customer with segment", inst.unionByName(phones))
    return out.select("name", "segment")


ORACLE_FINDMATCH = """
    SELECT 'C' || CAST(c_custkey AS VARCHAR) AS name, MIN(c_mktsegment) AS segment
    FROM customer
    WHERE c_custkey <= 500 AND c_custkey % 3 = 0
    GROUP BY 1
"""


def q_dup_label_edges(spark, sf_dir):
    """``importLabels`` duplicate-label conflict (src/import.cpp:
    1549-1560): later different spellings of a key link to its primary
    label via (primary, Label, alt) statements — the edges the sameAs
    CC consumes."""
    from netbase_spark.operators.gazetteer import duplicate_label_edges

    customer = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 400)
    key = _sk("c_custkey", "C")
    labels = (
        customer.select(
            key.alias("key"),
            F.col("c_name").alias("label"),
            F.lit("label").alias("label_type"),
            F.lit("en").alias("lang"),
        )
        .unionByName(
            customer.select(
                key.alias("key"),
                F.col("c_mktsegment").alias("label"),
                F.lit("altLabel").alias("label_type"),
                F.lit("en").alias("lang"),
            )
        )
        .unionByName(
            customer.select(
                key.alias("key"),
                F.concat(F.col("c_name"), F.lit(" jr")).alias("label"),
                F.lit("altLabel").alias("label_type"),
                F.lit("en").alias("lang"),
            )
        )
    )
    return duplicate_label_edges(labels).select("subj", "rel", "obj", "rule")


_NN_CNAME = NORM_SQL.format(c="c_name")
_NN_SEG2 = NORM_SQL.format(c="c_mktsegment")
_NN_JR = NORM_SQL.format(c="c_name || ' jr'")

ORACLE_DUP_LABELS = f"""
    WITH lbl AS (
        SELECT 'C' || CAST(c_custkey AS VARCHAR) AS key, {_NN_CNAME} AS nn,
               0 AS pri, 'en' AS lang
        FROM customer WHERE c_custkey <= 400
        UNION ALL
        SELECT 'C' || CAST(c_custkey AS VARCHAR), {_NN_SEG2}, 1, 'en'
        FROM customer WHERE c_custkey <= 400
        UNION ALL
        SELECT 'C' || CAST(c_custkey AS VARCHAR), {_NN_JR}, 1, 'en'
        FROM customer WHERE c_custkey <= 400
    ), g AS (
        SELECT key, nn, MIN(pri) AS pri, MIN(lang) AS lang
        FROM lbl WHERE length(nn) > 0 GROUP BY key, nn
    ), r AS (
        SELECT key, nn, row_number() OVER (
            PARTITION BY key ORDER BY pri, lang, nn) AS rk
        FROM g
    ), p AS (
        SELECT key, nn AS prim FROM r WHERE rk = 1
    )
    SELECT p.prim AS subj, CAST(-38 AS INT) AS rel, r.nn AS obj,
           'dup_label' AS rule
    FROM r JOIN p USING (key) WHERE r.rk > 1 AND r.nn != p.prim
"""


def q_enriched_entities(spark, sf_dir):
    """Enriched-entity record (src/webserver.cpp:95-527; JSON
    enrichment 396-418): (node, class, topic, degree, seo) — the
    getClass chain, getTopic furthest ancestor, statementCount degree
    prior and SEO slug, composed as one derived table."""
    from netbase_spark.operators.materialize import enrich_entities

    t = _type_triples(spark, sf_dir).select(
        "subj", "rel", "obj",
        F.lit("base").alias("rule"),
        F.lit(None).cast("string").alias("doc_id"),
    )
    nodes = _t(spark, sf_dir, "supplier").select(_sk("s_suppkey", "S").alias("node"))
    return enrich_entities(nodes, t).select(
        "node", "class", "topic", "degree", "seo"
    )


ORACLE_ENRICHED = """
    WITH t AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj,
               'N' || CAST(s_nationkey AS VARCHAR) AS obj
        FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR),
               'R' || CAST(n_regionkey AS VARCHAR)
        FROM nation
    ), deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT subj AS node FROM t UNION ALL SELECT obj FROM t)
        GROUP BY node
    )
    SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS node,
           'N' || CAST(s_nationkey AS VARCHAR) AS class,
           (SELECT 'R' || CAST(n_regionkey AS VARCHAR) FROM nation
             WHERE n_nationkey = s_nationkey) AS topic,
           deg.degree,
           's' || CAST(s_suppkey AS VARCHAR) AS seo
    FROM supplier
    JOIN deg ON deg.node = 'S' || CAST(s_suppkey AS VARCHAR)
"""

EXT2_QUERIES = {
    "ann_ivf": q_ann_ivf,
    "singleton_nodes": q_singleton_nodes,
    "getnew_alloc": q_getnew_alloc,
    "statement_nr": q_statement_nr,
    "image_triples": q_image_triples,
    "collect_instances": q_collect_instances,
    "rename_cascade": q_rename_cascade,
    "update_field": q_update_field,
    "prefix_aliases": q_prefix_aliases,
    "findmatch_bare": q_findmatch_bare,
    "dup_label_edges": q_dup_label_edges,
    "enriched_entities": q_enriched_entities,
    "pattern_semantic": q_pattern_semantic,
    "pattern_subproperty": q_pattern_subproperty,
    "learn_roundtrip": q_learn_roundtrip,
    "xml_triples": q_xml_triples,
    "yago_import": q_yago_import,
    "wordnet_import": q_wordnet_import,
    "wikidata_stages": q_wikidata_stages,
    "meronymy_bfs": q_meronymy_bfs,
    "count_instances": q_count_instances,
    "sort_topics": q_sort_topics,
    "find_path": q_find_path,
    "property_question": q_property_question,
    "reify_ids": q_reify_ids,
    "merge_all": q_merge_all,
    "seo_conflict": q_seo_conflict,
}

EXT2_ORACLES = {
    "ann_ivf": ORACLE_ANN_IVF,
    "singleton_nodes": ORACLE_SINGLETON,
    "getnew_alloc": ORACLE_GETNEW,
    "statement_nr": ORACLE_STATEMENT_NR,
    "image_triples": ORACLE_IMAGE_TRIPLES,
    "collect_instances": ORACLE_COLLECT_INSTANCES,
    "rename_cascade": ORACLE_RENAME,
    "update_field": ORACLE_UPDATE,
    "prefix_aliases": ORACLE_PREFIX_ALIASES,
    "findmatch_bare": ORACLE_FINDMATCH,
    "dup_label_edges": ORACLE_DUP_LABELS,
    "enriched_entities": ORACLE_ENRICHED,
    "pattern_semantic": ORACLE_PATTERN_SEMANTIC,
    "pattern_subproperty": ORACLE_PATTERN_SUBPROPERTY,
    "learn_roundtrip": ORACLE_LEARN,
    "xml_triples": ORACLE_XML,
    "yago_import": ORACLE_YAGO,
    "wordnet_import": ORACLE_WORDNET,
    "wikidata_stages": ORACLE_WIKIDATA,
    "meronymy_bfs": ORACLE_MERONYMY,
    "count_instances": ORACLE_COUNT_INSTANCES,
    "sort_topics": ORACLE_SORT_TOPICS,
    "find_path": ORACLE_FIND_PATH,
    "property_question": ORACLE_PROPERTY_QUESTION,
    "reify_ids": ORACLE_REIFY,
    "merge_all": ORACLE_MERGE_ALL,
    "seo_conflict": ORACLE_SEO,
}
