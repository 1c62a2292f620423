"""Third batch of driver-contract queries: geodb import, manual
:merge corrections, and the isA node-set wrapper.

Same conventions as contract_ext / contract_ext2: every query builds
deterministic input from the sf-dir parquet tables, routes through the
package operator it certifies, and has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from netbase_spark.relations import INSTANCE, PART, TYPE


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sk(col, prefix):
    return F.concat(F.lit(prefix), F.col(col).cast("string"))


def _type_triples(spark, sf_dir):
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
# importGeoDB (cities1000 layout -> include-list melt)
# ---------------------------------------------------------------------------


def q_geodb_import(spark, sf_dir):
    """``importGeoDB`` (src/import.cpp:2330-2333): the geonames
    19-column cities layout projected to the include list (latitude,
    longitude, population, elevation, countrycode) and melted to
    typed (subj, pred, obj_text, obj_num) cells — subjects from
    asciiname (nameRowNr=2).  Cities synthesized from the nation
    table; all cells integral strings so Spark/DuckDB format alike."""
    from netbase_spark.sources.router import GEODB_COLUMNS, geodb_melt

    nation = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    cols = {
        "geonameid": k.cast("string"),
        "name": F.col("n_name"),
        "asciiname": F.concat(F.lit("city_"), k.cast("string")),
        "alternatenames": F.lit(None).cast("string"),
        "latitude": (k * 3).cast("string"),
        "longitude": (k * 7 - 100).cast("string"),
        "featureclass": F.lit("P"),
        "featurecode": F.lit("PPL"),
        "countrycode": F.concat(F.lit("C"), F.col("n_regionkey").cast("string")),
        "cc2": F.lit(None).cast("string"),
        "admin1code": F.lit(None).cast("string"),
        "admin2code": F.lit(None).cast("string"),
        "admin3code": F.lit(None).cast("string"),
        "admin4code": F.lit(None).cast("string"),
        "population": (k * 1000 + 17).cast("string"),
        "elevation": (k * 10).cast("string"),
        "gtopo30": F.lit("0"),
        "timezone": F.lit("UTC"),
        "modificationdate": F.lit("2016-01-04"),
    }
    cities = nation.select(*[v.alias(c) for c, v in cols.items()])
    assert list(cities.columns) == GEODB_COLUMNS
    return geodb_melt(cities)


ORACLE_GEODB = """
    SELECT 'city_' || CAST(n_nationkey AS VARCHAR) AS subj,
           'latitude' AS pred,
           CAST(n_nationkey * 3 AS VARCHAR) AS obj_text,
           CAST(n_nationkey * 3 AS DOUBLE) AS obj_num
    FROM nation
    UNION ALL
    SELECT 'city_' || CAST(n_nationkey AS VARCHAR), 'longitude',
           CAST(n_nationkey * 7 - 100 AS VARCHAR),
           CAST(n_nationkey * 7 - 100 AS DOUBLE)
    FROM nation
    UNION ALL
    SELECT 'city_' || CAST(n_nationkey AS VARCHAR), 'countrycode',
           'C' || CAST(n_regionkey AS VARCHAR), CAST(NULL AS DOUBLE)
    FROM nation
    UNION ALL
    SELECT 'city_' || CAST(n_nationkey AS VARCHAR), 'population',
           CAST(n_nationkey * 1000 + 17 AS VARCHAR),
           CAST(n_nationkey * 1000 + 17 AS DOUBLE)
    FROM nation
    UNION ALL
    SELECT 'city_' || CAST(n_nationkey AS VARCHAR), 'elevation',
           CAST(n_nationkey * 10 AS VARCHAR),
           CAST(n_nationkey * 10 AS DOUBLE)
    FROM nation
"""


# ---------------------------------------------------------------------------
# manual :merge corrections (target id survives, chains resolve)
# ---------------------------------------------------------------------------


def q_manual_merge(spark, sf_dir):
    """``:merge a b`` corrections (src/console.cpp:397-407; mergeNode
    src/netbase.cpp:2610-2638): S(k) with k%10==5 merges into S(k-1),
    k%10==6 into S(k-1) — a two-hop chain, so k%10==6 must land on
    S(k-2).  Target ids survive (not min-rep)."""
    from netbase_spark.operators.canonicalize import manual_merge

    triples = _type_triples(spark, sf_dir).select(
        "subj", "rel", "obj", F.lit("t").alias("rule"), F.lit("d").alias("doc_id")
    )
    sup = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    pairs = sup.where((k % 10).isin(5, 6)).select(
        F.concat(F.lit("S"), (k - 1).cast("string")).alias("target"),
        F.concat(F.lit("S"), k.cast("string")).alias("node"),
    )
    return manual_merge(triples, pairs).select("subj", "rel", "obj")


ORACLE_MANUAL_MERGE = """
    WITH t AS (
        SELECT 'S' || CAST(CASE WHEN s_suppkey % 10 = 5 THEN s_suppkey - 1
                                WHEN s_suppkey % 10 = 6 THEN s_suppkey - 2
                                ELSE s_suppkey END AS VARCHAR) AS subj,
               CAST(-3 AS INT) AS rel,
               'N' || CAST(s_nationkey AS VARCHAR) AS obj
        FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR), CAST(-3 AS INT),
               'R' || CAST(n_regionkey AS VARCHAR)
        FROM nation
    )
    SELECT DISTINCT subj, rel, obj FROM t
"""


# ---------------------------------------------------------------------------
# isA node-set wrapper
# ---------------------------------------------------------------------------


def q_isa_nodes(spark, sf_dir):
    """``isA(fro, to)`` set form (src/netbase.cpp:2344-2363): of all
    graph nodes, which are-a R0 — R0 itself, nations typed into R0,
    and suppliers typed into those nations (closure subsumption)."""
    from netbase_spark.operators.query_ops import is_a_nodes

    triples = _type_triples(spark, sf_dir)
    nodes = (
        triples.select(F.col("subj").alias("node"))
        .union(triples.select(F.col("obj").alias("node")))
        .distinct()
    )
    return is_a_nodes(triples, nodes, "R0")


ORACLE_ISA_NODES = """
    WITH RECURSIVE t AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj,
               'N' || CAST(s_nationkey AS VARCHAR) AS obj FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR),
               'R' || CAST(n_regionkey AS VARCHAR) FROM nation
    ), closure AS (
        SELECT subj AS node, obj AS anc FROM t
        UNION
        SELECT c.node, u.obj FROM closure c JOIN t u ON c.anc = u.subj
    )
    SELECT 'R0' AS node
    UNION
    SELECT node FROM closure WHERE anc = 'R0'
"""


# ---------------------------------------------------------------------------
# multimodal resize + frame-sampling plumbing
# ---------------------------------------------------------------------------


def _decoded_media(spark, sf_dir, kind: str, modulo: int):
    from netbase_spark.operators.media import decode_media

    docs = _t(spark, sf_dir, "documents")
    media = docs.where(F.col("doc_id") % modulo == 0).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(kind).alias("kind"),
        F.concat(
            F.lit("commons/"), F.md5(F.col("doc_id").cast("string")),
            F.lit(".jpg" if kind == "image" else ".webm"),
        ).alias("media_ref"),
    )
    return decode_media(media)


def q_media_resize(spark, sf_dir):
    """Multimodal resize planning (operators/media.py::resize_plan):
    aspect-preserving integer target dims clamped to max_side=256 over
    the decoded image metadata, plus thumb refs."""
    from netbase_spark.operators.media import resize_plan

    return resize_plan(_decoded_media(spark, sf_dir, "image", 2), max_side=256)


ORACLE_MEDIA_RESIZE = """
    WITH media AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               'commons/' || md5(CAST(doc_id AS VARCHAR)) || '.jpg' AS media_ref
        FROM documents WHERE doc_id % 2 = 0
    ), dims AS (
        SELECT doc_id, media_ref,
               CAST(('0x' || substr(md5(media_ref), 1, 4))::BIGINT % 4096 AS INT) AS width,
               CAST(('0x' || substr(md5(media_ref), 5, 4))::BIGINT % 4096 AS INT) AS height
        FROM media
    )
    SELECT doc_id, media_ref, width, height,
           CAST(CASE WHEN greatest(width, height) > 256
                     THEN (width * 256) // greatest(width, height)
                     ELSE width END AS INT) AS new_width,
           CAST(CASE WHEN greatest(width, height) > 256
                     THEN (height * 256) // greatest(width, height)
                     ELSE height END AS INT) AS new_height,
           media_ref || '#256px' AS thumb_ref
    FROM dims
"""


def q_media_frames(spark, sf_dir):
    """Multimodal frame sampling (operators/media.py::sample_frames):
    one row per 60s sample point through each video's decoded duration,
    with #t= fragment refs."""
    from netbase_spark.operators.media import sample_frames

    return sample_frames(
        _decoded_media(spark, sf_dir, "video", 3), every_ms=60000
    )


ORACLE_MEDIA_FRAMES = """
    WITH media AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               'commons/' || md5(CAST(doc_id AS VARCHAR)) || '.webm' AS media_ref
        FROM documents WHERE doc_id % 3 = 0
    ), timed AS (
        SELECT doc_id, media_ref,
               CAST(('0x' || substr(md5(media_ref), 9, 4))::BIGINT % 600000 AS INT) AS duration_ms
        FROM media
    )
    SELECT doc_id, media_ref,
           CAST(unnest(range(0, duration_ms + 1, 60000)) AS INT) AS frame_ms,
           media_ref || '#t=' || CAST(unnest(range(0, duration_ms + 1, 60000)) AS VARCHAR) AS frame_ref
    FROM timed
"""


# ---------------------------------------------------------------------------
# findProperties / getType property retrieval
# ---------------------------------------------------------------------------


def q_find_properties(spark, sf_dir):
    """``findProperties(name, prop)`` with instance expansion
    (operators/query_ops.py::find_properties; src/query.cpp:2295-2350):
    query four nations for Type — direct hits are each nation's region,
    instance expansion pulls the ACTIVE flag typed onto the nation's
    even-keyed suppliers, the inverse retry surfaces the suppliers
    typed INTO the nation.  Direct outranks inverse, top-15 per name."""
    from netbase_spark.operators.query_ops import find_properties
    from netbase_spark.relations import INSTANCE

    supplier = _t(spark, sf_dir, "supplier")
    inst = supplier.select(
        _sk("s_nationkey", "N").alias("subj"),
        F.lit(INSTANCE).alias("rel"),
        _sk("s_suppkey", "S").alias("obj"),
    )
    active = supplier.where(F.col("s_suppkey") % 2 == 0).select(
        _sk("s_suppkey", "S").alias("subj"),
        F.lit(TYPE).alias("rel"),
        F.lit("ACTIVE").alias("obj"),
    )
    triples = _type_triples(spark, sf_dir).unionByName(inst).unionByName(active)
    return find_properties(
        triples, ["N0", "N5", "N7", "N13"], TYPE, result_limit=15
    )


ORACLE_FIND_PROPERTIES = """
    WITH names(name) AS (VALUES ('N0'), ('N5'), ('N7'), ('N13')),
    tri AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj, -3 AS rel,
               'N' || CAST(s_nationkey AS VARCHAR) AS obj FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR), -3,
               'R' || CAST(n_regionkey AS VARCHAR) FROM nation
        UNION ALL
        SELECT 'N' || CAST(s_nationkey AS VARCHAR), -4,
               'S' || CAST(s_suppkey AS VARCHAR) FROM supplier
        UNION ALL
        SELECT 'S' || CAST(s_suppkey AS VARCHAR), -3, 'ACTIVE'
        FROM supplier WHERE s_suppkey % 2 = 0
    ),
    inst AS (
        SELECT n.name, t.obj AS node
        FROM tri t JOIN names n ON t.subj = n.name AND t.rel = -4
    ),
    nodes AS (
        SELECT name, name AS node FROM names
        UNION ALL SELECT name, node FROM inst
    ),
    rel_rows AS (SELECT * FROM tri WHERE rel = -3),
    hits AS (
        SELECT n.name, t.obj AS value, 'direct' AS via
        FROM rel_rows t JOIN nodes n ON t.subj = n.node
        UNION ALL
        SELECT n.name, t.subj AS value, 'inverse' AS via
        FROM rel_rows t JOIN nodes n ON t.obj = n.node
    ),
    merged AS (
        SELECT name, value, MIN(via) AS via FROM hits
        WHERE name <> value GROUP BY name, value
    ),
    ranked AS (
        SELECT name, value, via,
               ROW_NUMBER() OVER (PARTITION BY name ORDER BY via, value) AS rk
        FROM merged
    )
    SELECT name, value, via FROM ranked WHERE rk <= 15
"""


# ---------------------------------------------------------------------------
# getImage fallback chain -> commons URL
# ---------------------------------------------------------------------------


def q_image_lookup(spark, sf_dir):
    """``getImage`` predicate fallback chain + ``formatImage``
    (src/netbase.cpp:2455-2489): every part gets a low-priority
    ``wiki image`` property; every third also a higher-priority
    ``image`` property (http URLs pass through, ``File:`` heads are
    cut) which must win the chain."""
    from netbase_spark.operators.media import get_image
    from netbase_spark.operators.mutate import rel_id_for

    part = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    subj = _sk("p_partkey", "P")
    wiki = part.select(
        subj.alias("subj"),
        F.lit(rel_id_for("wiki image")).alias("rel"),
        F.concat(F.lit("img "), k.cast("string")).alias("obj"),
    )
    primary = part.where(k % 3 == 0).select(
        subj.alias("subj"),
        F.lit(rel_id_for("image")).alias("rel"),
        F.when(
            k % 2 == 0,
            F.concat(F.lit("http://example.com/p"), k.cast("string")),
        )
        .otherwise(F.concat(F.lit("File:primary "), k.cast("string")))
        .alias("obj"),
    )
    return get_image(wiki.unionByName(primary))


ORACLE_IMAGE_LOOKUP = """
    WITH props AS (
        SELECT 'P' || CAST(p_partkey AS VARCHAR) AS subj, 0 AS prio,
               CASE WHEN p_partkey % 2 = 0
                    THEN 'http://example.com/p' || CAST(p_partkey AS VARCHAR)
                    ELSE 'File:primary ' || CAST(p_partkey AS VARCHAR) END AS obj
        FROM part WHERE p_partkey % 3 = 0
        UNION ALL
        SELECT 'P' || CAST(p_partkey AS VARCHAR), 1,
               'img ' || CAST(p_partkey AS VARCHAR)
        FROM part
    ),
    best AS (
        SELECT subj, obj,
               ROW_NUMBER() OVER (PARTITION BY subj ORDER BY prio, obj) AS rk
        FROM props
    ),
    named AS (
        SELECT subj,
               regexp_replace(replace(obj, ' ', '_'), '^.*?File:', '') AS nm
        FROM best WHERE rk = 1
    )
    SELECT subj,
           CASE WHEN starts_with(nm, 'http') THEN nm
                ELSE 'http://upload.wikimedia.org/wikipedia/commons/'
                     || substr(md5(nm), 1, 1) || '/' || substr(md5(nm), 1, 2)
                     || '/' || nm END AS url
    FROM named
"""


def q_winnow_fp(spark, sf_dir):
    """Winnowing rolling-hash document fingerprints (MOSS scheme) over
    the documents table — substring-level dedup keys where whole-doc
    md5 misses partial overlap.  Map-side-only higher-order array
    exprs; distinct (doc_id, fp) rows."""
    from netbase_spark.operators.textstats import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return winnow_fingerprints(docs, k=4, w=5).select(
        F.col("doc_id").cast("long").alias("doc_id"), "fp"
    )


def q_winnow_pairs(spark, sf_dir):
    """Near-dup candidate pairs sharing >= 2 winnowing fingerprints
    (inverted-index self-join on the fingerprint, never all-pairs)."""
    from netbase_spark.operators.textstats import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    fps = winnow_fingerprints(docs, k=4, w=5)
    return winnow_overlap_pairs(fps, min_shared=2).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        "shared",
    )


ORACLE_WINNOW_FPS = """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id,
        list_transform(generate_series(1, len(t) - 3),
          i -> CAST(('0x' || substr(md5(
                 array_to_string(list_slice(t, i, i + 3), ' ')), 1, 8))
               AS BIGINT)) AS h
      FROM toks WHERE len(t) >= 4
    ), wins AS (
      SELECT doc_id,
        CASE WHEN len(h) <= 5 THEN [list_aggregate(h, 'min')]
             ELSE list_transform(generate_series(1, len(h) - 4),
                  j -> list_aggregate(list_slice(h, j, j + 4), 'min'))
        END AS f
      FROM grams
    )
    SELECT DISTINCT doc_id, CAST(fp AS BIGINT) AS fp
    FROM (SELECT doc_id, unnest(f) AS fp FROM wins)
"""

ORACLE_WINNOW_PAIRS = f"""
    WITH fps0 AS ({ORACLE_WINNOW_FPS}),
    fps AS (
      SELECT * FROM fps0
      WHERE fp IN (SELECT fp FROM fps0 GROUP BY fp HAVING count(*) <= 2000)
    )
    SELECT l.doc_id AS a, r.doc_id AS b, CAST(count(*) AS BIGINT) AS shared
    FROM fps l JOIN fps r ON l.fp = r.fp AND l.doc_id < r.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
"""


def q_display_filter(spark, sf_dir):
    """Statement-stored ``include``/``exclude`` view filters
    (src/webserver.cpp:580-620 okStatement; src/console.cpp:435-458;
    testInclude src/tests.cpp:1555-1586) via
    operators/display.py::visible_statements: a global ``excluded``
    rule hides every R1-region edge, supplier S5's own rule hides its
    nation edge, nation N2's include rule whitelists only its
    Attribute row, and Range rows vanish under the meta-predicate
    skip.  Rule side broadcast; corpus side one scan, no shuffle."""
    from netbase_spark.operators.display import (
        EXCLUDE_REL,
        GLOBAL_EXCLUDE_NODE,
        INCLUDE_REL,
        visible_statements,
    )
    from netbase_spark.relations import ATTRIBUTE, RANGE

    nation = _t(spark, sf_dir, "nation")
    body = _type_triples(spark, sf_dir).unionByName(
        nation.select(
            _sk("n_nationkey", "N").alias("subj"),
            F.lit(ATTRIBUTE).alias("rel"),
            F.lower(F.col("n_name")).alias("obj"),
        )
    ).unionByName(
        nation.select(
            _sk("n_nationkey", "N").alias("subj"),
            F.lit(RANGE).alias("rel"),
            _sk("n_regionkey", "R").alias("obj"),
        )
    )
    rules = spark.createDataFrame(
        [
            (GLOBAL_EXCLUDE_NODE, EXCLUDE_REL, "r1"),
            ("S5", EXCLUDE_REL, "n"),
            ("N2", INCLUDE_REL, "attribute"),
        ],
        "subj string, rel int, obj string",
    )
    out = visible_statements(body.unionByName(rules))
    return out.select(
        "subj", F.col("rel").cast("int").alias("rel"), "obj"
    )


def _oracle_display_filter() -> str:
    from netbase_spark.operators.display import EXCLUDE_REL, INCLUDE_REL
    from netbase_spark.relations import ATTRIBUTE, RANGE, TYPE

    return f"""
    WITH body AS (
      SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj,
             {TYPE} AS rel,
             'N' || CAST(s_nationkey AS VARCHAR) AS obj
      FROM supplier
      UNION ALL
      SELECT 'N' || CAST(n_nationkey AS VARCHAR), {TYPE},
             'R' || CAST(n_regionkey AS VARCHAR) FROM nation
      UNION ALL
      SELECT 'N' || CAST(n_nationkey AS VARCHAR), {ATTRIBUTE},
             lower(n_name) FROM nation
      UNION ALL
      SELECT 'N' || CAST(n_nationkey AS VARCHAR), {RANGE},
             'R' || CAST(n_regionkey AS VARCHAR) FROM nation
    ), rules(owner, kind, term) AS (
      VALUES ('excluded', {EXCLUDE_REL}, 'r1'),
             ('S5', {EXCLUDE_REL}, 'n'),
             ('N2', {INCLUDE_REL}, 'attribute')
    ), named AS (
      SELECT subj, rel, obj,
             CASE rel WHEN {TYPE} THEN 'Type'
                      WHEN {ATTRIBUTE} THEN 'Attribute'
                      WHEN {RANGE} THEN 'Range'
                      ELSE CAST(rel AS VARCHAR) END AS pname
      FROM body
    ), meta AS (
      SELECT * FROM named
      WHERE NOT (lower(pname) IN
                   ('key', 'expected type', 'range', 'usage domain',
                    'schema')
                 OR starts_with(lower(pname), 'http')
                 OR length(pname) = 2
                 OR substr(pname, 3, 1) IN ('-', '_'))
    ), afterx AS (
      SELECT m.* FROM meta m
      WHERE NOT EXISTS (
        SELECT 1 FROM rules e
        WHERE e.kind = {EXCLUDE_REL}
          AND (e.owner = 'excluded' OR e.owner = m.subj)
          AND (contains(lower(m.subj), lower(e.term))
               OR contains(lower(m.pname), lower(e.term))
               OR contains(lower(m.obj), lower(e.term))
               OR CAST(m.rel AS VARCHAR) = e.term
               OR m.subj = e.term OR m.obj = e.term))
    )
    SELECT subj, CAST(rel AS INTEGER) AS rel, obj FROM afterx m
    WHERE NOT EXISTS (SELECT 1 FROM rules i
                      WHERE i.kind = {INCLUDE_REL} AND i.owner = m.subj)
       OR EXISTS (
        SELECT 1 FROM rules i
        WHERE i.kind = {INCLUDE_REL} AND i.owner = m.subj
          AND (contains(lower(m.subj), lower(i.term))
               OR contains(lower(m.pname), lower(i.term))
               OR contains(lower(m.obj), lower(i.term))
               OR CAST(m.rel AS VARCHAR) = i.term
               OR m.subj = i.term OR m.obj = i.term))
"""


ORACLE_DISPLAY_FILTER = _oracle_display_filter()


def q_tfidf_terms(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (min_df=2) — the
    domain-tagging primitive for training-mixture routing, via
    operators/textstats.py::tfidf_top_terms.  Integer-floored scores
    rank identically in Spark and DuckDB."""
    from netbase_spark.operators.textstats import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = tfidf_top_terms(docs, k=3, min_df=2)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        "tf",
        "df",
        "score_e6",
        F.col("rank").cast("int").alias("rank"),
    )


ORACLE_TFIDF_TERMS = """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dft AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             CAST(floor(t.tf * ln(((SELECT count(*) FROM documents) + 1.0)
                                  / (d.df + 1.0)) * 1e6) AS BIGINT)
               AS score_e6
      FROM tf t JOIN dft d USING (term)
      WHERE d.df >= 2
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY score_e6 DESC, term ASC
             ) AS rank
      FROM scored
    )
    SELECT doc_id, term, tf, df, score_e6, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 3
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language subsampling (en 50%, de 25%) via
    operators/textstats.py::sample_stratified: the keep decision is a
    pure md5 function of doc_id, so the subset is identical on any
    cluster size / partitioning — reproducible training mixtures.
    Map-side only, no shuffle."""
    from netbase_spark.operators.textstats import sample_stratified

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = sample_stratified(docs, "lang", {"en": 0.5, "de": 0.25})
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


ORACLE_STRATIFIED_SAMPLE = f"""
    SELECT doc_id, lang FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          < CASE lang WHEN 'en' THEN {int(0.5 * 4294967296)}
                      WHEN 'de' THEN {int(0.25 * 4294967296)} END
"""


def q_decontam(spark, sf_dir):
    """Benchmark decontamination: training docs sharing >= 2 winnowing
    fingerprints with an eval set (here: every 41st document) must be
    flagged — a contiguous >= w+k-1-token overlap leaks the benchmark.
    Cross-table inverted-index join, eval side broadcast, corpus-side
    boilerplate fingerprints capped (textstats.decontamination_pairs)."""
    from netbase_spark.operators.textstats import (
        decontamination_pairs,
        winnow_fingerprints,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_fps = winnow_fingerprints(docs, k=4, w=5)
    eval_fps = winnow_fingerprints(
        docs.where(F.col("doc_id") % 41 == 0), k=4, w=5
    )
    return decontamination_pairs(corpus_fps, eval_fps, min_shared=2).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("eval_id").cast("long").alias("eval_id"),
        "shared",
    )


ORACLE_DECONTAM = f"""
    WITH fps0 AS ({ORACLE_WINNOW_FPS}),
    fps AS (
      SELECT * FROM fps0
      WHERE fp IN (SELECT fp FROM fps0 GROUP BY fp HAVING count(*) <= 2000)
    ), ev AS (
      SELECT doc_id AS eval_id, fp FROM fps0 WHERE doc_id % 41 = 0
    )
    SELECT c.doc_id, e.eval_id, CAST(count(*) AS BIGINT) AS shared
    FROM fps c JOIN ev e ON c.fp = e.fp
    GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_domain_quota(spark, sf_dir):
    """Per-domain document cap (anti-monoculture mixture quota) via
    textstats.domain_quota: at most 20 docs per source, survivors
    picked by md5-of-id rank so the subset is layout-independent."""
    from netbase_spark.operators.textstats import domain_quota

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return domain_quota(docs, cap=20).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )


ORACLE_DOMAIN_QUOTA = """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 20
"""


def q_repetition(spark, sf_dir):
    """Gopher-style duplicate-bigram repetition stats per document
    (textstats.repetition_stats): high dup_ratio_e6 marks generated
    spam / navigation chrome for the cleaning filter.  Map-side only."""
    from netbase_spark.operators.textstats import repetition_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_stats(docs, n=2).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "total_ngrams",
        "distinct_ngrams",
        "dup_ratio_e6",
    )


ORACLE_REPETITION = """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(generate_series(1, len(t) - 1),
                       i -> array_to_string(list_slice(t, i, i + 1), ' '))
             END AS g
      FROM t
    )
    SELECT doc_id,
           CAST(len(g) AS BIGINT) AS total_ngrams,
           CAST(len(list_distinct(g)) AS BIGINT) AS distinct_ngrams,
           CASE WHEN len(g) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor((len(g) - len(list_distinct(g)))
                          / len(g) * 1e6) AS BIGINT)
           END AS dup_ratio_e6
    FROM g
"""


# ---------------------------------------------------------------------------
# relationsFilter / anyFilter (the last two per-edge-type BFS filters)
# ---------------------------------------------------------------------------


def _mixed_triples(spark, sf_dir):
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supplier.select(
            _sk("s_suppkey", "S").alias("subj"),
            F.lit(TYPE).alias("rel"),
            _sk("s_nationkey", "N").alias("obj"),
        )
        .unionByName(
            nation.select(
                _sk("n_nationkey", "N").alias("subj"),
                F.lit(PART).alias("rel"),
                _sk("n_regionkey", "R").alias("obj"),
            )
        )
        .unionByName(
            nation.select(
                _sk("n_nationkey", "N").alias("subj"),
                F.lit(INSTANCE).alias("rel"),
                F.lit("root").alias("obj"),
            )
        )
    )


def q_relations_of(spark, sf_dir):
    """``relationsFilter`` (src/query.cpp:1253-1263): the distinct
    predicates on each nation node's statement chain.  The chain links
    both directions (``nextStatement``, src/netbase.cpp:468-481), so
    the subject side contributes Part/Instance and the object side
    contributes the suppliers' Type edges."""
    from netbase_spark.operators.query_ops import relations_of

    nation = _t(spark, sf_dir, "nation")
    nodes = nation.select(_sk("n_nationkey", "N").alias("node"))
    return relations_of(_mixed_triples(spark, sf_dir), nodes)


ORACLE_RELATIONS_OF = """
    WITH tri AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj, -3 AS rel,
               'N' || CAST(s_nationkey AS VARCHAR) AS obj FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR), -11,
               'R' || CAST(n_regionkey AS VARCHAR) FROM nation
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR), -4, 'root' FROM nation
    ), legs AS (
        SELECT subj AS node, rel FROM tri
        UNION ALL
        SELECT obj AS node, rel FROM tri
    )
    SELECT DISTINCT node, rel FROM legs WHERE node LIKE 'N%'
"""


def q_any_bfs(spark, sf_dir):
    """``anyFilter`` undirected BFS (src/query.cpp:1443-1475): suppliers
    reach their nation, their sibling suppliers, and the nation's
    region; the broadcast exclude set (the reference's built-in-node
    ``id < 1000`` expansion guard) stops the walk AT region hubs, so
    other-nation members stay unreachable within the depth bound."""
    from netbase_spark.operators.query_ops import any_edges, bfs_distances

    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    triples = supplier.select(
        _sk("s_suppkey", "S").alias("subj"),
        F.lit(TYPE).alias("rel"),
        _sk("s_nationkey", "N").alias("obj"),
    ).unionByName(
        nation.select(
            _sk("n_nationkey", "N").alias("subj"),
            F.lit(PART).alias("rel"),
            _sk("n_regionkey", "R").alias("obj"),
        )
    )
    hubs = region.select(_sk("r_regionkey", "R").alias("node"))
    sources = supplier.where(F.col("s_suppkey") <= 5).select(
        _sk("s_suppkey", "S").alias("node")
    )
    return bfs_distances(
        any_edges(triples, exclude_srcs=hubs), sources, max_depth=3
    ).select("root", "node", "depth")


ORACLE_ANY_BFS = """
    WITH RECURSIVE tri AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj,
               'N' || CAST(s_nationkey AS VARCHAR) AS obj FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR),
               'R' || CAST(n_regionkey AS VARCHAR) FROM nation
    ), edges AS (
        SELECT subj AS src, obj AS dst FROM tri
        UNION
        SELECT obj AS src, subj AS dst FROM tri
    ), stepped AS (
        SELECT src, dst FROM edges WHERE src NOT LIKE 'R%' AND src <> dst
    ), bfs AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS root,
               'S' || CAST(s_suppkey AS VARCHAR) AS node, 0 AS depth
        FROM supplier WHERE s_suppkey <= 5
        UNION ALL
        SELECT b.root, e.dst, b.depth + 1
        FROM bfs b JOIN stepped e ON b.node = e.src WHERE b.depth < 3
    )
    SELECT root, node, CAST(MIN(depth) AS INT) AS depth
    FROM bfs GROUP BY root, node
"""


EXT3_QUERIES = {
    "relations_of": q_relations_of,
    "any_bfs": q_any_bfs,
    "display_filter": q_display_filter,
    "tfidf_terms": q_tfidf_terms,
    "stratified_sample": q_stratified_sample,
    "decontam": q_decontam,
    "domain_quota": q_domain_quota,
    "repetition": q_repetition,
    "winnow_fp": q_winnow_fp,
    "winnow_pairs": q_winnow_pairs,
    "geodb_import": q_geodb_import,
    "image_lookup": q_image_lookup,
    "manual_merge": q_manual_merge,
    "isa_nodes": q_isa_nodes,
    "find_properties": q_find_properties,
    "media_resize": q_media_resize,
    "media_frames": q_media_frames,
}

EXT3_ORACLES = {
    "relations_of": ORACLE_RELATIONS_OF,
    "any_bfs": ORACLE_ANY_BFS,
    "display_filter": ORACLE_DISPLAY_FILTER,
    "tfidf_terms": ORACLE_TFIDF_TERMS,
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "decontam": ORACLE_DECONTAM,
    "domain_quota": ORACLE_DOMAIN_QUOTA,
    "repetition": ORACLE_REPETITION,
    "winnow_fp": ORACLE_WINNOW_FPS,
    "winnow_pairs": ORACLE_WINNOW_PAIRS,
    "geodb_import": ORACLE_GEODB,
    "image_lookup": ORACLE_IMAGE_LOOKUP,
    "manual_merge": ORACLE_MANUAL_MERGE,
    "isa_nodes": ORACLE_ISA_NODES,
    "find_properties": ORACLE_FIND_PROPERTIES,
    "media_resize": ORACLE_MEDIA_RESIZE,
    "media_frames": ORACLE_MEDIA_FRAMES,
}
