"""Extension queries for the driver contract (imported by
``__spark_entry__``): sources (N3 / CSV-melt / facts / export),
relational query ops (pattern match, filter language, BFS, set ops,
paging, class fallback, typed values), and training-data ops (SimHash,
embedding near-dup, bucketed ANN, media decode, event windows,
sessionization).  Each Spark query has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from netbase_spark.relations import INSTANCE, SUPER_CLASS, TYPE


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


def q_n3_parse(spark, sf_dir):
    """importN3 analog: NT lines (synthesized from supplier) parsed to
    (subj, pred, obj) with IRI resolution, literal handling, malformed-
    line and external-ID-predicate drops (SURVEY.md §2.1)."""
    from netbase_spark.sources.n3 import parse_nt_lines

    sup = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey").cast("string")
    fact = sup.select(
        F.concat(
            F.lit("<http://ex.org/S"), k,
            F.lit("> <http://www.wikidata.org/prop/P31> <http://ex.org/nation/N"),
            F.col("s_nationkey").cast("string"), F.lit("> ."),
        ).alias("value")
    )
    name = sup.select(
        F.concat(
            F.lit("<http://ex.org/S"), k, F.lit('> <http://ex.org/hasName> "'),
            F.col("s_name"), F.lit('"@en .'),
        ).alias("value")
    )
    bad = sup.select(F.lit("this line is not n-triples").alias("value"))
    dropped = sup.select(
        F.concat(
            F.lit("<http://ex.org/S"), k,
            F.lit('> <http://www.wikidata.org/prop/P646> "/m/012345" .'),
        ).alias("value")
    )
    lines = fact.unionByName(name).unionByName(bad).unionByName(dropped)
    return parse_nt_lines(lines)


ORACLE_N3 = """
    SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS subj, 'P31' AS pred,
           'N' || CAST(s_nationkey AS VARCHAR) AS obj
    FROM supplier
    UNION ALL
    SELECT 'S' || CAST(s_suppkey AS VARCHAR), 'hasName', s_name FROM supplier
"""


def q_csv_melt(spark, sf_dir):
    """importCsv analog: wide lineitem -> long typed triples via stack
    (SURVEY.md §2.1)."""
    from netbase_spark.sources.tabular import melt

    li = _t(spark, sf_dir, "lineitem")
    return melt(
        li,
        F.concat(
            F.lit("L"), F.col("l_orderkey").cast("string"), F.lit("-"),
            F.col("l_linenumber").cast("string"),
        ),
        ["l_quantity", "l_returnflag"],
    )


ORACLE_CSV_MELT = """
    SELECT 'L' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS subj,
           'l_quantity' AS pred, CAST(l_quantity AS VARCHAR) AS obj_text,
           l_quantity AS obj_num
    FROM lineitem
    UNION ALL
    SELECT 'L' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR),
           'l_returnflag', l_returnflag, CAST(NULL AS DOUBLE)
    FROM lineitem
"""


def q_facts_member(spark, sf_dir):
    """importFacts containment heuristic: object containing the subject
    name flips the relation to Member (SURVEY.md §2.1)."""
    from netbase_spark.relations import SEE
    from netbase_spark.sources.tabular import import_facts

    sup = _t(spark, sf_dir, "supplier")
    pairs = sup.select(
        F.col("s_name").alias("s"),
        F.when(
            F.col("s_suppkey") % 2 == 0, F.concat(F.lit("team "), F.col("s_name"))
        )
        .otherwise(F.lit("team X"))
        .alias("o"),
    )
    return import_facts(pairs, SEE)


ORACLE_FACTS = """
    SELECT s_name AS subj,
           CAST(CASE WHEN s_suppkey % 2 = 0 THEN -13 ELSE -50 END AS INT) AS rel,
           CASE WHEN s_suppkey % 2 = 0 THEN 'team ' || s_name ELSE 'team X' END AS obj
    FROM supplier
"""


def q_export_names(spark, sf_dir):
    """export_csv statement-names analog: ids joined to display names
    (SURVEY.md §2.1, src/export.cpp:50-88)."""
    from netbase_spark.sources.tabular import export_statement_names

    orders = _t(spark, sf_dir, "orders")
    triples = orders.select(
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
        F.lit(-310).alias("rel"),
        F.concat(F.lit("O"), F.col("o_orderkey").cast("string")).alias("obj"),
    )
    names = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("key"),
        F.col("c_name").alias("name"),
    )
    return export_statement_names(triples, names, skip_rels=(INSTANCE,))


ORACLE_EXPORT_NAMES = """
    SELECT 'C' || CAST(o_custkey AS VARCHAR) AS subj,
           c_name AS subj_name,
           CAST(-310 AS INT) AS rel,
           'O' || CAST(o_orderkey AS VARCHAR) AS obj,
           'O' || CAST(o_orderkey AS VARCHAR) AS obj_name
    FROM orders JOIN customer ON c_custkey = o_custkey
"""


# ---------------------------------------------------------------------------
# query ops
# ---------------------------------------------------------------------------


def q_pattern_match(spark, sf_dir):
    """findStatement pattern scan with inverse-pair rewrite: querying
    (Any, Instance, Any) also surfaces (o, Type, s) rows flipped
    (SURVEY.md §2.5, src/netbase.cpp:1734-1762)."""
    from netbase_spark.operators.query_ops import find_statements

    sup = _t(spark, sf_dir, "supplier")
    direct = sup.where(F.col("s_suppkey") % 2 == 0).select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("subj"),
        F.lit(INSTANCE).alias("rel"),
        F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("obj"),
    )
    flipped = sup.where(F.col("s_suppkey") % 3 == 0).select(
        F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("subj"),
        F.lit(TYPE).alias("rel"),
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("obj"),
    )
    return find_statements(direct.unionByName(flipped), rel=INSTANCE)


ORACLE_PATTERN = """
    SELECT DISTINCT 'S' || CAST(s_suppkey AS VARCHAR) AS subj,
           CAST(-4 AS INT) AS rel,
           'N' || CAST(s_nationkey AS VARCHAR) AS obj
    FROM supplier WHERE s_suppkey % 2 = 0 OR s_suppkey % 3 = 0
"""


def q_filter_string(spark, sf_dir):
    """The string filter mini-language compiled to Column predicates
    (parseFilter/filter, SURVEY.md §2.5)."""
    from netbase_spark.functions.filter_lang import apply_filter

    orders = _t(spark, sf_dir, "orders")
    return apply_filter(
        orders, "o_totalprice>150000, o_orderstatus=F or o_orderpriority=1-URGENT"
    ).select("o_orderkey")


ORACLE_FILTER = """
    SELECT o_orderkey FROM orders
    WHERE (o_totalprice > 150000 AND lower(o_orderstatus) = 'f')
       OR lower(o_orderpriority) = '1-urgent'
"""


def q_bfs_depths(spark, sf_dir):
    """Multi-source BFS distances (findPath/getFurthest, SURVEY.md §2.5)
    over region -> nation -> supplier edges."""
    from netbase_spark.operators.query_ops import bfs_distances

    nation = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier")
    edges = nation.select(
        F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("src"),
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("dst"),
    ).unionByName(
        sup.select(
            F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("dst"),
        )
    )
    sources = _t(spark, sf_dir, "region").select(
        F.concat(F.lit("R"), F.col("r_regionkey").cast("string")).alias("node")
    )
    return bfs_distances(edges, sources, max_depth=4)


ORACLE_BFS = """
    SELECT 'R' || CAST(r_regionkey AS VARCHAR) AS node,
           'R' || CAST(r_regionkey AS VARCHAR) AS root, 0 AS depth
    FROM region
    UNION ALL
    SELECT 'N' || CAST(n_nationkey AS VARCHAR),
           'R' || CAST(n_regionkey AS VARCHAR), 1
    FROM nation
    UNION ALL
    SELECT DISTINCT 'S' || CAST(s_suppkey AS VARCHAR),
           'R' || CAST(n_regionkey AS VARCHAR), 2
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
"""


def q_set_ops_page(spark, sf_dir):
    """Set ops + deterministic paging (mergeVectors/exclude +
    start/hitsPerPage, SURVEY.md §2.5): BUILDING customers minus
    negative-balance ones, page 2 of 20."""
    from netbase_spark.operators.query_ops import exclude_nodes, page

    cust = _t(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.where(F.col("c_acctbal") < 0).select("c_custkey")
    return page(exclude_nodes(a, b), [F.col("c_custkey")], start=10, hits_per_page=20)


ORACLE_SET_PAGE = """
    SELECT c_custkey FROM customer
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    ORDER BY c_custkey LIMIT 20 OFFSET 10
"""


def q_class_fallback(spark, sf_dir):
    """getClass fallback chain: first matching relation in priority
    order wins, default 'Entity' (SURVEY.md §2.3)."""
    from netbase_spark.operators.query_ops import class_of

    part = _t(spark, sf_dir, "part")
    key = F.concat(F.lit("P"), F.col("p_partkey").cast("string"))
    nodes = part.select(key.alias("node"))
    t1 = part.where(F.col("p_partkey") % 2 == 0).select(
        key.alias("subj"), F.lit(TYPE).alias("rel"), F.col("p_brand").alias("obj")
    )
    t2 = part.where(F.col("p_partkey") % 3 == 0).select(
        key.alias("subj"), F.lit(SUPER_CLASS).alias("rel"), F.col("p_type").alias("obj")
    )
    return class_of(nodes, t1.unionByName(t2), [SUPER_CLASS, TYPE])


ORACLE_CLASS = """
    SELECT 'P' || CAST(p_partkey AS VARCHAR) AS node,
           CASE WHEN p_partkey % 3 = 0 THEN p_type
                WHEN p_partkey % 2 = 0 THEN p_brand
                ELSE 'Entity' END AS class
    FROM part
"""


def q_typed_values(spark, sf_dir):
    """rdfValue typed-literal parsing with unit normalization
    (SURVEY.md §1.2, src/netbase.cpp:1358-1443)."""
    from netbase_spark.functions.values import parse_typed_literal

    li = _t(spark, sf_dir, "lineitem")
    lits = (
        li.select(
            F.concat(F.lit('"'), F.col("l_quantity").cast("string"), F.lit('"^^<km>')).alias("lit")
        )
        .unionByName(
            li.select(
                F.concat(
                    F.lit('"'), F.date_format("l_shipdate", "yyyy-MM-dd"),
                    F.lit('"^^<http://www.w3.org/2001/XMLSchema#date>'),
                ).alias("lit")
            )
        )
        .unionByName(
            _t(spark, sf_dir, "supplier").select(
                F.concat(F.lit('"'), F.col("s_name"), F.lit('"@en')).alias("lit")
            )
        )
        .distinct()
    )
    v = parse_typed_literal(F.col("lit"))
    return lits.select(
        "lit",
        v["text"].alias("text"),
        v["num"].alias("num"),
        v["unit"].alias("unit"),
        v["kind"].alias("kind"),
        v["lang"].alias("lang"),
    )


ORACLE_TYPED = """
    WITH lits AS (
        SELECT DISTINCT '"' || CAST(l_quantity AS VARCHAR) || '"^^<km>' AS lit,
               CAST(l_quantity AS VARCHAR) AS text,
               l_quantity * 1000.0 AS num, 'm' AS unit, 'number' AS kind,
               CAST(NULL AS VARCHAR) AS lang
        FROM lineitem
        UNION
        SELECT DISTINCT '"' || strftime(l_shipdate, '%Y-%m-%d') || '"^^<http://www.w3.org/2001/XMLSchema#date>',
               strftime(l_shipdate, '%Y-%m-%d'),
               CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), 'date', CAST(NULL AS VARCHAR)
        FROM lineitem
        UNION
        SELECT DISTINCT '"' || s_name || '"@en', s_name,
               CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), 'string', 'en'
        FROM supplier
    )
    SELECT lit, text, num, unit, kind, lang FROM lits
"""


def q_topics_guarded(spark, sf_dir):
    """getTopic BFS with hub guards: furthest ancestor, never entering
    drop-listed hubs (filterWikiType) and halting at stop-listed good
    classes (stopAtGoodWiki) — SURVEY.md §2.3."""
    from netbase_spark.operators.query_ops import topic_of

    nation = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier")
    edges = sup.select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("dst"),
    ).unionByName(
        nation.select(
            F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("dst"),
        )
    )
    nodes = sup.select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("node")
    )
    return topic_of(nodes, edges, stop=("N5",), drop=("R1",))


ORACLE_TOPICS = """
    SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS node,
           CASE WHEN s_nationkey = 5 THEN 'N5'
                WHEN n_regionkey = 1 THEN 'N' || CAST(s_nationkey AS VARCHAR)
                ELSE 'R' || CAST(n_regionkey AS VARCHAR) END AS topic
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
"""


# ---------------------------------------------------------------------------
# training-data ops
# ---------------------------------------------------------------------------

_SIMHASH_SQL_CORE = """
    toks AS (
        SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
    ), bits AS (
        SELECT doc_id, i,
               SUM(CASE WHEN (('0x' || substr(md5(tok), 1, 8))::BIGINT >> i) & 1 = 1
                        THEN 1 ELSE -1 END) AS slo,
               SUM(CASE WHEN (('0x' || substr(md5(tok), 9, 8))::BIGINT >> i) & 1 = 1
                        THEN 1 ELSE -1 END) AS shi
        FROM toks CROSS JOIN range(32) t(i)
        GROUP BY doc_id, i
    ), sigs AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN shi > 0 THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS simhash_hi,
               CAST(SUM(CASE WHEN slo > 0 THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS simhash_lo
        FROM bits GROUP BY doc_id
    )
"""


def q_simhash(spark, sf_dir):
    """64-bit SimHash document signatures, carried as two 32-bit halves
    (signed-overflow-free in both engines)."""
    from netbase_spark.operators.dedup import simhash

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash(docs)


ORACLE_SIMHASH = (
    f"WITH {_SIMHASH_SQL_CORE.strip()} "
    "SELECT doc_id, simhash_hi, simhash_lo FROM sigs"
)


def q_simhash_pairs(spark, sf_dir):
    """Banded-LSH candidate pairs over 64-bit SimHash signatures:
    16-bit bands (65,536 values/band vs the 256 of 8-bit bands that
    degenerated quadratically at scale) with a bucket-size cap."""
    from netbase_spark.operators.dedup import simhash, simhash_candidates

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_candidates(simhash(docs))


ORACLE_SIMHASH_PAIRS = f"""
    WITH {_SIMHASH_SQL_CORE.strip()},
    bands AS (
        SELECT doc_id, CAST(i AS INT) AS band,
               (simhash_lo >> (CAST(i AS INT) * 16)) & 65535 AS bv
        FROM sigs CROSS JOIN range(2) t(i)
        UNION ALL
        SELECT doc_id, CAST(i AS INT) + 2,
               (simhash_hi >> (CAST(i AS INT) * 16)) & 65535
        FROM sigs CROSS JOIN range(2) t(i)
    ),
    kept AS (
        SELECT doc_id, band, bv FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, bv) <= 2000
    )
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM kept l JOIN kept r ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id
"""


def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (brute-force baseline)."""
    from netbase_spark.operators.dedup import cosine_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return cosine_neardup_pairs(emb, threshold_e4=4500)


ORACLE_EMBED_NEARDUP = """
    SELECT a.vec_id AS a, b.vec_id AS b,
           CAST(floor(list_cosine_similarity(a.embedding, b.embedding) * 10000) AS BIGINT) AS sim_e4
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE floor(list_cosine_similarity(a.embedding, b.embedding) * 10000) >= 4500
"""


def q_ann_bucketed(spark, sf_dir):
    """LSH-bucketed ANN top-10 for vec_id=1 (the scale path; brute force
    `ann_cosine` is its correctness reference)."""
    from netbase_spark.operators.dedup import ann_topk_bucketed

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ann_topk_bucketed(emb, query_id=1, k=10, n_planes=4)


ORACLE_ANN_BUCKETED = """
    WITH planes AS (
        SELECT e.vec_id, p.j,
               list_sum(list_transform(e.embedding,
                   (x, i) -> CAST(x AS DOUBLE) *
                       ((('0x' || substr(md5(CAST(p.j AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 6))::BIGINT
                         / 16777216.0) - 0.5))) AS dot
        FROM embeddings e CROSS JOIN range(4) p(j)
    ), buckets AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN dot >= 0 THEN 1 << CAST(j AS INT) ELSE 0 END) AS INT) AS bucket
        FROM planes GROUP BY vec_id
    ), q AS (
        SELECT b.bucket AS qbucket, e.embedding AS qv
        FROM buckets b JOIN embeddings e USING (vec_id) WHERE b.vec_id = 1
    )
    SELECT e.vec_id,
           CAST(floor(list_cosine_similarity(e.embedding, q.qv) * 10000) AS BIGINT) AS sim_e4
    FROM embeddings e JOIN buckets b USING (vec_id), q
    WHERE b.bucket = q.qbucket AND e.vec_id <> 1
    ORDER BY sim_e4 DESC, vec_id ASC LIMIT 10
"""


def q_media_features(spark, sf_dir):
    """Multimodal decode plumbing: media spans -> typed metadata via
    Arrow-batched mapInPandas (decode core is a deterministic fake in
    this sandbox — see netbase_spark/operators/media.py)."""
    from netbase_spark.operators.media import decode_media

    docs = _t(spark, sf_dir, "documents")
    media = docs.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("image").alias("kind"),
        F.concat(
            F.lit("commons/"), F.md5(F.col("doc_id").cast("string")), F.lit(".jpg")
        ).alias("media_ref"),
    )
    return decode_media(media)


ORACLE_MEDIA = """
    WITH media AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               'commons/' || md5(CAST(doc_id AS VARCHAR)) || '.jpg' AS media_ref
        FROM documents WHERE doc_id % 2 = 0
    )
    SELECT doc_id, media_ref, 'image' AS kind,
           CAST(('0x' || substr(md5(media_ref), 1, 4))::BIGINT % 4096 AS INT) AS width,
           CAST(('0x' || substr(md5(media_ref), 5, 4))::BIGINT % 4096 AS INT) AS height,
           CAST(NULL AS INT) AS duration_ms,
           md5(media_ref) AS content_fp
    FROM media
"""


def q_windowed_events(spark, sf_dir):
    """Tumbling event-time windows per event_type (streaming-composable
    aggregation; batch-checked vs oracle)."""
    from netbase_spark.operators.events import windowed_counts

    ev = _t(spark, sf_dir, "events")
    return (
        windowed_counts(ev, minutes=60)
        .withColumn("sum_value", F.round("sum_value", 2))
        # string form avoids TIMESTAMP vs TIMESTAMP_NTZ schema ambiguity
        .withColumn("window_start", F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"))
    )


ORACLE_WINDOWED = """
    SELECT event_type,
           strftime(time_bucket(INTERVAL '60 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization per user (30 min gap)."""
    from netbase_spark.operators.events import sessionize

    ev = _t(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        sessionize(ev, gap_minutes=30)
        .withColumn("sum_value", F.round("sum_value", 2))
        .withColumn("session_start", F.date_format("session_start", fmt))
        .withColumn("session_end", F.date_format("session_end", fmt))
    )


ORACLE_SESSIONIZE = """
    WITH m AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sess_nr
        FROM m
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, sess_nr
"""


def q_query_lang(spark, sf_dir):
    """The reference's NL-ish query language end-to-end (fixQuery ->
    parseQuery -> filter compile -> projection, SURVEY.md §2.6): "list
    of customers with ..." rewrites to select-from-where, plural table
    name resolves via singular retry, `=` compares case/underscore-
    insensitively (src/query.cpp:22-57, 472-517)."""
    from netbase_spark.functions.query_lang import run_query

    tables = {"customer": _t(spark, sf_dir, "customer")}
    out = run_query(
        "list of customers with c_acctbal>9000 and c_mktsegment=BUILDING", tables
    )
    # stable contract projection (the NL form selects *)
    return out.select("c_custkey", "c_acctbal")


ORACLE_QUERY_LANG = """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > 9000
      AND lower(replace(c_mktsegment, '_', ' ')) = 'building'
"""


def q_adjacency(spark, sf_dir):
    """Adjacency-table materialization (both traversal directions of
    every triple — the statement-chain replacement, SURVEY.md §2.4 /
    north_rule 'adjacency tables'), over (nation, PartOf, region)
    triples derived from testdata."""
    from netbase_spark.operators.materialize import adjacency
    from netbase_spark.relations import PART_OF

    tri = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit(PART_OF).cast("int").alias("rel"),
        F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("obj"),
    )
    return adjacency(tri)


ORACLE_ADJACENCY = """
    SELECT 'N' || CAST(n_nationkey AS VARCHAR) AS node, 'out' AS dir,
           'R' || CAST(n_regionkey AS VARCHAR) AS nbr, CAST(-12 AS INT) AS rel
    FROM nation
    UNION ALL
    SELECT 'R' || CAST(n_regionkey AS VARCHAR), 'in',
           'N' || CAST(n_nationkey AS VARCHAR), CAST(-12 AS INT)
    FROM nation
"""


EXT_QUERIES = {
    "query_lang": q_query_lang,
    "adjacency": q_adjacency,
    "n3_parse": q_n3_parse,
    "csv_melt": q_csv_melt,
    "facts_member": q_facts_member,
    "export_names": q_export_names,
    "pattern_match": q_pattern_match,
    "filter_string": q_filter_string,
    "bfs_depths": q_bfs_depths,
    "set_ops_page": q_set_ops_page,
    "class_fallback": q_class_fallback,
    "topics_guarded": q_topics_guarded,
    "typed_values": q_typed_values,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "embed_neardup": q_embed_neardup,
    "ann_bucketed": q_ann_bucketed,
    "media_features": q_media_features,
    "windowed_events": q_windowed_events,
    "sessionize": q_sessionize,
}

EXT_ORACLES = {
    "query_lang": ORACLE_QUERY_LANG,
    "adjacency": ORACLE_ADJACENCY,
    "n3_parse": ORACLE_N3,
    "csv_melt": ORACLE_CSV_MELT,
    "facts_member": ORACLE_FACTS,
    "export_names": ORACLE_EXPORT_NAMES,
    "pattern_match": ORACLE_PATTERN,
    "filter_string": ORACLE_FILTER,
    "bfs_depths": ORACLE_BFS,
    "set_ops_page": ORACLE_SET_PAGE,
    "class_fallback": ORACLE_CLASS,
    "topics_guarded": ORACLE_TOPICS,
    "typed_values": ORACLE_TYPED,
    "simhash": ORACLE_SIMHASH,
    "simhash_pairs": ORACLE_SIMHASH_PAIRS,
    "embed_neardup": ORACLE_EMBED_NEARDUP,
    "ann_bucketed": ORACLE_ANN_BUCKETED,
    "media_features": ORACLE_MEDIA,
    "windowed_events": ORACLE_WINDOWED,
    "sessionize": ORACLE_SESSIONIZE,
}
