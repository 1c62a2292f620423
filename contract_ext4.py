"""Fourth batch of driver-contract queries: PII scrubbing, boilerplate
line removal, and the LSH-bucketed semantic near-dup scale path.

Same conventions as contract_ext / contract_ext2 / contract_ext3:
every query builds deterministic input from the sf-dir parquet tables,
routes through the package operator it certifies, and has a DuckDB
oracle twin (identical column names + types on both sides).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- PII scrubbing -----------------------------------------------------------


def q_pii_scrub(spark, sf_dir):
    """PII detect + redact (textstats.pii_scrub) over documents with
    deterministic synthetic PII appended (the corpus text itself is
    synthetic and PII-free; the appended suffix is constructed
    identically in the oracle, so the regexes are exercised on real
    email/phone/IPv4 shapes)."""
    from netbase_spark.operators.textstats import pii_scrub

    docs = _t(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-"),
            F.lpad(F.pmod(F.col("doc_id"), 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            F.pmod(F.col("doc_id"), 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    return pii_scrub(synth)


ORACLE_PII_SCRUB = r"""
    WITH synth AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 555-123-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                   AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
               AS n_emails,
           CAST(len(regexp_extract_all(text,
               '\b\d{3}[- ]\d{3}[- ]\d{4}\b')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(text,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g') AS redacted
    FROM synth
"""


# --- boilerplate line removal ------------------------------------------------


def q_boilerplate(spark, sf_dir):
    """CCNet-style corpus-frequent line removal
    (textstats.strip_boilerplate).  The synthetic corpus has no
    newlines, so the separator is ' ' — every token is a 'line', which
    turns the operator into df-based boilerplate-token stripping
    (same semantics, same plan shape)."""
    from netbase_spark.operators.textstats import strip_boilerplate

    docs = _t(spark, sf_dir, "documents")
    return strip_boilerplate(docs, sep=" ", min_df=300, cap=8)


ORACLE_BOILERPLATE = """
    WITH lines AS (
        SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS line
        FROM documents
    ), df AS (
        SELECT line, CAST(count(*) AS BIGINT) AS df
        FROM lines WHERE line <> '' GROUP BY line
    ), bl AS (
        SELECT line FROM df WHERE df >= 300 ORDER BY df DESC, line LIMIT 8
    ), bla AS (
        SELECT coalesce(list(line ORDER BY line), CAST([] AS VARCHAR[])) AS arr
        FROM bl
    )
    SELECT d.doc_id,
           CAST(len(str_split(d.text, ' ')) AS BIGINT) AS n_lines,
           CAST(len(str_split(d.text, ' '))
                - len(list_filter(str_split(d.text, ' '),
                      x -> NOT list_contains(bla.arr, x))) AS BIGINT)
               AS n_removed,
           md5(array_to_string(
               list_filter(str_split(d.text, ' '),
                   x -> NOT list_contains(bla.arr, x)), ' ')) AS clean_fp
    FROM documents d CROSS JOIN bla
"""


# --- LSH-bucketed semantic near-dup ------------------------------------------


def q_semantic_neardup(spark, sf_dir):
    """SemDeDup-style scale path (dedup.cosine_neardup_bucketed):
    cosine >= 0.45 pairs computed only within SRP-LSH buckets — the
    brute-force `embed_neardup` is its recall reference (this result
    is the same-bucket subset of those pairs).  exact=True: buckets and
    sim_e4 are pure integer fixed-point (pagerank discipline), so a dot
    on a sign/floor boundary cannot flip with BLAS thread count or
    engine summation order — the round-2 advisor's flake class."""
    from netbase_spark.operators.dedup import cosine_neardup_bucketed

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return cosine_neardup_bucketed(
        emb, threshold_e4=4500, n_planes=4, exact=True
    )


# Exact-integer mirror of cosine_neardup_bucketed(exact=True):
# components quantized to e4 fixed point (ONE rounded multiply each —
# IEEE-identical on any engine, no summation involved), integer SRP
# sign bits (md5 24-bit weight minus 2^23; the positive 2^24
# denominator cancels inside sign()), and
# sim_e4 = isqrt((10^8 dot^2) div (na nb)) via floor(sqrt(floor(x))) ==
# floor(sqrt(x)), with a +/-1 correction making DuckDB's double sqrt an
# exact integer sqrt (qq <= 10^8, exactly representable).
ORACLE_SEMANTIC_NEARDUP = """
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS iv
        FROM embeddings
    ), planes AS (
        SELECT q.vec_id, p.j,
               list_sum(list_transform(iv,
                   (x, i) -> x *
                       (('0x' || substr(md5(CAST(p.j AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 6))::BIGINT
                        - 8388608))) AS idot
        FROM q CROSS JOIN range(4) p(j)
    ), buckets AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN idot >= 0 THEN 1 << CAST(j AS INT) ELSE 0 END) AS INT) AS bucket
        FROM planes GROUP BY vec_id
    ), pairs AS (
        SELECT l.vec_id AS a, r.vec_id AS b, qa.iv AS va, qb.iv AS vb
        FROM buckets l
        JOIN buckets r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
        JOIN q qa ON qa.vec_id = l.vec_id
        JOIN q qb ON qb.vec_id = r.vec_id
    ), dots AS (
        SELECT a, b,
               CAST(list_sum(list_transform(va, (x, i) -> x * vb[i])) AS HUGEINT) AS dot,
               CAST(list_sum(list_transform(va, x -> x * x)) AS HUGEINT) AS na,
               CAST(list_sum(list_transform(vb, x -> x * x)) AS HUGEINT) AS nb
        FROM pairs
    ), sims AS (
        SELECT a, b,
               (100000000::HUGEINT * dot * dot) // (na * nb) AS qq
        FROM dots WHERE dot > 0 AND na > 0 AND nb > 0
    ), isq AS (
        SELECT a, b, qq,
               CAST(floor(sqrt(CAST(qq AS DOUBLE))) AS BIGINT) AS s0
        FROM sims
    ), sfix AS (
        SELECT a, b,
               s0 + CASE WHEN (s0 + 1) * (s0 + 1) <= qq THEN 1
                         WHEN s0 * s0 > qq THEN -1 ELSE 0 END AS s
        FROM isq
    )
    SELECT a, b, CAST(s AS BIGINT) AS sim_e4 FROM sfix WHERE s >= 4500
"""





# --- PageRank entity salience --------------------------------------------


def q_pagerank(spark, sf_dir):
    """2-iteration PageRank over the supplier->nation->region Type
    graph (materialize.pagerank — the scale extension of the degree
    prior in `degree_rank`)."""
    from netbase_spark.operators.materialize import pagerank

    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = supplier.select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("dst"),
    ).unionByName(
        nation.select(
            F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("dst"),
        )
    )
    return pagerank(edges, iters=2, damping_pct=85)


ORACLE_PAGERANK = """
    WITH edges AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS src,
               'N' || CAST(s_nationkey AS VARCHAR) AS dst FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR),
               'R' || CAST(n_regionkey AS VARCHAR) FROM nation
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), nn AS (
        SELECT count(*) AS n FROM nodes
    ), deg AS (
        SELECT src, count(*) AS outd FROM edges GROUP BY src
    ), pr0 AS (
        -- all-integer e12 fixed point, mirroring materialize.pagerank:
        -- every division is an integer floor-div, bit-deterministic
        SELECT node, 1000000000000 // nn.n AS pr FROM nodes CROSS JOIN nn
    ), c1 AS (
        SELECT e.dst AS node, CAST(SUM(p.pr // d.outd) AS BIGINT) AS c
        FROM edges e JOIN pr0 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst
    ), p1 AS (
        SELECT nd.node,
               (150000000000 // nn.n)
               + (85::BIGINT * coalesce(c1.c, 0)) // 100 AS pr
        FROM nodes nd CROSS JOIN nn LEFT JOIN c1 ON c1.node = nd.node
    ), c2 AS (
        SELECT e.dst AS node, CAST(SUM(p.pr // d.outd) AS BIGINT) AS c
        FROM edges e JOIN p1 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst
    ), p2 AS (
        SELECT nd.node,
               (150000000000 // nn.n)
               + (85::BIGINT * coalesce(c2.c, 0)) // 100 AS pr
        FROM nodes nd CROSS JOIN nn LEFT JOIN c2 ON c2.node = nd.node
    )
    SELECT node, CAST(pr // 1000000 AS BIGINT) AS pr_e6 FROM p2
"""


# --- unigram LM quality score ---------------------------------------------


def q_unigram_lm(spark, sf_dir):
    """Unigram-LM mean token log-probability per document
    (textstats.unigram_logprob) — the cheap perplexity-filter analog."""
    from netbase_spark.operators.textstats import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents"))


ORACLE_UNIGRAM_LM = """
    WITH toks AS (
        SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ), nz AS (
        SELECT doc_id, tok FROM toks WHERE tok <> ''
    ), vocab AS (
        SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM nz GROUP BY tok
    ), tot AS (
        SELECT SUM(c) AS t FROM vocab
    ), lp AS (
        SELECT tok, CAST(floor(ln(c / tot.t) * 1e6) AS BIGINT) AS lp_e6
        FROM vocab CROSS JOIN tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(floor(avg(lp_e6)) AS BIGINT) AS mean_lp_e6
    FROM nz JOIN lp USING (tok) GROUP BY doc_id
"""


EXT4_QUERIES = {
    "pagerank": q_pagerank,
    "unigram_lm": q_unigram_lm,
    "pii_scrub": q_pii_scrub,
    "boilerplate": q_boilerplate,
    "semantic_neardup": q_semantic_neardup,
}

EXT4_ORACLES = {
    "pagerank": ORACLE_PAGERANK,
    "unigram_lm": ORACLE_UNIGRAM_LM,
    "pii_scrub": ORACLE_PII_SCRUB,
    "boilerplate": ORACLE_BOILERPLATE,
    "semantic_neardup": ORACLE_SEMANTIC_NEARDUP,
}


def q_shard_pack(spark, sf_dir):
    """Token-budget training-shard packing per source
    (textstats.shard_pack): deterministic (source, shard_no) assignment
    with a 2000-token budget."""
    from netbase_spark.operators.textstats import shard_pack

    return shard_pack(_t(spark, sf_dir, "documents"), budget_tokens=2000)


ORACLE_SHARD_PACK = """
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST((SUM(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens)
                // 2000 AS BIGINT) AS shard_no
    FROM d
"""

EXT4_QUERIES["shard_pack"] = q_shard_pack
EXT4_ORACLES["shard_pack"] = ORACLE_SHARD_PACK


def q_caption_pairs(spark, sf_dir):
    """Image-caption pair mining (media.caption_candidates) over a
    deterministic interleaved span set: two text chunks per doc at
    offsets 0 and 100, one media span for even docs at an offset that
    varies per doc — so the nearest-text winner varies too."""
    from netbase_spark.operators.media import caption_candidates

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t1 = docs.select(
        "doc_id",
        F.lit("text").alias("kind"),
        F.substring("text", 1, 40).alias("span_text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    t2 = docs.select(
        "doc_id",
        F.lit("text").alias("kind"),
        F.substring("text", 41, 40).alias("span_text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(100).alias("offset"),
    )
    m = docs.where(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.lit("image").alias("kind"),
        F.lit("").alias("span_text"),
        F.concat(
            F.lit("commons/"), F.md5(F.col("doc_id").cast("string")), F.lit(".jpg")
        ).alias("media_ref"),
        (F.lit(10) + F.pmod(F.col("doc_id"), 81)).cast("int").alias("offset"),
    )
    return caption_candidates(t1.unionByName(t2).unionByName(m))


ORACLE_CAPTION_PAIRS = """
    WITH texts AS (
        SELECT doc_id, substr(text, 1, 40) AS caption, 0 AS t_off
        FROM documents WHERE length(substr(text, 1, 40)) > 0
        UNION ALL
        SELECT doc_id, substr(text, 41, 40) AS caption, 100 AS t_off
        FROM documents WHERE length(substr(text, 41, 40)) > 0
    ), media AS (
        SELECT doc_id,
               'commons/' || md5(CAST(doc_id AS VARCHAR)) || '.jpg' AS media_ref,
               CAST(10 + doc_id % 81 AS INT) AS m_off
        FROM documents WHERE doc_id % 2 = 0
    )
    SELECT m.doc_id, m.media_ref, m.m_off, t.caption,
           CAST(abs(m.m_off - t.t_off) AS BIGINT) AS gap
    FROM media m JOIN texts t USING (doc_id)
    QUALIFY row_number() OVER (
        PARTITION BY m.doc_id, m.media_ref, m.m_off
        ORDER BY abs(m.m_off - t.t_off), t.t_off) = 1
"""

EXT4_QUERIES["caption_pairs"] = q_caption_pairs
EXT4_ORACLES["caption_pairs"] = ORACLE_CAPTION_PAIRS


def q_media_neardup(spark, sf_dir):
    """Media near-dup candidate pairs (media.media_phash ->
    dedup.simhash_candidates -> exact hamming annotation): a pool of 40
    distinct media refs reused across the 500 docs, so same-content
    items collide on every band (hamming 0) and cluster; distinct refs
    collide only on chance 16-bit band matches.  The phash rides the
    existing simhash band machinery unchanged (round-2 verdict #9)."""
    from netbase_spark.operators.media import decode_media, media_neardup_pairs

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("image").alias("kind"),
        F.concat(
            F.lit("commons/"),
            F.md5(F.pmod(F.col("doc_id"), F.lit(40)).cast("string")),
            F.lit(".jpg"),
        ).alias("media_ref"),
    )
    pairs = media_neardup_pairs(decode_media(media))
    # decode_media keys items by STRING doc_id, so the candidate join's
    # a<b orientation is lexicographic; reorient numerically to match
    # the oracle's integer a<b (pairs are unordered sets either way)
    al = F.col("a").cast("long")
    bl = F.col("b").cast("long")
    return pairs.select(
        F.least(al, bl).alias("a"),
        F.greatest(al, bl).alias("b"),
        "hamming",
    )


ORACLE_MEDIA_NEARDUP = """
    WITH m AS (
        SELECT doc_id,
               md5('commons/' || md5(CAST(doc_id % 40 AS VARCHAR)) || '.jpg') AS h
        FROM documents
    ), sig AS (
        SELECT doc_id,
               ('0x' || substr(h, 1, 8))::BIGINT AS lo,
               ('0x' || substr(h, 9, 8))::BIGINT AS hi
        FROM m
    )
    SELECT x.doc_id AS a, y.doc_id AS b,
           CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) AS INT) AS hamming
    FROM sig x JOIN sig y
      ON x.doc_id < y.doc_id
     AND ((x.lo & 65535) = (y.lo & 65535)
       OR ((x.lo >> 16) & 65535) = ((y.lo >> 16) & 65535)
       OR (x.hi & 65535) = (y.hi & 65535)
       OR ((x.hi >> 16) & 65535) = ((y.hi >> 16) & 65535))
"""

EXT4_QUERIES["media_neardup"] = q_media_neardup
EXT4_ORACLES["media_neardup"] = ORACLE_MEDIA_NEARDUP
