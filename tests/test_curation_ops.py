"""TF-IDF keyword extraction + deterministic stratified sampling —
training-data curation operators (no reference twin; north-rule
additions alongside dedup/quality/lang-id)."""

import math

from pyspark.sql import functions as F

from netbase_spark.operators.textstats import (
    sample_stratified,
    tfidf_top_terms,
)


def test_tfidf_ranks_distinctive_terms_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana common"),
            (2, "banana banana cherry common"),
            (3, "cherry dates common common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2, min_df=1)
    rows = {(r.doc_id, r.rank): (r.term, r.tf, r.df) for r in out.collect()}
    # doc 1: 'apple' (tf=3, df=1) is the most distinctive term
    assert rows[(1, 1)][0] == "apple"
    # 'common' appears in every doc -> idf = ln(4/4) = 0 -> never rank 1
    assert all(term != "common" for (term, _, _) in
               [rows[(d, 1)] for d in (1, 2, 3)])
    # score matches the documented formula exactly
    term, tf, df = rows[(1, 1)]
    score = next(
        r.score_e6 for r in out.collect() if r.doc_id == 1 and r.rank == 1
    )
    assert score == math.floor(tf * math.log((3 + 1) / (df + 1)) * 1e6)


def test_tfidf_min_df_drops_rare_terms(spark):
    docs = spark.createDataFrame(
        [(1, "solo shared"), (2, "shared")], "doc_id long, text string"
    )
    terms = {r.term for r in tfidf_top_terms(docs, k=5, min_df=2).collect()}
    assert terms == {"shared"}  # 'solo' has df=1 < min_df


def test_stratified_sample_is_partition_invariant(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    frac = {"en": 0.5, "de": 0.2}
    a = {r.doc_id for r in sample_stratified(docs, "lang", frac).collect()}
    b = {
        r.doc_id
        for r in sample_stratified(
            docs.repartition(17, "lang"), "lang", frac
        ).collect()
    }
    assert a == b  # keep set is a pure function of the id, not layout
    # fractions roughly honored (md5 is uniform; 2000 ids)
    en_total = 2000 // 3 + 1
    en_kept = sum(1 for i in a if i % 3 == 0)
    assert abs(en_kept / en_total - 0.5) < 0.1
    de_kept = len(a) - en_kept
    assert abs(de_kept / (2000 - en_total) - 0.2) < 0.1


def test_stratified_sample_drops_unlisted_strata_and_salt_decorrelates(spark):
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.lit("xx").alias("lang")
    )
    assert sample_stratified(docs, "lang", {"en": 1.0}).count() == 0
    full = docs.withColumn("lang", F.lit("en"))
    s1 = {r.doc_id for r in
          sample_stratified(full, "lang", {"en": 0.5}, salt="a").collect()}
    s2 = {r.doc_id for r in
          sample_stratified(full, "lang", {"en": 0.5}, salt="b").collect()}
    assert s1 != s2  # independent draws
    overlap = len(s1 & s2) / 500
    assert 0.15 < overlap < 0.35  # ~0.25 expected for two 50% draws


def test_decontamination_flags_eval_overlap(spark):
    from netbase_spark.operators.textstats import (
        contaminated_doc_ids,
        decontamination_pairs,
        winnow_fingerprints,
    )

    leak = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    corpus = spark.createDataFrame(
        [
            (1, "intro words then " + leak + " trailing text here"),
            (2, "totally unrelated content about different things entirely"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(900, "question setup " + leak + " answer choices follow")],
        "doc_id long, text string",
    )
    pairs = decontamination_pairs(
        winnow_fingerprints(corpus, k=4, w=5),
        winnow_fingerprints(evals, k=4, w=5),
        min_shared=1,
    )
    got = {(r.doc_id, r.eval_id) for r in pairs.collect()}
    # winnowing guarantee: a shared >= w+k-1 = 8-token run shares a fp
    assert (1, 900) in got
    assert all(d != 2 for d, _ in got)
    assert {r.doc_id for r in contaminated_doc_ids(pairs).collect()} == {1}


def test_domain_quota_cap_and_determinism(spark):
    from netbase_spark.operators.textstats import domain_quota

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("host"), (F.col("id") % 3).cast("string")).alias(
            "source"
        ),
    )
    a = domain_quota(docs, cap=7)
    counts = {r.source: r.n for r in
              a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"host0": 7, "host1": 7, "host2": 7}
    b = domain_quota(docs.repartition(13), cap=7)
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}


def test_repetition_stats_gopher_rule(spark):
    from netbase_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # 5 bigrams, 1 distinct
            (2, "all words here are fully unique"),
            (3, "one"),  # < n tokens -> zero ngrams
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs, n=2).collect()}
    assert rows[1].total_ngrams == 5 and rows[1].distinct_ngrams == 1
    assert rows[1].dup_ratio_e6 == 800000
    assert rows[2].dup_ratio_e6 == 0
    assert rows[3].total_ngrams == 0 and rows[3].dup_ratio_e6 == 0
