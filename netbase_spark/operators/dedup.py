"""Deduplication & similarity-search operators for training-data
pipelines: SimHash, embedding-cosine near-dup, LSH-bucketed ANN.

(Exact-hash dedup, 3-gram Jaccard, and MinHash+LSH live in the entry
contract as direct DataFrame plans; this module holds the operators
with more structure.)

Scale notes: every operator here is a pure DataFrame plan — the only
shuffles are the per-doc aggregations and the bucket joins, both keyed
well for AQE.  Hash functions are md5/xxhash-derived so the DuckDB
oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 32


def simhash(docs: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): per-token 32-bit md5-derived hashes, bitwise
    majority vote.  Shuffle: one explode + groupBy(doc_id) — partial
    aggregation (map-side combine) keeps the shuffle rows = tokens/doc.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    withbits = toks.select(
        "doc_id",
        *[
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{i}")
            for i in range(bits)
        ],
    )
    agg = withbits.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(bits)]
    )
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_candidates(sigs: DataFrame, band_bits: int = 8) -> DataFrame:
    """Near-dup candidate pairs: docs sharing any of the 32/band_bits
    bands of their simhash (banded LSH over the signature — avoids the
    quadratic all-pairs hamming scan)."""
    n_bands = SIMHASH_BITS // band_bits
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bv")
    l = banded.select(F.col("doc_id").alias("a"), "band", "bv")
    r = banded.select(F.col("doc_id").alias("b"), "band", "bv")
    return (
        l.join(r, ["band", "bv"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(c):
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_neardup_pairs(
    emb: DataFrame, threshold_e4: int = 9500, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (e4-scaled int for stable
    comparison).  Brute-force O(n^2) baseline — correct reference for
    the LSH variants; at scale use ann_lsh_buckets + within-bucket scan.

    Physical plan: BLOCK MATRIX PRODUCT — the right side is broadcast as
    one numpy matrix, the left side streams through ``mapInPandas`` in
    Arrow batches, and each task computes an (batch x n) similarity
    block with one BLAS gemm.  No per-pair expression eval: the old
    crossJoin + higher-order-function dot was interpreted per element
    (no codegen for lambda HOFs) and ~100x slower.  At 10^12 scale the
    broadcast side tiles: loop this operator over right-side tiles that
    fit executor memory (the LSH bucket path is the real scale answer;
    this is the within-bucket/within-tile kernel).
    """
    import numpy as np
    import pandas as pd

    rows = emb.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat, norms))

    thr = int(threshold_e4)

    def block(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            sims = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
            e4 = np.floor(sims * 10000).astype(np.int64)
            keep = (e4 >= thr) & (a_ids[:, None] < b_ids[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {"a": a_ids[ai], "b": b_ids[bj], "sim_e4": e4[ai, bj]}
            )

    par = emb.sparkSession.sparkContext.defaultParallelism
    return (
        emb.repartition(par)
        .mapInPandas(block, schema="a long, b long, sim_e4 long")
    )


def ann_lsh_buckets(
    emb: DataFrame, n_planes: int = 8, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign-random-projection LSH.  Hyperplane h_j weight
    for dimension i is md5-derived in [-0.5, 0.5) — deterministic and
    reproducible in SQL, no RNG.  At scale the bucket id prunes the
    candidate set from O(n^2) to O(sum b_i^2)."""
    dims = F.transform(
        F.col(vec_col),
        lambda x, i: F.struct(x.cast("double").alias("v"), i.alias("i")),
    )
    bucket = None
    for j in range(n_planes):
        w = lambda d: (  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), d["i"].cast("string"))), 1, 6
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(1 << 24))
            - F.lit(0.5)
        )
        dot_j = F.aggregate(
            dims, F.lit(0.0), lambda acc, d: acc + d["v"] * w(d)
        )
        bit = F.when(dot_j >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return emb.select(F.col(id_col).alias("vec_id"), bucket.cast("int").alias("bucket"))


def ann_topk_bucketed(
    emb: DataFrame, query_id: int, k: int = 10, n_planes: int = 4
) -> DataFrame:
    """Top-k cosine within the query's LSH bucket (the scale path; the
    brute-force baseline in the entry contract is its correctness
    reference at small n)."""
    buckets = ann_lsh_buckets(emb, n_planes)
    with_b = emb.join(buckets, "vec_id")
    qb = with_b.where(F.col("vec_id") == query_id).select(
        F.col("bucket").alias("qbucket"), F.col("embedding").alias("qv")
    )
    cands = with_b.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket")).where(
        F.col("vec_id") != query_id
    )
    sim = F.floor(
        _dot(F.col("embedding"), F.col("qv"))
        / (_norm(F.col("embedding")) * _norm(F.col("qv")))
        * 10000
    ).cast("long")
    scored = cands.select("vec_id", sim.alias("sim_e4"))
    # global top-k as orderBy+limit -> TakeOrderedAndProject (per-partition
    # heap + driver merge), NOT a single-partition global Window sort
    return scored.orderBy(F.col("sim_e4").desc(), F.col("vec_id").asc()).limit(k)
