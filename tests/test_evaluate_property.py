"""Randomized property tests for operators/evaluate: merge_triples,
merge_counts, and triple_set_pr against brute-force Python twins, on
both gate paths (broadcast and forced-overflow)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from netbase_spark.session import get_spark

SCHEMA = "subj string, rel int, obj string, rule string, doc_id string"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="test_evaluate_prop", cpus=4, shuffle_partitions=4,
                  driver_memory="4g")
    yield s


def _rand_triples(rng, n):
    return [
        (
            rng.choice("abcd"),
            rng.choice([1, 2]),
            rng.choice("xyz"),
            rng.choice(["r1", "r2"]),
            f"d{rng.randint(0, 9)}",
        )
        for _ in range(n)
    ]


def brute_merge(existing, delta):
    """First-writer-wins upsert with deterministic within-delta dedup."""
    best = {}
    for row in delta:
        k, rest = row[:3], row[3:]
        if k not in best or rest < best[k]:
            best[k] = rest
    have = {r[:3] for r in existing}
    return set(existing) | {
        k + rest for k, rest in best.items() if k not in have
    }


def test_merge_triples_matches_brute_force(spark):
    from netbase_spark.operators.evaluate import merge_triples

    rng = random.Random(20260821)
    for trial in range(10):
        ex_rows = _rand_triples(rng, rng.randint(0, 12))
        # existing must be key-unique (it is a canonical table)
        ex_dedup = list({r[:3]: r for r in ex_rows}.values())
        de_rows = _rand_triples(rng, rng.randint(0, 12))
        existing = spark.createDataFrame(ex_dedup, SCHEMA) if ex_dedup else (
            spark.createDataFrame([], SCHEMA))
        delta = spark.createDataFrame(de_rows, SCHEMA) if de_rows else (
            spark.createDataFrame([], SCHEMA))
        want = brute_merge(ex_dedup, de_rows)
        cap = 1 if trial % 2 else None  # alternate gate paths
        got = {
            tuple(r)
            for r in merge_triples(existing, delta, cap_bytes=cap).collect()
        }
        assert got == want, (trial, ex_dedup, de_rows)


def test_merge_counts_matches_brute_force(spark):
    from netbase_spark.operators.evaluate import merge_counts

    rng = random.Random(7)
    for trial in range(10):
        a = [(rng.choice("pqrs"),) for _ in range(rng.randint(0, 15))]
        b = [(rng.choice("pqrs"),) for _ in range(rng.randint(0, 15))]
        if not a:
            continue  # existing count table built from a
        adf = spark.createDataFrame(a, "node string")
        bdf = spark.createDataFrame(b, "node string") if b else (
            spark.createDataFrame([], "node string"))
        existing = adf.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
        cap = 1 if trial % 2 else None
        got = {
            (r.node, r.degree)
            for r in merge_counts(existing, bdf, ("node",), "degree",
                                  cap_bytes=cap).collect()
        }
        want = {}
        for (n,) in a + b:
            want[n] = want.get(n, 0) + 1
        assert got == set(want.items()), (trial, a, b)


def test_triple_set_pr_matches_brute_force(spark):
    from netbase_spark.operators.evaluate import triple_set_pr

    rng = random.Random(99)
    for _ in range(6):
        g = {r[:3] for r in _rand_triples(rng, rng.randint(1, 15))}
        e = {r[:3] for r in _rand_triples(rng, rng.randint(1, 15))}
        gdf = spark.createDataFrame(sorted(g), "subj string, rel int, obj string")
        edf = spark.createDataFrame(sorted(e), "subj string, rel int, obj string")
        row = triple_set_pr(gdf, edf).collect()[0]
        tp = len(g & e)
        assert (row.tp, row.got_n, row.expected_n) == (tp, len(g), len(e))
        assert row.precision == round(tp / len(g), 6)
        assert row.recall == round(tp / len(e), 6)
