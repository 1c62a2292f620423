"""Property test: bgp_match equals a brute-force Python BGP evaluator
on randomized small triple sets and pattern lists (any variable
placement, repeated variables, constants, disconnected components)."""

from __future__ import annotations

import itertools
import random

import pytest

from netbase_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="test_graph_query_prop", cpus=4, shuffle_partitions=4,
                  driver_memory="4g")
    yield s


def brute_force(rows, patterns):
    """All distinct variable bindings (first-appearance order) such that
    every pattern matches some triple."""
    var_order = []
    for p in patterns:
        for t in p:
            if isinstance(t, str) and t.startswith("?") and t not in var_order:
                var_order.append(t)
    out = set()
    for combo in itertools.product(rows, repeat=len(patterns)):
        binding = {}
        ok = True
        for (s, r, o), pat in zip(combo, patterns):
            for val, term in zip((s, r, o), pat):
                if isinstance(term, str) and term.startswith("?"):
                    if binding.get(term, val) != val:
                        ok = False
                        break
                    binding[term] = val
                elif val != term:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            out.add(tuple(binding[v] for v in var_order))
    return [v[1:] for v in var_order], out


def test_bgp_match_equals_brute_force(spark):
    from netbase_spark.operators.graph_query import bgp_match

    rng = random.Random(20260821)
    subjects = ["a", "b", "c", "d"]
    rels = [1, 2]
    objs = ["a", "b", "x", "y"]
    for trial in range(25):
        rows = sorted(
            {
                (rng.choice(subjects), rng.choice(rels), rng.choice(objs))
                for _ in range(rng.randint(3, 10))
            }
        )
        df = spark.createDataFrame(rows, "subj string, rel int, obj string")
        n_pat = rng.randint(1, 3)
        vars_pool = ["?x", "?y", "?z"]
        patterns = []
        for _ in range(n_pat):
            # constants occasionally land in the WRONG domain (an int in
            # subj/obj, a string in rel): must yield empty, not a cast
            # error; variables landing in both domains likewise
            pat = tuple(
                rng.choice(
                    [rng.choice(vars_pool), rng.choice(rels)]
                    + ([rng.choice(subjects)] if rng.random() < 0.1 else [])
                    if pos == 1
                    else [rng.choice(vars_pool), rng.choice(subjects + objs)]
                    + ([rng.choice(rels)] if rng.random() < 0.1 else [])
                )
                for pos in range(3)
            )
            patterns.append(pat)
        want_cols, want = brute_force(rows, patterns)
        if not want_cols:
            continue  # constant-only BGPs return a guard table, not bindings
        got_df = bgp_match(df, patterns)
        assert sorted(got_df.columns) == sorted(want_cols), (patterns, rows)
        got = {
            tuple(r[c] for c in want_cols) for r in got_df.collect()
        }
        assert got == want, (patterns, rows, got, want)
