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
        assert got_df.columns == want_cols, (patterns, rows)
        got = {
            tuple(r[c] for c in want_cols) for r in got_df.collect()
        }
        assert got == want, (patterns, rows, got, want)


def brute_force_optional(rows, required, group):
    """Brute force with ONE SPARQL-OPTIONAL group: each required binding
    extends with each distinct group solution where the whole group
    matches (required vars pre-bound), else nulls for the group's new
    variables."""
    req_cols, req = brute_force(rows, required)
    req_vars = ["?" + c for c in req_cols]
    new = []
    for p in group:
        for t in p:
            if (
                isinstance(t, str) and t.startswith("?")
                and t not in req_vars and t not in new
            ):
                new.append(t)
    all_cols = req_cols + [n[1:] for n in new]
    out = set()
    for binding in req:
        base = dict(zip(req_vars, binding))
        sub_pats = [
            tuple(base.get(t, t) if isinstance(t, str) else t for t in p)
            for p in group
        ]
        cols, sols = brute_force(rows, sub_pats)
        if sols:
            key = ["?" + c for c in cols]
            for s in sols:
                m = dict(zip(key, s))
                out.add(binding + tuple(m.get(n) for n in new))
        else:
            out.add(binding + tuple(None for _ in new))
    return all_cols, out


def test_bgp_grouped_optional_equals_brute_force(spark):
    from netbase_spark.operators.graph_query import bgp_match

    rng = random.Random(4042026)
    subjects = ["a", "b", "c"]
    objs = ["a", "b", "x"]
    for trial in range(15):
        rows = sorted(
            {
                (rng.choice(subjects), rng.choice([1, 2]), rng.choice(objs))
                for _ in range(rng.randint(4, 10))
            }
        )
        df = spark.createDataFrame(rows, "subj string, rel int, obj string")
        required = [("?x", 1, rng.choice(objs))]
        # a 2-pattern group correlated through ?m (new var)
        group = [
            ("?x", 2, "?m"),
            ("?m", rng.choice([1, 2]), rng.choice(["?k", rng.choice(objs)])),
        ]
        want_cols, want = brute_force_optional(rows, required, group)
        got_df = bgp_match(df, required, optional=[group])
        assert got_df.columns == want_cols, (required, group, rows)
        got = {tuple(r[c] for c in want_cols) for r in got_df.collect()}
        assert got == want, (required, group, rows, got, want)


def brute_closure(rows, rel, op, max_hops):
    """Reachability pairs over rel edges within the hop bound."""
    adj = {}
    for s, r, o in rows:
        if r == rel:
            adj.setdefault(s, set()).add(o)
    pairs = set()
    for n in adj:
        seen, frontier = set(), {n}
        for _ in range(max_hops):
            nxt = set().union(*(adj.get(x, set()) for x in frontier)) - seen
            if not nxt:
                break
            seen |= nxt
            frontier = nxt
        pairs |= {(n, b) for b in seen}
    if op == "*":
        nodes = {s for s, _, _ in rows} | {o for _, _, o in rows}
        pairs |= {(n, n) for n in nodes}
    return pairs


def test_bgp_path_equals_brute_force_closure(spark):
    """Path('+'/'*') over random (cyclic) graphs == brute-force bounded
    reachability, on both the driver and the distributed closure path."""
    from netbase_spark.operators.graph_query import Path, path_closure

    rng = random.Random(777)
    nodes = ["a", "b", "c", "d", "e"]
    for trial in range(10):
        rows = sorted(
            {
                (rng.choice(nodes), rng.choice([1, 2]), rng.choice(nodes))
                for _ in range(rng.randint(3, 12))
            }
        )
        df = spark.createDataFrame(rows, "subj string, rel int, obj string")
        op = rng.choice(["+", "*"])
        hops = rng.randint(1, 4)
        want = brute_closure(rows, 1, op, hops)
        p = Path(1, op, hops)
        got_drv = {tuple(r) for r in path_closure(df, p).collect()}
        got_dist = {
            tuple(r) for r in path_closure(df, p, driver_threshold=0).collect()
        }
        assert got_drv == want, (rows, op, hops)
        assert got_dist == want, (rows, op, hops)


def test_bgp_with_path_pattern_equals_brute_force(spark):
    """bgp_match mixing a Path pattern with a plain pattern == brute
    force: enumerate closure pairs (bounded reachability) and join with
    the plain pattern's bindings by hand."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    rng = random.Random(90210)
    nodes = ["a", "b", "c", "d"]
    for trial in range(12):
        rows = sorted(
            {
                (rng.choice(nodes), rng.choice([1, 2]), rng.choice(nodes))
                for _ in range(rng.randint(3, 10))
            }
        )
        df = spark.createDataFrame(rows, "subj string, rel int, obj string")
        op = rng.choice(["+", "*", "?"])
        hops = rng.randint(1, 3)
        inverse = rng.random() < 0.3
        # required: (?x, Path, ?y) joined with (?y, 2, ?z)
        patterns = [
            ("?x", Path(1, op, hops, inverse=inverse), "?y"),
            ("?y", 2, "?z"),
        ]
        pairs = brute_closure(
            [(o, r, s) for s, r, o in rows] if inverse else rows, 1, op, hops
        )
        if op == "?":
            adj = {
                (s, o)
                for s, r, o in (
                    [(o, r, s) for s, r, o in rows] if inverse else rows
                )
                if r == 1
            }
            allnodes = {s for s, _, _ in rows} | {o for _, _, o in rows}
            pairs = adj | {(n, n) for n in allnodes}
        want = {
            (x, y, z)
            for (x, y) in pairs
            for (s2, r2, z) in rows
            if r2 == 2 and s2 == y
        }
        got_df = bgp_match(df, patterns)
        assert got_df.columns == ["x", "y", "z"]
        got = {tuple(r) for r in got_df.collect()}
        assert got == want, (rows, op, hops, inverse, got, want)
