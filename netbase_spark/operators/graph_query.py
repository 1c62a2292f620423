"""Conjunctive basic-graph-pattern (BGP) matching over the triple table.

The reference's query surface composes per-subject condition trees
(filter And/Or trees, src/query.cpp:735-833; bare where-terms
src/query.cpp:1506-1533) and fixed multi-hop shapes (getTopic chains,
src/query.cpp:2171; findProperties legs, src/query.cpp:2127-2351).  A
BGP generalizes both: a list of (subj, rel, obj) patterns over shared
variables — "?x Instance city, ?x population ?p" — evaluated as a join
tree.  This is the SPARQL-core fragment a triple store needs; on Spark
it is a sequence of self-joins over the one triple table, so the whole
planner's job is ORDER and JOIN STRATEGY:

- patterns are ordered most-constant-first (a (c, c, ?v) pattern is a
  point/range scan; a (?a, c, ?b) pattern is a predicate partition; a
  fully-variable pattern is a full scan) — the classic selectivity
  heuristic, applied statically so the plan is deterministic;
  ties keep user order, and patterns sharing NO variable with the
  bindings so far are deferred (joining them early would be a
  cartesian product);
- each step filters the triple table on the pattern's constants
  (predicate/subject pushdown reaches the scan — rel is the partition
  column of the canonical table, materialize.write_triples) and joins
  on the shared variables; Catalyst/AQE pick broadcast vs shuffle from
  runtime sizes, so a selective first pattern makes every later join
  broadcast-sized;
- a pattern with no shared variable left (disconnected component)
  falls back to an explicit crossJoin LAST, when bindings are already
  minimal — documented, not accidental.

Variables are ``?name`` strings; constants are matched with equality
(rel constants as ints).  Output: one column per variable in first-
appearance order, distinct bindings (set semantics, like the
reference's dedup-at-insert result lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("subj", "rel", "obj")


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _selectivity(pattern) -> int:
    """Lower sorts earlier: count of variables (0 = all constants)."""
    return sum(1 for t in pattern if _is_var(t))


def _const_compatible(term, dtype) -> bool:
    """Can a Python constant inhabit a column of this Spark type?"""
    from pyspark.sql import types as T

    if isinstance(dtype, T.StringType):
        return isinstance(term, str)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return isinstance(term, int) and not isinstance(term, bool)
    return True  # other types: let Spark's own coercion rules decide


def _pattern_step(triples: DataFrame, pat) -> tuple[DataFrame, list[str]]:
    """Filter ``triples`` on the pattern's constants and project its
    variables (repeated variables inside the pattern become equality
    filters).  Returns (step_df, unique ?vars in position order); a
    variable-free pattern projects a single ``_one`` literal."""
    step = triples
    for col, term in zip(_POS, pat):
        if not _is_var(term):
            step = step.where(F.col(col) == F.lit(term))
    seen: dict[str, str] = {}
    cols = []
    for col, term in zip(_POS, pat):
        if _is_var(term):
            if term in seen:
                step = step.where(F.col(col) == F.col(seen[term]))
            else:
                seen[term] = col
                cols.append(F.col(col).alias(term[1:]))
    step = step.select(*cols) if cols else step.select(F.lit(1).alias("_one"))
    return step, list(seen)


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple],
    distinct: bool = True,
    optional: list[tuple] | None = None,
    not_exists: list[tuple] | None = None,
) -> DataFrame:
    """Match a conjunctive BGP; returns bindings for every variable.

    ``patterns`` is a list of (subj, rel, obj) with ``?var`` strings in
    any position.  Raises on zero patterns or a pattern with no
    variables that could never bind (constant-only patterns are allowed
    — they act as existence filters via an inner join on no columns ==
    a semi-join guard, implemented as a crossJoin with the 0/1-row
    filtered table).

    ``optional`` patterns LEFT-join after the required block (SPARQL
    OPTIONAL): their new variables bind where the pattern matches and
    are null elsewhere.  ``not_exists`` patterns ANTI-join (SPARQL
    FILTER NOT EXISTS): bindings with a match are removed; variables
    appearing only there are existential, never output.  Each
    optional/not_exists pattern is independent (a single-pattern group,
    not a nested group graph pattern) and must share at least one
    variable with the required block.  The same cross-domain type rule
    applies: an optional pattern that can never match contributes null
    columns; an impossible not_exists pattern removes nothing."""
    if not patterns:
        raise ValueError("bgp_match needs at least one pattern")
    for p in list(patterns) + list(optional or []) + list(not_exists or []):
        if len(p) != 3:
            raise ValueError(f"pattern must be (subj, rel, obj): {p!r}")

    # static selectivity order, stable for ties (user order)
    ordered = sorted(range(len(patterns)), key=lambda i: (_selectivity(patterns[i]), i))

    # symbolic pre-pass: fix the execution sequence (shared-variable
    # preference, see below), the output column order, and each
    # variable's column TYPE.  A variable bound in two positions whose
    # input columns have different Spark types (e.g. string subj vs int
    # rel) can never match — the domains are disjoint — so the result
    # is EMPTY by semantics; executing the join anyway would make ANSI
    # mode throw a cast error on the first string node id.  The
    # pre-pass returns the execution plan for the normal case and
    # detects the conflict for the empty short-circuit.
    dtype_of = {c: triples.schema[c].dataType for c in _POS}
    pending_sym = [patterns[i] for i in ordered]
    sequence: list[tuple] = []
    var_order: list[str] = []
    var_type: dict[str, object] = {}
    bound_sym: set[str] = set()
    conflict = False
    while pending_sym:
        idx = 0
        if bound_sym:
            for j, p in enumerate(pending_sym):
                if any(_is_var(t) and t in bound_sym for t in p):
                    idx = j
                    break
        pat = pending_sym.pop(idx)
        sequence.append(pat)
        for col, term in zip(_POS, pat):
            if _is_var(term):
                dt = dtype_of[col]
                if term in var_type:
                    if var_type[term] != dt:
                        conflict = True
                else:
                    var_type[term] = dt
                if term not in bound_sym:
                    bound_sym.add(term)
                    var_order.append(term[1:])
            elif not _const_compatible(term, dtype_of[col]):
                # SPARQL-style: a constant whose type cannot inhabit the
                # column (string literal in an int rel slot) matches
                # nothing — same empty short-circuit as a var conflict
                conflict = True

    def _side_plan(pats, kind):
        """Symbolic pass for optional/not_exists patterns: per pattern
        (possible?, vars shared with the required block, new vars with
        their position types).  Validates the shared-variable rule."""
        plan = []
        seen_new: set[str] = set()
        for pat in pats or []:
            shared = [t for t in dict.fromkeys(pat) if _is_var(t) and t in bound_sym]
            if not shared:
                raise ValueError(
                    f"{kind} pattern {pat!r} shares no variable with the "
                    "required patterns"
                )
            possible = True
            new: list[tuple[str, object]] = []
            local_type: dict[str, object] = {}
            for col, term in zip(_POS, pat):
                if _is_var(term):
                    dt = dtype_of[col]
                    known = var_type.get(term, local_type.get(term))
                    if known is not None and known != dt:
                        possible = False
                    if term not in bound_sym and term not in local_type:
                        local_type[term] = dt
                        new.append((term, dt))
                elif not _const_compatible(term, dtype_of[col]):
                    possible = False
            if kind == "optional":
                for v, _dt in new:
                    if v in seen_new:
                        raise ValueError(
                            f"optional variable {v!r} appears in two optional "
                            "patterns; optionals are independent single-"
                            "pattern groups and cannot correlate"
                        )
                    seen_new.add(v)
            plan.append((pat, possible, shared, new))
        return plan

    opt_plan = _side_plan(optional, "optional")
    ne_plan = _side_plan(not_exists, "not_exists")

    if conflict:
        from pyspark.sql import types as T

        fields = [
            T.StructField(v[1:], var_type[v]) for v in bound_sym
            if v[1:] in var_order
        ]
        fields.sort(key=lambda f: var_order.index(f.name))
        # the required block can never match, so optional vars are all
        # null — but they are still output columns
        for _pat, _possible, _shared, new in opt_plan:
            fields.extend(T.StructField(v[1:], dt) for v, dt in new)
        return triples.sparkSession.createDataFrame([], T.StructType(fields))

    out: DataFrame | None = None
    bound: set[str] = set()
    var_order = []

    for pat in sequence:
        step = triples
        for col, term in zip(_POS, pat):
            if not _is_var(term):
                step = step.where(F.col(col) == F.lit(term))
        # project variables; a repeated variable inside ONE pattern
        # (e.g. (?x, r, ?x)) becomes an equality filter
        seen_here: dict[str, str] = {}
        cols = []
        for col, term in zip(_POS, pat):
            if _is_var(term):
                if term in seen_here:
                    step = step.where(F.col(col) == F.col(seen_here[term]))
                else:
                    seen_here[term] = col
                    cols.append(F.col(col).alias(term[1:]))
        step = step.select(*cols) if cols else step.select(F.lit(1).alias("_one"))
        if not cols:
            # constant-only pattern: existence guard
            step = step.limit(1)

        pvars = [t for t in pat if _is_var(t)]
        if out is None:
            out = step
        else:
            on = list(dict.fromkeys(v[1:] for v in pvars if v in bound))
            if not cols:
                # constant-only existence guard: inner join with the
                # 0/1-row table keeps or empties the bindings
                out = out.crossJoin(step).drop("_one")
            elif not on:
                out = out.crossJoin(step)  # disconnected component, deferred
            else:
                out = out.join(step, on)
        for v in pvars:
            if v not in bound:
                bound.add(v)
                var_order.append(v[1:])

    # OPTIONAL: left-join each pattern on its required-shared variables;
    # an impossible pattern (type conflict) contributes its new columns
    # as typed nulls
    for pat, possible, shared, new in opt_plan:
        if possible:
            step, pvars = _pattern_step(triples, pat)
            keep = [t[1:] for t in shared] + [v[1:] for v, _dt in new]
            out = out.join(step.select(*keep), [t[1:] for t in shared], "left")
        else:
            for v, dt in new:
                out = out.withColumn(v[1:], F.lit(None).cast(dt))
        var_order.extend(v[1:] for v, _dt in new)

    # FILTER NOT EXISTS: anti-join on the required-shared variables;
    # an impossible pattern matches nothing, so it removes nothing
    for pat, possible, shared, _new in ne_plan:
        if possible:
            step, _pvars = _pattern_step(triples, pat)
            on = [t[1:] for t in shared]
            out = out.join(step.select(*on), on, "left_anti")

    res = out.select(*var_order) if var_order else out
    return res.distinct() if distinct else res
