"""The reference's string filter mini-language compiled to Column trees.

Reference: ``filter(NodeVector, cchar* matches)`` evaluates ``a=b``,
``a!=b``, ``a~b`` (approximately), ``a>b``, ``a<b`` and bare-word
membership over result vectors (src/query.cpp:629-723); ``parseFilter``
splits query filter strings on "," / " and " into patterns
(src/query.cpp:398-470, 472-517); And composes sequentially, Or unions,
Not excludes (src/query.cpp:735-795).

Spark-first: each leaf compiles to a Column predicate over a wide
property row (one column per predicate — the ``collectFieldsAndFacets``
projection shape), so the whole filter tree stays inside whole-stage
codegen and pushes down to the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OP_RE = re.compile(r"^\s*([\w .]+?)\s*(!=|>=|<=|=|>|<|~)\s*(.+?)\s*$")
APPROX_PCT = 0.1  # `~` tolerance: |a-b| <= 10% of b (isAproxymately analog)


def _leaf(expr: str, bare_cols: frozenset = frozenset()) -> Column:
    m = _OP_RE.match(expr)
    if not m:
        # bare word: membership (findMatch/findMember, src/query.cpp:
        # 1506-1533).  When the word is a pivoted property column
        # (``bare_cols``), "has the property" answers — testDummyLogic's
        # "size=11 and funny" (src/tests.cpp:377-390); a "T.P" form
        # addresses the property of the current table's rows.  Either
        # way the node NAME matching the word also passes.
        w = expr.strip().strip('"')
        key = w.replace(" ", "_").split(".")[-1]
        # node names are normalized to SPACES — match the space form,
        # not the underscored pivot-column key
        name_hit = F.lower(F.col("name")).contains(key.replace("_", " ").lower())
        if key in bare_cols:
            return F.col(key).isNotNull() | name_hit
        return name_hit
    field, op, raw = m.groups()
    field = field.strip().replace(" ", "_")
    col = F.col(field)
    is_num = re.fullmatch(r"-?\d+(\.\d+)?", raw) or raw.startswith("#")
    # unit-typed RHS ("length > 14 m"): both sides normalize through
    # the rdfValue unit table and compare in base units, with a unit
    # guard so 14 m never matches 14 kg (value-node comparisons,
    # src/netbase.cpp:2027-2060; testValueQuery src/tests.cpp:957-1006)
    um = re.fullmatch(r"(-?\d+(?:\.\d+)?)\s*([A-Za-z%]+)", raw.lstrip("#"))
    if not is_num and um:
        from netbase_spark.functions.values import UNIT_TABLE, parse_typed_literal

        entry = UNIT_TABLE.get(um.group(2)) or UNIT_TABLE.get(um.group(2).lower())
        if entry is not None:
            canon, mult = entry
            base = float(um.group(1)) * mult
            parsed = parse_typed_literal(col)
            num = parsed.getField("num")
            same_unit = parsed.getField("unit") == canon
            if op == "~":
                cmpc = F.abs(num - base) <= F.lit(abs(base) * APPROX_PCT)
            elif op == "=":
                cmpc = num == base
            elif op == "!=":
                return ~(same_unit & (num == base))
            elif op == ">":
                cmpc = num > base
            elif op == "<":
                cmpc = num < base
            elif op == ">=":
                cmpc = num >= base
            elif op == "<=":
                cmpc = num <= base
            else:
                raise ValueError(f"unsupported op {op!r}")
            return same_unit & cmpc
    val = raw.lstrip("#")
    if is_num:
        col = col.cast("double")
        v: Column | float = float(val)
    else:
        v = val.strip('"')
    if op == "=":
        # case/underscore-insensitive eq for strings (util.cpp:325-343)
        if is_num:
            return col == v
        return F.lower(F.regexp_replace(col, "_", " ")) == str(v).lower().replace("_", " ")
    if op == "!=":
        return ~(col == v) if is_num else ~(
            F.lower(F.regexp_replace(col, "_", " ")) == str(v).lower().replace("_", " ")
        )
    if op == ">":
        return col > v
    if op == "<":
        return col < v
    if op == ">=":
        return col >= v
    if op == "<=":
        return col <= v
    if op == "~":
        if is_num:
            return F.abs(col - v) <= F.lit(abs(float(val)) * APPROX_PCT)
        # circa on a text field: approximate string match, not a crash
        return F.lower(F.regexp_replace(col, "_", " ")).contains(
            str(v).lower().replace("_", " ")
        )
    raise ValueError(f"unsupported op {op!r}")


def compile_filter(s: str, bare_cols: frozenset = frozenset()) -> Column:
    """Filter string -> one Column predicate.

    Split semantics follow parseFilter: " or " makes a union (|);
    "," and " and " compose sequentially (&); a leading "not " on a
    term negates it (exclude).
    """
    ors = re.split(r"\s+or\s+", s, flags=re.I)
    out: Column | None = None
    for branch in ors:
        terms = re.split(r",|\s+and\s+", branch, flags=re.I)
        b: Column | None = None
        for t in terms:
            t = t.strip()
            if not t:
                continue
            neg = t.lower().startswith("not ")
            leaf = _leaf(t[4:] if neg else t, bare_cols)
            leaf = ~leaf if neg else leaf
            b = leaf if b is None else (b & leaf)
        if b is not None:
            out = b if out is None else (out | b)
    if out is None:
        raise ValueError(f"empty filter {s!r}")
    return out


def apply_filter(df: DataFrame, s: str) -> DataFrame:
    return df.where(compile_filter(s))
