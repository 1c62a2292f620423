"""Typed RDF literal parsing with unit normalization — ``rdfValue``.

Reference: ``rdfValue`` parses ``"33"^^xsd:integer``, ``"4.5"^^<km/s>``
with a unit-normalization table (m/km/kg/%/gYear/dateTime/ISBN...),
producing a double plus unit (src/netbase.cpp:1358-1443); plain numeric
autoparse in ``getThe`` (src/netbase.cpp:1215-1218); date values
(src/netbase.cpp:1344-1350).

Spark-first: a single projection of regexp_extract + when-chains; the
unit multiplier table is a map literal.  No UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# unit -> (canonical unit, multiplier) — normalization to base units as
# the reference does km->m etc. (src/netbase.cpp:1358-1443)
UNIT_TABLE: dict[str, tuple[str, float]] = {
    "m": ("m", 1.0),
    "km": ("m", 1000.0),
    "cm": ("m", 0.01),
    "mm": ("m", 0.001),
    "kg": ("kg", 1.0),
    "g": ("kg", 0.001),
    "t": ("kg", 1000.0),
    "s": ("s", 1.0),
    "h": ("s", 3600.0),
    "min": ("s", 60.0),
    "%": ("ratio", 0.01),
    "km/s": ("m/s", 1000.0),
    "m/s": ("m/s", 1.0),
    "meter": ("m", 1.0),
    "mg": ("kg", 1e-6),
}

_LIT_RE = r'^"([^"]*)"(?:\^\^<?([^>]*?)>?|@(\w+))?$'


def parse_typed_literal(c: Column) -> Column:
    """literal string -> struct(text, num, unit, kind, lang).

    kind: 'number' | 'date' | 'string' (the Value union discriminant,
    src/netbase.hpp:79-97).
    """
    text = F.regexp_extract(c, _LIT_RE, 1)
    dtype = F.regexp_extract(c, _LIT_RE, 2)
    lang = F.regexp_extract(c, _LIT_RE, 3)
    # bare (unquoted) values autoparse like getThe
    text = F.when(text == "", c).otherwise(text)

    # bare "NUM UNIT" strings parse like the reference's parseValue
    # ("3.4 mg" -> 3.4, mg; "14.3 meter" -> 14.3, m — testValueLogic
    # src/tests.cpp:818-870, testPropertyQuery 1025-1027)
    _BARE = r"^(-?\d+(?:\.\d+)?)\s+(\S+)$"
    bare_num = F.regexp_extract(text, _BARE, 1)
    bare_unit = F.regexp_extract(text, _BARE, 2)

    # datatype local name: after '#' for full IRIs (...XMLSchema#gYear)
    # and after ':' for prefixed forms (xsd:gYear) — both documented
    unit_raw = F.when(
        dtype != "", F.element_at(F.split(dtype, "[#:]"), -1)
    ).otherwise(bare_unit)
    unit_entries = [F.lit(x) for u, (cu, m) in UNIT_TABLE.items() for x in (u, cu)]
    mult_entries = [F.lit(x) for u, (cu, m) in UNIT_TABLE.items() for x in (u, m)]
    unit_map = F.create_map(*unit_entries)
    mult_map = F.create_map(*mult_entries)

    known_bare = (bare_num != "") & unit_map[bare_unit].isNotNull()
    is_num = text.rlike(r"^-?\d+(\.\d+)?$") | known_bare
    is_date = text.rlike(r"^\d{4}-\d{2}-\d{2}") | unit_raw.isin("gYear", "date", "dateTime")
    num = (
        F.when(text.rlike(r"^-?\d+(\.\d+)?$"), text.cast("double"))
        .when(known_bare, bare_num.cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )
    mult = F.coalesce(mult_map[unit_raw], F.lit(1.0))
    return F.struct(
        text.alias("text"),
        (num * mult).alias("num"),
        F.coalesce(unit_map[unit_raw], F.lit(None).cast("string")).alias("unit"),
        F.when(is_date, F.lit("date"))
        .when(is_num, F.lit("number"))
        .otherwise(F.lit("string"))
        .alias("kind"),
        F.when(lang == "", F.lit(None).cast("string")).otherwise(lang).alias("lang"),
    )


def with_typed_values(triples: DataFrame, obj_col: str = "obj") -> DataFrame:
    """Attach the parsed value struct to literal objects."""
    return triples.withColumn("value", parse_typed_literal(F.col(obj_col)))


def compare(a: Column, b: Column, op: str) -> Column:
    """Numeric comparisons incl. approx (isEqual/isGreater/isLess/
    isAproxymately, src/netbase.cpp:2027-2073)."""
    if op == "=":
        return a == b
    if op == ">":
        return a > b
    if op == "<":
        return a < b
    if op == "~":
        return F.abs(a - b) <= F.abs(b) * 0.1
    raise ValueError(op)
