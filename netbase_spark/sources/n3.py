"""N-Triples / Turtle-line ingestion — the ``importN3`` analog.

Reference: ``importN3`` scans NT lines with ``sscanf("%s\\t%s\\t%[^@>]s")``,
strips angle brackets / namespace prefixes, resolves Q/P wikidata ids on
a fast path, and drops external-ID predicates before creating statements
(src/import.cpp:1824-1919, 1670-1741, 1744-1791).

Spark-first: the whole parse is JVM-side column expressions over
``spark.read.text`` lines — regexp_extract for the three terms, a
``when``-chain for IRI resolution (the ``getEntity`` fast paths), and a
broadcast predicate-canonicalization map (``getRelation``).  Nothing
leaves whole-stage codegen; filters push down to the text scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one NT line: <subj> <pred> "literal"|<iri> .   (whitespace separated)
# literal bodies may contain escaped quotes (\"), language tags may
# carry BCP-47 subtags (@en-GB, @zh-hans) — both are valid N-Triples
# that a \w-only tag or [^"]* body would silently drop as malformed
_TERM = r"(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:\^\^<[^>]*>|@[\w-]+)?)"
NT_LINE_RE = rf"^\s*{_TERM}\s+{_TERM}\s+{_TERM}\s*\.\s*$"

# external-ID predicates dropped at import (dropBadPredicate,
# src/import.cpp:1757-1786: VIAF/Freebase/GND ids etc.) — ONE list,
# shared with the relations registry, compared case-insensitively
from netbase_spark.relations import DROP_PREDICATES as _REGISTRY_DROPS

DROP_PREDICATES = tuple(
    sorted(
        {p.lower() for p in _REGISTRY_DROPS}
        | {"p213", "p214", "p227", "p244", "p646", "p1245"}
    )
)


def resolve_term(c: Column) -> Column:
    """``getEntity`` fast paths as a when-chain (src/import.cpp:1670-1741):

    - ``_:b0`` blank node -> kept verbatim;
    - ``"lit"^^<type>`` / ``"lit"@lang`` -> bare literal text;
    - ``<.../Q123>`` / ``<.../P31>`` -> ``Q123`` / ``P31`` id slot;
    - other IRIs -> local name after the last ``#`` or ``/``
      (namespace cut, src/import.cpp:1689-1702), underscores -> spaces.
    """
    qp = F.regexp_extract(c, r"<[^>]*/([QP]\d+)>$", 1)
    lit_raw = F.regexp_extract(c, r'^"((?:[^"\\]|\\.)*)"', 1)
    lit = F.regexp_replace(lit_raw, r'\\(["\\])', "$1")  # u8_unescape
    local = F.regexp_extract(c, r"<[^>]*[#/]([^#/>]+)>$", 1)
    bare = F.regexp_extract(c, r"^<([^#/>]+)>$", 1)
    return (
        F.when(c.startswith("_:"), c)
        .when(c.startswith('"'), lit)
        .when(qp != "", qp)
        .when(local != "", F.regexp_replace(local, "_", " "))
        .otherwise(bare)
    )


def parse_nt_lines(
    lines: DataFrame,
    col: str = "value",
    keep: tuple[str, ...] = (),
    unescape_unicode: bool = False,
) -> DataFrame:
    """lines(col: one NT statement per row) -> (subj, pred, obj).

    Malformed lines and dropped external-ID predicates are filtered out
    (dropBadPredicate); filters sit directly on the scan so they push
    down before any downstream join.  ``keep`` names passthrough
    columns (e.g. a stage tag) — tagging + unioning raw lines BEFORE
    one shared parse keeps the resolve_term expression tree out of
    every branch of a multi-stage import (plan-size guard, PLANS.md).
    ``unescape_unicode`` additionally decodes \\uXXXX escape
    sequences the way the reference's u8_unescape does (src/utf8.cpp,
    importN3 src/import.cpp:1824-1919) — off by default because the
    decode UDF, though gated to rows containing an escape, still adds
    a Python stage to the plan.
    """
    c = F.col(col)
    if unescape_unicode:
        lines = lines.withColumn(col, u8_unescape_col(c))
        c = F.col(col)
    parsed = lines.select(
        *[F.col(k) for k in keep],
        resolve_term(F.regexp_extract(c, NT_LINE_RE, 1)).alias("subj"),
        resolve_term(F.regexp_extract(c, NT_LINE_RE, 2)).alias("pred"),
        resolve_term(F.regexp_extract(c, NT_LINE_RE, 3)).alias("obj"),
    )
    return parsed.where(
        (F.col("subj") != "") & (F.col("pred") != "") & (F.col("obj") != "")
    ).where(~F.lower(F.col("pred")).isin(*DROP_PREDICATES))


def canonicalize_predicates(
    triples: DataFrame, mapping: dict[str, int] | None = None
) -> DataFrame:
    """Predicate canonicalization (``getRelation``/``rdfOwl``,
    src/relations.cpp:479-592): text predicate -> built-in relation id
    where known, else a stable md5-slice id — the SAME id family as the
    query/mutation path (``mutate.rel_id_col``/``rel_id_for``), so a
    predicate imported here is resolvable by name later.  (An earlier
    xxhash64 fallback assigned import-side ids no query could ever
    compute.)  ``mapping`` is accepted for API compatibility; the
    registry inside ``rel_id_col`` is authoritative."""
    from netbase_spark.operators.mutate import rel_id_col

    return triples.withColumn("rel", rel_id_col(F.col("pred")))


def u8_unescape_py(s: str) -> str:
    """Pure-Python twin of the reference's ``u8_unescape``
    (src/utf8.cpp, called from importN3 src/import.cpp:1824-1919):
    decode ``\\uXXXX`` / ``\\UXXXXXXXX`` escapes in NT literals,
    including UTF-16 surrogate PAIRS (astral chars are dumped as
    ``\\uD8xx\\uDCxx`` in N-Triples)."""
    import re

    def pair(m):
        hi, lo = int(m.group(1), 16), int(m.group(2), 16)
        return chr(0x10000 + ((hi - 0xD800) << 10) + (lo - 0xDC00))

    s = re.sub(
        r"\\u(D[89ABab][0-9a-fA-F]{2})\\u(D[C-Fc-f][0-9a-fA-F]{2})",
        pair,
        s,
    )

    def one(m):
        cp = int(m.group(1) or m.group(2), 16)
        # UNPAIRED surrogate escape (the pair pass above consumed every
        # valid pair): chr() would build a string that cannot be UTF-8/
        # Arrow-encoded, crashing the whole pandas-UDF batch — degrade
        # the one malformed row to U+FFFD instead
        return "�" if 0xD800 <= cp <= 0xDFFF else chr(cp)

    return re.sub(r"\\u([0-9a-fA-F]{4})|\\U([0-9a-fA-F]{8})", one, s)


def u8_unescape_col(c: Column) -> Column:
    """Column form of :func:`u8_unescape_py`: an Arrow-batched pandas
    UDF, gated so it only runs on rows that actually CONTAIN a ``\\u``
    escape — the overwhelmingly-common clean row stays a pure JVM
    passthrough (no Python round-trip on the hot path).

    pandas is imported HERE, not at module top: the unescape path is
    opt-in (``unescape_unicode=False`` default) and every other module
    in the package imports pandas lazily — NT parsing itself must not
    grow a hard import-time pandas dependency.  The import is published
    to module globals because ``pandas_udf`` resolves the UDF's quoted
    ``pandas.Series`` type hints against this module's globals."""
    import pandas

    globals().setdefault("pandas", pandas)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _unesc(s: "pandas.Series") -> "pandas.Series":
        return s.map(lambda v: u8_unescape_py(v) if v is not None else v)

    return F.when(
        c.contains("\\u") | c.contains("\\U"), _unesc(c)
    ).otherwise(c)
