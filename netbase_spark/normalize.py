"""Name normalization shared by the engine, the oracle, and the alias table.

The reference compares names case-, underscore- and dash-insensitively:
``eq(..., ignoreCase, ignoreUnderscore)`` via ``equalsFuzzy``/``normChar``
(src/util.cpp:311-337) and hashes them the same way (``wordhash``,
src/util.cpp:632-648, "a_b-c==AbC").  We normalize to a canonical
readable key instead of a hash: lowercase, ``_``/``-`` -> space,
collapse whitespace, strip quotes/space (getAbstract trims quotes,
src/netbase.cpp:1447-1455).

Both a plain-Python function (used by the oracle and inside pandas UDFs)
and a Column-expression builder (used in JVM-side plans) are provided —
they MUST stay equivalent; tests/test_normalize.py checks that.
"""

from __future__ import annotations

import re

_WS = re.compile(r"[\s_\-]+")
_QUOTES = re.compile(r'^["\'\s]+|["\'\s]+$')


def norm_name(s: str | None) -> str | None:
    """lowercase; _/-/whitespace runs -> single space; trim quotes/space."""
    if s is None:
        return None
    s = _QUOTES.sub("", s)
    s = _WS.sub(" ", s).strip()
    return s.lower()


# generateSEOUrl's transliteration table (src/util.cpp:986-1003): the
# active (non-commented) replacements only — umlauts, eszett, é.
# Lowercasing happens first, so the uppercase rows collapse into these.
_SEO_XLAT = (("ä", "ae"), ("ü", "ue"), ("ö", "oe"), ("ß", "ss"), ("é", "e"))


def seo_slug(s: str | None) -> str | None:
    """SEO slug alias (generateSEOUrl, src/netbase.cpp:2555-2593,
    src/util.cpp:986-1040): normalized name, German umlauts/ß/é
    transliterated, spaces -> '-', remaining non-alnum dropped."""
    n = norm_name(s)
    if n is None:
        return None
    for frm, to in _SEO_XLAT:
        n = n.replace(frm, to)
    n = re.sub(r"[^a-z0-9 ]+", "", n)
    n = re.sub(r" +", "-", n.strip())
    return n or None


def de_camel(s: str | None) -> str | None:
    """CamelCase -> spaced words (deCamel, src/import.cpp:422-438)."""
    if s is None:
        return None
    return re.sub(r"(?<=[a-z0-9])(?=[A-Z])", " ", s)


_NUM_TOKEN = re.compile(r"^[+-]?\d+")


def is_number_token(s: str) -> bool:
    """atoi(start) truthiness used by findEntites' "no numbers hack"
    (src/query.cpp:2026): leading integer != 0 rejects the span."""
    m = _NUM_TOKEN.match(s.strip())
    return bool(m) and int(m.group(0)) != 0


# --- Column-expression versions (JVM-side, codegen'd) ----------------------

def norm_name_col(col):
    """Column equivalent of :func:`norm_name`.  The (?U) flag makes
    Java's \\s match Unicode whitespace like Python's does — without it
    a non-breaking space (U+00A0, common in scraped/Wiki labels) passes
    through the JVM alias build but is collapsed by the Python scan,
    so the broadcast lookup silently misses."""
    from pyspark.sql import functions as F

    c = F.regexp_replace(col, r'(?U)^["\'\s]+|["\'\s]+$', "")
    c = F.regexp_replace(c, r"(?U)[\s_\-]+", " ")
    return F.lower(F.trim(c))


def seo_slug_col(col):
    """Column equivalent of :func:`seo_slug` (returns '' for empty)."""
    from pyspark.sql import functions as F

    c = norm_name_col(col)
    for frm, to in _SEO_XLAT:
        c = F.regexp_replace(c, frm, to)
    c = F.regexp_replace(c, r"[^a-z0-9 ]+", "")
    c = F.regexp_replace(F.trim(c), r" +", "-")
    return c


def clamp_label_col(col, limit: int = 50, hard: int = 100):
    """``importLabels`` length clamp (src/import.cpp:1516-1528): labels
    longer than ``limit`` chars are cut at the 6th space / first '(' /
    first ':' — whichever the left-to-right scan hits first — with
    '...' appended; if no cut point exists, hard-cut at ``hard`` chars
    (the reference's ``label[100]=0``, no ellipsis)."""
    from pyspark.sql import functions as F

    toks = F.split(col, " ")
    p6 = F.when(
        F.size(toks) > 6,
        F.length(F.array_join(F.slice(toks, 1, 6), " ")) + 1,
    )
    pp = F.when(F.locate("(", col) > 0, F.locate("(", col))
    pc = F.when(F.locate(":", col) > 0, F.locate(":", col))
    cut = F.least(p6, pp, pc)
    clamped = F.when(
        cut.isNotNull(),
        F.concat(F.substring(col, F.lit(1), cut - 1), F.lit("...")),
    ).otherwise(F.substring(col, 1, hard))
    return F.when(F.length(col) > limit, clamped).otherwise(col)
