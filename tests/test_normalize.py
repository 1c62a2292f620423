"""The plain-Python normalizers and their Column-expression twins MUST
agree byte-for-byte — the oracle (Python) and the engine (JVM) both key
on these forms, and P/R parity dies silently if they drift."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from netbase_spark.normalize import norm_name, norm_name_col, seo_slug, seo_slug_col

# printable-ish text incl. the characters the normalizers care about
TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019 _-\t\"'äöüéλ.,:/()") + ["\n"]
    ),
    max_size=24,
)


@settings(max_examples=40, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=30, unique=True))
def test_norm_name_python_equals_column(spark, samples):
    df = spark.createDataFrame([(s,) for s in samples], "raw string")
    got = {
        r["raw"]: r["n"]
        for r in df.select("raw", norm_name_col("raw").alias("n")).collect()
    }
    for s in samples:
        expect = norm_name(s)
        # Column version returns '' where Python returns '' (no None for
        # non-null input); normalize for comparison
        assert (got[s] or "") == (expect or ""), repr(s)


@settings(max_examples=25, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=30, unique=True))
def test_seo_slug_python_equals_column(spark, samples):
    df = spark.createDataFrame([(s,) for s in samples], "raw string")
    got = {
        r["raw"]: r["n"]
        for r in df.select("raw", seo_slug_col("raw").alias("n")).collect()
    }
    for s in samples:
        assert (got[s] or "") == (seo_slug(s) or ""), repr(s)


def test_clamp_label_col(spark):
    """importLabels clamp (src/import.cpp:1516-1528): >50 chars cut at
    6th space / first '(' / ':' with '...', else hard cut at 100."""
    from pyspark.sql import functions as F

    from netbase_spark.normalize import clamp_label_col

    long_spaces = "one two three four five six seven eight nine ten eleven"
    long_paren = "x" * 30 + "(rest of this very long parenthetical here)"
    long_colon = "prefixprefixprefixprefix: the rest goes on and onnnnn"
    no_cut = "a" * 120
    short = "short label (with paren)"
    cases = [long_spaces, long_paren, long_colon, no_cut, short]
    df = spark.createDataFrame([(c,) for c in cases], "label string")
    got = {
        r["label"]: r["out"]
        for r in df.select(
            "label", clamp_label_col(F.col("label")).alias("out")
        ).collect()
    }
    assert got[long_spaces] == "one two three four five six..."
    assert got[long_paren] == "x" * 30 + "..."
    assert got[long_colon] == "prefixprefixprefixprefix..."
    assert got[no_cut] == "a" * 100
    assert got[short] == short  # <= 50 chars untouched


def test_norm_name_unicode_whitespace_parity(spark):
    """Java \\s is ASCII-only by default; the (?U) flag keeps the JVM
    twin equal to Python on non-breaking spaces and other Unicode
    whitespace common in scraped/Wiki labels."""
    from pyspark.sql import functions as F

    from netbase_spark.normalize import norm_name, norm_name_col

    samples = ["New York", " edge ", "a b", "tab\tsep", "plain name"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["n"]
        for r in df.select("s", norm_name_col(F.col("s")).alias("n")).collect()
    }
    for s in samples:
        assert got[s] == norm_name(s), repr(s)
    assert norm_name("New York") == "new york"
