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
