"""``import(type, filename)`` dispatcher — format routing to the
per-source parsers.

Reference: one entry point switches on the type argument or the file
extension (csv/tsv/txt, xml, n3/nt/ttl, wordnet, wikidata, dbpedia,
yago, freebase, geodb, images, labels — src/import.cpp:2543-2621).

Spark-first: the router only picks the reader + parser; every branch
returns a DataFrame plan (nothing is materialized here).  GeoDB is the
reference's cities1000.txt special case (src/import.cpp:2330-2333): a
TSV read with include/ignore column projection, which our ``melt``
already models — the include list prunes columns BEFORE the stack so
the scan reads only what the long-form output needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# geonames cities1000.txt columns (layout per testCities,
# src/tests.cpp:1277-1280)
GEODB_COLUMNS = (
    "geonameid name asciiname alternatenames latitude longitude "
    "featureclass featurecode countrycode cc2 admin1code admin2code "
    "admin3code admin4code population elevation gtopo30 timezone "
    "modificationdate"
).split()
# importGeoDB's include list (src/import.cpp:2330-2333); subject from
# asciiname (nameRowNr=2)
GEODB_INCLUDE = ("latitude", "longitude", "population", "elevation",
                 "countrycode")


def geodb_melt(df: DataFrame) -> DataFrame:
    """The importGeoDB projection+melt over an already-read cities
    table with the ``GEODB_COLUMNS`` layout (asciiname subjects,
    include-list cells)."""
    from pyspark.sql import functions as F

    from netbase_spark.sources.tabular import melt

    value_cols = [c for c in GEODB_COLUMNS if c != "asciiname"]
    return melt(
        df, F.col("asciiname"), value_cols, included=list(GEODB_INCLUDE)
    )


def import_geodb(spark: SparkSession, path: str) -> DataFrame:
    """``importGeoDB`` (src/import.cpp:2330-2333): geonames TSV with the
    include-list projection, melted to (subj, pred, obj[, obj_num])."""
    return geodb_melt(spark.read.csv(path, sep="\t").toDF(*GEODB_COLUMNS))


def import_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    **kw,
) -> DataFrame:
    """Route ``path`` to its parser by explicit ``fmt`` or extension
    (the reference's type switch, src/import.cpp:2543-2621).  Extra
    kwargs flow to the parser (e.g. ``synset_map=`` for yago,
    ``name_fields=`` for xml)."""
    ext = (fmt or path.rsplit(".", 1)[-1]).lower()
    if ext in ("n3", "nt", "ttl"):
        from netbase_spark.sources.n3 import parse_nt_lines

        return parse_nt_lines(spark.read.text(path), **kw)
    if ext in ("yago",):
        from netbase_spark.sources.yago import parse_yago_lines

        return parse_yago_lines(spark.read.text(path), **kw)
    if ext in ("xml",):
        from netbase_spark.sources.xml import parse_xml_docs

        return parse_xml_docs(
            spark.read.text(path, wholetext=True)
            .withColumnRenamed("value", "xml"),
            **kw,
        )
    if ext in ("csv", "tsv", "txt"):
        from pyspark.sql import functions as F

        from netbase_spark.sources.tabular import melt

        sep = "\t" if ext in ("tsv", "txt") else ","
        df = spark.read.csv(path, sep=sep, header=True)
        key = kw.pop("key_col", df.columns[0])
        value_cols = kw.pop("value_cols", [c for c in df.columns if c != key])
        return melt(df, F.col(key), value_cols, **kw)
    if ext in ("geodb",):
        return import_geodb(spark, path)
    if ext in ("parquet",):
        return spark.read.parquet(path)
    raise ValueError(f"no importer for format {ext!r} ({path})")
