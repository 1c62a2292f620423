"""Canonical Spark schemas for the engine's tables (SURVEY.md §7.0).

The reference stores two fixed-width record types (Node 40 B, Statement
26 B — src/netbase.hpp:106-199, 603-604) in shared memory; our
equivalents are columnar DataFrames.  Node ids are dense longs; string
keys (``subj``/``obj``/entity ``key``) are used at the P/R comparison
boundary, long ids internally.
"""

from __future__ import annotations

from pyspark.sql import types as T

# input_hint shape: interleaved text + media documents
SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)

# gazetteer rows (FIXTURES.md §2, importWikiLabels shape src/import.cpp:1313)
LABELS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("label_type", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

# alias (gazetteer) table — the Ahash analog (src/netbase.hpp:145-150)
ALIASES_SCHEMA = T.StructType(
    [
        T.StructField("name_norm", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("source", T.StringType()),
        T.StructField("prior", T.LongType()),
    ]
)

# string-keyed triples at the comparison boundary (FIXTURES.md §7)
TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("rel", T.IntegerType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("rule", T.StringType()),
        T.StructField("doc_id", T.StringType()),
    ]
)

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("alias_key", T.StringType(), False),
        T.StructField("start_word", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
    ]
)
