"""XML document ingestion — the ``importXml`` analog.

Reference: ``importXml`` is a streaming tag scanner: nested elements
emit ``Member`` edges parent -> child, leaf ``<k>v</k>`` elements emit
``(subject, k, v)`` triples, and designated name fields rename the
enclosing element's subject (``namify``, src/import.cpp:578-587,
608-729).

Spark-first: there is no spark-xml package in this environment, so the
parse is Arrow-batched ``mapInPandas`` over per-row XML documents using
the stdlib parser — one Python crossing per batch (the sanctioned
vectorized path; all downstream processing is DataFrame ops).  At 100TB
the XML corpus partitions like any document table; the parse is
embarrassingly parallel with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

XML_TRIPLES_SCHEMA = "subj string, pred string, obj string"


def _subject_for(elem, path: str, name_fields: tuple[str, ...]) -> str:
    """Element subject: the value of the first name field child if
    present (namify, src/import.cpp:578-587), else the tag path."""
    for child in elem:
        if child.tag in name_fields and (child.text or "").strip():
            return child.text.strip()
    return path


def _walk(elem, path: str, name_fields, out: list) -> str:
    subject = _subject_for(elem, path, name_fields)
    counters: dict[str, int] = {}
    for child in elem:
        nchildren = len(child)
        if nchildren == 0:
            # leaf <k>v</k> -> (subject, k, v); name fields name the
            # subject, they are not re-emitted as triples
            if child.tag not in name_fields and (child.text or "").strip():
                out.append((subject, child.tag, child.text.strip()))
        else:
            counters[child.tag] = counters.get(child.tag, 0) + 1
            child_path = f"{path}/{child.tag}{counters[child.tag]}"
            child_subject = _walk(child, child_path, name_fields, out)
            # nested element -> Member edge (src/import.cpp:655-668)
            out.append((subject, "member", child_subject))
    return subject


def parse_xml_docs(
    docs: DataFrame,
    xml_col: str = "xml",
    name_fields: tuple[str, ...] = ("name",),
) -> DataFrame:
    """docs(.., xml_col) -> (subj, pred, obj) string triples.

    Predicates stay textual (leaf tag names + 'member'); feed through
    :func:`netbase_spark.sources.n3.canonicalize_predicates` to resolve
    relation ids where a canonical mapping exists.
    """
    import pandas as pd

    nf = tuple(name_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            subjs, preds, objs = [], [], []
            for i, xml_text in enumerate(pdf[xml_col]):
                if not xml_text:
                    continue
                try:
                    root = ET.fromstring(xml_text)
                except ET.ParseError:
                    continue  # malformed docs dropped, like importN3 lines
                out: list[tuple[str, str, str]] = []
                _walk(root, root.tag, nf, out)
                for s, p, o in out:
                    subjs.append(s)
                    preds.append(p)
                    objs.append(o)
            yield pd.DataFrame({"subj": subjs, "pred": preds, "obj": objs})

    return (
        docs.select(F.col(xml_col).cast("string").alias(xml_col))
        .mapInPandas(run, schema=XML_TRIPLES_SCHEMA)
        .dropDuplicates(["subj", "pred", "obj"])
    )
