"""Multimodal span handling: media columns as opaque binary/ref columns
with typed metadata, decode/feature-extract as Arrow-batched UDFs.

The reference stores image triples keyed by md5 commons URLs
(``formatImage``, src/netbase.cpp:2455-2467; src/import.cpp:148-282) —
media is metadata + a content reference, never inline decoding.  We keep
that model: ``media_ref`` strings (and optionally ``binary`` payload
columns) flow through the pipeline untouched; decode happens in
``mapInPandas`` at the edge.

The actual byte decoding (image/audio/video libs) is NOT available in
this container — ``decode_media_batch`` is the real Spark plumbing
(schema, batching, partition behavior) around a decode core that is
either the real library (guarded import) or a clearly-marked
deterministic fake derived from md5(media_ref), so tests and oracles
are stable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("content_fp", T.StringType()),
    ]
)


def _decode_core(kind: str, ref: str, payload: bytes | None):
    """Decode one media item -> (width, height, duration_ms, fp).

    Real decoding requires PIL/ffmpeg (absent here); the deterministic
    fake derives metadata from md5(ref) so the Spark plumbing is fully
    testable and oracle-checkable.  Swap this core for the real decoder
    on a cluster with the libs installed.
    """
    try:  # pragma: no cover - libs absent in this sandbox
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real decode path not wired in sandbox")
    except ImportError:
        pass
    import hashlib

    h = hashlib.md5((ref or "").encode()).hexdigest()
    width = int(h[:4], 16) % 4096 if kind == "image" else None
    height = int(h[4:8], 16) % 4096 if kind == "image" else None
    duration = int(h[8:12], 16) % 600000 if kind in ("audio", "video") else None
    return width, height, duration, h


def media_spans(docs: DataFrame) -> DataFrame:
    """Flatten non-text spans: (doc_id, span_idx, kind, media_ref).
    JVM-side explode; media rows are typically a small fraction, and the
    filter prunes before the UDF stage."""
    return (
        docs.select("doc_id", F.posexplode("spans").alias("span_idx", "s"))
        .where(F.col("s.kind") != "text")
        .select(
            "doc_id",
            "span_idx",
            F.col("s.kind").alias("kind"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def decode_media(media: DataFrame) -> DataFrame:
    """media(doc_id, kind, media_ref) -> typed metadata features.
    Arrow-batched mapInPandas — one python worker round-trip per batch,
    never per row."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _decode_core(k, r, None)
                for k, r in zip(pdf["kind"], pdf["media_ref"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(str),
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "width": pd.Series([r[0] for r in rows], dtype="Int32"),
                    "height": pd.Series([r[1] for r in rows], dtype="Int32"),
                    "duration_ms": pd.Series([r[2] for r in rows], dtype="Int32"),
                    "content_fp": [r[3] for r in rows],
                }
            )

    return media.select(
        F.col("doc_id").cast("string").alias("doc_id"), "kind", "media_ref"
    ).mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)
