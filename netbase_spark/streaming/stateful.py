"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming engine; its incremental surfaces are the
append-only replay log (src/netbase.cpp:2521-2533) and the
duplicate-statement check at insert (src/netbase.cpp:760-767) — every
re-applied command is deduplicated against the already-built graph.
The Spark-native analog of "insert if not already present, forever" is
a STATEFUL streaming operator: state = what we've already admitted,
keyed by fingerprint, held by the state store across micro-batches and
restarts (checkpointed).

Two operators:

- ``dedup_stream``: first-seen-wins exact dedup over a fingerprint
  column.  Emits each fingerprint's first row only, across ALL
  micro-batches.  This is the streaming form of the training-data
  exact-dedup op (batch form: groupBy(fingerprint).min).
- ``running_counts_stream``: per-key running totals (the
  ``statementCount`` degree accumulator, src/netbase.hpp:116, kept
  incrementally instead of recomputed).

Both use Arrow-batched pandas state functions — no per-row Python.

Scale notes: state is partitioned by the grouping key across executors
(HDFSBackedStateStore / RocksDB in production), so state size per
executor = total fingerprints / shuffle partitions.  The fingerprint
group key is md5 — uniformly distributed, no skew.  At 10^12 docs use
RocksDB state store + event-time TTL (``GroupStateTimeout.EventTimeTimeout``)
to bound state; here NoTimeout keeps tests deterministic.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("fp", StringType(), False),
        StructField("doc_id", StringType(), True),
        StructField("text", StringType(), True),
    ]
)
_DEDUP_STATE_SCHEMA = StructType([StructField("seen", IntegerType(), False)])

COUNT_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("total", LongType(), False),
    ]
)
_COUNT_STATE_SCHEMA = StructType([StructField("total", LongType(), False)])


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # fingerprint admitted in an earlier micro-batch: drop everything
        for _ in pdfs:
            pass
        return
    first = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # deterministic pick within the batch: min doc_id
        cand = pdf.loc[pdf["doc_id"].idxmin()]
        if first is None or cand["doc_id"] < first["doc_id"]:
            first = cand
    if first is None:
        return
    state.update((1,))
    yield pd.DataFrame(
        {"fp": [key[0]], "doc_id": [first["doc_id"]], "text": [first["text"]]}
    )


def dedup_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact dedup, first-seen wins.  Input: streaming DF with
    (doc_id, <text_col>).  Output: one row per distinct normalized-text
    fingerprint, emitted in the micro-batch where it first appears."""
    fp = F.md5(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    keyed = docs.select("doc_id", F.col(text_col).alias("text"), fp.alias("fp"))
    return keyed.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _count_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total = state.get[0] if state.exists else 0
    batch = 0
    for pdf in pdfs:
        batch += len(pdf)
    total += batch
    state.update((total,))
    yield pd.DataFrame({"key": [key[0]], "total": [total]})


def running_counts_stream(rows: DataFrame, key_col: str) -> DataFrame:
    """Per-key running row counts across micro-batches (incremental
    degree/statementCount).  Emits the updated total for every key seen
    in the batch."""
    keyed = rows.select(F.col(key_col).cast("string").alias("key"))
    return keyed.groupBy("key").applyInPandasWithState(
        _count_fn,
        outputStructType=COUNT_OUT_SCHEMA,
        stateStructType=_COUNT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
